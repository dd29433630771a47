"""Log-mel spectrogram extraction — parity-critical front end.

Two backends, matching the reference exactly (src/f5_tts/model/modules.py:35-151):

- ``vocos``: torchaudio.transforms.MelSpectrogram(power=1, center=True,
  norm=None, mel_scale="htk") followed by clamp(1e-5).log().
- ``bigvgan``: librosa slaney-scale/slaney-norm filterbank, center=False with
  manual (n_fft-hop)//2 reflect padding, sqrt(re^2+im^2+1e-9), clamp(1e-5).log().

The STFT is the matmul formulation from ops/stft.py, so mel extraction is two
matmuls + elementwise — a single fused XLA region on TPU.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from f5_tts_tpu.ops.stft import STFTConfig, stft_magnitude


def _hz_to_mel_htk(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def _mel_to_hz_htk(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


def _hz_to_mel_slaney(f):
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3.0
    mel = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mel)


def _mel_to_hz_slaney(m):
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3.0
    freqs = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


def mel_filterbank(
    sample_rate: int,
    n_fft: int,
    n_mels: int,
    f_min: float = 0.0,
    f_max: float | None = None,
    mel_scale: str = "htk",
    norm: str | None = None,
    dtype=np.float32,
) -> np.ndarray:
    """Triangular mel filterbank, [n_freqs, n_mels].

    mel_scale="htk", norm=None     -> torchaudio.functional.melscale_fbanks defaults
                                      used by the vocos path.
    mel_scale="slaney", norm="slaney" -> librosa.filters.mel defaults used by the
                                      bigvgan path.
    """
    if f_max is None:
        f_max = sample_rate / 2.0
    n_freqs = n_fft // 2 + 1
    all_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    hz2mel = _hz_to_mel_htk if mel_scale == "htk" else _hz_to_mel_slaney
    mel2hz = _mel_to_hz_htk if mel_scale == "htk" else _mel_to_hz_slaney
    m_pts = np.linspace(hz2mel(f_min), hz2mel(f_max), n_mels + 2)
    f_pts = mel2hz(m_pts)  # [n_mels + 2]
    f_diff = np.diff(f_pts)  # [n_mels + 1]
    slopes = f_pts[None, :] - all_freqs[:, None]  # [n_freqs, n_mels + 2]
    down = -slopes[:, :-2] / f_diff[None, :-1]
    up = slopes[:, 2:] / f_diff[None, 1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    if norm == "slaney":
        enorm = 2.0 / (f_pts[2:] - f_pts[:-2])
        fb = fb * enorm[None, :]
    return fb.astype(dtype)


@dataclass(frozen=True)
class MelConfig:
    """Defaults = reference MelSpec defaults (modules.py:112-151, configs/*.yaml)."""

    n_fft: int = 1024
    hop_length: int = 256
    win_length: int = 1024
    n_mel_channels: int = 100
    target_sample_rate: int = 24_000
    mel_spec_type: str = "vocos"  # "vocos" | "bigvgan"

    @property
    def stft(self) -> STFTConfig:
        return STFTConfig(
            n_fft=self.n_fft,
            hop_length=self.hop_length,
            win_length=self.win_length,
            center=self.mel_spec_type == "vocos",
        )


@functools.lru_cache(maxsize=8)
def _fbank_for(cfg: MelConfig) -> np.ndarray:
    if cfg.mel_spec_type == "vocos":
        return mel_filterbank(
            cfg.target_sample_rate, cfg.n_fft, cfg.n_mel_channels, mel_scale="htk", norm=None
        )
    return mel_filterbank(
        cfg.target_sample_rate, cfg.n_fft, cfg.n_mel_channels, mel_scale="slaney", norm="slaney"
    )


def log_mel_spectrogram(wav: jax.Array, cfg: MelConfig = MelConfig()) -> jax.Array:
    """[b, T] waveform -> [b, n_frames, n_mels] log-mel.

    Frame layout is [b, n, d] (time-major) — the layout the backbones consume;
    the reference computes [b, d, n] then permutes (cfm.py:106-108).
    """
    if wav.ndim == 1:
        wav = wav[None]
    eps = 0.0 if cfg.mel_spec_type == "vocos" else 1e-9
    mag = stft_magnitude(wav, cfg.stft, eps=eps)  # [b, t, f]
    fb = jnp.asarray(_fbank_for(cfg), dtype=wav.dtype)
    mel = jnp.einsum("btf,fm->btm", mag, fb)
    return jnp.log(jnp.clip(mel, min=1e-5))


def log_mel_prepadded(wav_padded: jax.Array, cfg: MelConfig = MelConfig()) -> jax.Array:
    """Log-mel for a waveform the HOST has already reflect-padded (center-style)
    and then zero-extended to a static bucket length.

    This keeps XLA shapes static across reference audios while matching
    ``log_mel_spectrogram`` exactly on the true-length prefix: the caller pads
    np.pad(wav, pad, mode="reflect") with pad = n_fft//2 (vocos) or
    (n_fft-hop)//2 (bigvgan), appends zeros to the bucket, and keeps only the
    first ``num_frames(true_len)`` output frames.
    """
    from f5_tts_tpu.ops.stft import _stft_basis, frame_signal

    if wav_padded.ndim == 1:
        wav_padded = wav_padded[None]
    s = cfg.stft
    cos_m, sin_m = _stft_basis(s.n_fft, s.win_length)
    cos_m = jnp.asarray(cos_m, dtype=wav_padded.dtype)
    sin_m = jnp.asarray(sin_m, dtype=wav_padded.dtype)
    frames = frame_signal(wav_padded, s.n_fft, s.hop_length)
    re = jnp.einsum("btn,nf->btf", frames, cos_m)
    im = -jnp.einsum("btn,nf->btf", frames, sin_m)
    eps = 0.0 if cfg.mel_spec_type == "vocos" else 1e-9
    mag = jnp.sqrt(re * re + im * im + eps)
    fb = jnp.asarray(_fbank_for(cfg), dtype=wav_padded.dtype)
    mel = jnp.einsum("btf,fm->btm", mag, fb)
    return jnp.log(jnp.clip(mel, min=1e-5))


def log_mel_np(wav: np.ndarray, cfg: MelConfig = MelConfig()) -> np.ndarray:
    """Pure-numpy log-mel (dataloader workers; no device round-trip).
    Same math as log_mel_spectrogram."""
    from f5_tts_tpu.ops.stft import _stft_basis

    if wav.ndim == 1:
        wav = wav[None]
    s = cfg.stft
    pad = s.n_fft // 2 if s.center else (s.n_fft - s.hop_length) // 2
    x = np.pad(wav, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (x.shape[-1] - s.n_fft) // s.hop_length
    idx = np.arange(n_frames)[:, None] * s.hop_length + np.arange(s.n_fft)[None, :]
    frames = x[:, idx]
    cos_m, sin_m = _stft_basis(s.n_fft, s.win_length)
    re = frames @ cos_m
    im = -(frames @ sin_m)
    eps = 0.0 if cfg.mel_spec_type == "vocos" else 1e-9
    mag = np.sqrt(re * re + im * im + eps)
    mel = mag @ _fbank_for(cfg)
    return np.log(np.clip(mel, 1e-5, None)).astype(np.float32)


def stft_pad_amount(cfg: MelConfig = MelConfig()) -> int:
    """Host-side reflect-pad amount matching this config's centering."""
    return cfg.n_fft // 2 if cfg.mel_spec_type == "vocos" else (cfg.n_fft - cfg.hop_length) // 2


def num_frames(num_samples: int, cfg: MelConfig = MelConfig()) -> int:
    """Frame count for a waveform of ``num_samples`` samples."""
    if cfg.mel_spec_type == "vocos":  # center=True
        return 1 + num_samples // cfg.hop_length
    pad = (cfg.n_fft - cfg.hop_length) // 2
    return 1 + (num_samples + 2 * pad - cfg.n_fft) // cfg.hop_length
