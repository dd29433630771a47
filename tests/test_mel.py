"""Parity tests for STFT / ISTFT / log-mel against torch oracles.

torchaudio isn't available in this image, so the oracle reconstructs the exact
torchaudio semantics from core torch ops: MelSpectrogram(power=1, center=True,
norm=None, mel_scale="htk") == torch.stft magnitude @ htk filterbank
(reference consumes it in src/f5_tts/model/modules.py:80-109).
"""

import numpy as np
import pytest
import torch

from f5_tts_tpu.ops.mel import MelConfig, log_mel_spectrogram, mel_filterbank, num_frames
from f5_tts_tpu.ops.stft import STFTConfig, istft, stft_magnitude


def torch_stft_mag(wav: np.ndarray, n_fft=1024, hop=256, win=1024, center=True, eps=0.0):
    t = torch.from_numpy(wav).double()
    if not center:
        pad = (n_fft - hop) // 2
        t = torch.nn.functional.pad(t.unsqueeze(1), (pad, pad), mode="reflect").squeeze(1)
    spec = torch.stft(
        t,
        n_fft,
        hop_length=hop,
        win_length=win,
        window=torch.hann_window(win).double(),
        center=center,
        pad_mode="reflect",
        normalized=False,
        onesided=True,
        return_complex=True,
    )
    mag = torch.sqrt(torch.view_as_real(spec).pow(2).sum(-1) + eps)
    return mag.transpose(1, 2).numpy()  # [b, t, f]


@pytest.mark.parametrize("center", [True, False])
def test_stft_magnitude_matches_torch(center):
    rng = np.random.default_rng(0)
    wav = rng.standard_normal((2, 24000)).astype(np.float32)
    cfg = STFTConfig(center=center)
    got = np.asarray(stft_magnitude(wav, cfg))
    want = torch_stft_mag(wav, center=center)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-4)


def test_istft_roundtrip_matches_torch():
    rng = np.random.default_rng(1)
    wav = rng.standard_normal((1, 8192)).astype(np.float32)
    t = torch.from_numpy(wav).double()
    window = torch.hann_window(1024).double()
    spec = torch.stft(t, 1024, hop_length=256, window=window, center=True, return_complex=True)
    want = torch.istft(spec, 1024, hop_length=256, window=window, center=True, length=8192).numpy()
    re = spec.real.transpose(1, 2).numpy().astype(np.float32)
    im = spec.imag.transpose(1, 2).numpy().astype(np.float32)
    got = np.asarray(istft(re, im, STFTConfig(), length=8192))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(got, wav, atol=2e-4, rtol=1e-4)


def torchaudio_htk_fbank(n_freqs=513, f_min=0.0, f_max=12000.0, n_mels=100, sr=24000):
    """torchaudio.functional.melscale_fbanks(norm=None, mel_scale='htk'),
    re-derived from its documented algorithm using torch ops."""
    all_freqs = torch.linspace(0, sr // 2, n_freqs).double()
    m_min = 2595.0 * np.log10(1.0 + f_min / 700.0)
    m_max = 2595.0 * np.log10(1.0 + f_max / 700.0)
    m_pts = torch.linspace(m_min, m_max, n_mels + 2).double()
    f_pts = 700.0 * (10.0 ** (m_pts / 2595.0) - 1.0)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts.unsqueeze(0) - all_freqs.unsqueeze(1)
    down_slopes = (-1.0 * slopes[:, :-2]) / f_diff[:-1]
    up_slopes = slopes[:, 2:] / f_diff[1:]
    return torch.clamp(torch.min(down_slopes, up_slopes), min=0.0).numpy()


def test_htk_filterbank_matches_torchaudio_algorithm():
    got = mel_filterbank(24000, 1024, 100, f_max=12000.0, mel_scale="htk", norm=None)
    want = torchaudio_htk_fbank()
    np.testing.assert_allclose(got, want, atol=2e-5)
    # sanity: each filter is a unit-height triangle except possibly edge bins
    assert got.shape == (513, 100)
    assert got.max() <= 1.0 + 1e-6
    assert (got.sum(axis=0) > 0).all()


def test_log_mel_vocos_matches_torch_pipeline():
    rng = np.random.default_rng(2)
    wav = (0.5 * rng.standard_normal((2, 48000))).astype(np.float32)
    cfg = MelConfig()
    got = np.asarray(log_mel_spectrogram(wav, cfg))
    mag = torch_stft_mag(wav)  # [b, t, f]
    fb = torchaudio_htk_fbank()
    mel = mag @ fb
    want = np.log(np.clip(mel, 1e-5, None))
    assert got.shape == (2, num_frames(48000, cfg), 100)
    assert np.abs(got - want).mean() < 1e-4
    np.testing.assert_allclose(got, want, atol=5e-3)


def librosa_slaney_fbank(n_freqs=513, n_mels=100, sr=24000):
    """librosa.filters.mel defaults (slaney scale + slaney norm), re-derived."""
    fftfreqs = np.linspace(0, sr / 2.0, n_freqs)

    def hz_to_mel(f):
        f = np.asarray(f, dtype=np.float64)
        f_sp = 200.0 / 3
        mels = f / f_sp
        min_log_hz = 1000.0
        logstep = np.log(6.4) / 27.0
        return np.where(f >= min_log_hz, min_log_hz / f_sp + np.log(np.maximum(f, 1e-12) / min_log_hz) / logstep, mels)

    def mel_to_hz(m):
        m = np.asarray(m, dtype=np.float64)
        f_sp = 200.0 / 3
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / f_sp
        logstep = np.log(6.4) / 27.0
        return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), f_sp * m)

    mel_f = mel_to_hz(np.linspace(hz_to_mel(0.0), hz_to_mel(sr / 2.0), n_mels + 2))
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    weights = np.maximum(0, np.minimum(-ramps[:-2] / fdiff[:-1, None], ramps[2:] / fdiff[1:, None]))
    enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
    return (weights * enorm[:, None]).T  # [n_freqs, n_mels]


def test_log_mel_bigvgan_matches_torch_pipeline():
    rng = np.random.default_rng(6)
    wav = (0.4 * rng.standard_normal((1, 25600))).astype(np.float32)
    cfg = MelConfig(mel_spec_type="bigvgan")
    got = np.asarray(log_mel_spectrogram(wav, cfg))
    mag = torch_stft_mag(wav, center=False, eps=1e-9)
    mel = mag @ librosa_slaney_fbank()
    want = np.log(np.clip(mel, 1e-5, None))
    assert got.shape == want.shape
    assert np.abs(got - want).mean() < 1e-4
    np.testing.assert_allclose(got, want, atol=5e-3)


def test_log_mel_bigvgan_shape():
    cfg = MelConfig(mel_spec_type="bigvgan")
    wav = np.zeros((1, 25600), dtype=np.float32)
    out = np.asarray(log_mel_spectrogram(wav, cfg))
    assert out.shape == (1, num_frames(25600, cfg), 100)
    # silence -> log(clamp) floor
    np.testing.assert_allclose(out, np.log(1e-5), atol=1e-6)


def test_overlap_add_general_fallback_matches_fast_path():
    """overlap_add has a reshape fast path (n_fft % hop == 0) and a
    conv_transpose fallback; cross-check them on a divisible case and verify
    the fallback alone on a non-divisible hop."""
    from f5_tts_tpu.ops.stft import overlap_add

    rng = np.random.default_rng(0)
    frames = rng.standard_normal((2, 9, 64)).astype(np.float32)

    fast = np.asarray(overlap_add(frames, 16))  # 64 % 16 == 0 -> fast path
    # manual reference
    out_len = 8 * 16 + 64
    want = np.zeros((2, out_len), np.float32)
    for t in range(9):
        want[:, t * 16 : t * 16 + 64] += frames[:, t]
    np.testing.assert_allclose(fast, want, atol=1e-5)

    # non-divisible hop -> conv_transpose fallback
    slow = np.asarray(overlap_add(frames, 24))
    out_len = 8 * 24 + 64
    want = np.zeros((2, out_len), np.float32)
    for t in range(9):
        want[:, t * 24 : t * 24 + 64] += frames[:, t]
    np.testing.assert_allclose(slow, want, atol=1e-4)


def test_istft_frame_lens_matches_exact_length():
    """frame_lens-masked istft == istft on the exact-length spectrogram."""
    rng = np.random.default_rng(9)
    n_real, n_pad = 12, 20
    re = rng.standard_normal((1, n_pad, 513)).astype(np.float32)
    im = rng.standard_normal((1, n_pad, 513)).astype(np.float32)
    cfg = STFTConfig()
    import jax.numpy as jnp

    exact = np.asarray(istft(re[:, :n_real], im[:, :n_real], cfg))
    masked = np.asarray(istft(re, im, cfg, frame_lens=jnp.asarray(np.array([n_real]))))
    np.testing.assert_allclose(masked[:, : exact.shape[1]], exact, atol=1e-4)
