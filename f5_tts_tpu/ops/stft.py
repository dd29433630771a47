"""STFT / ISTFT as MXU-friendly matmul kernels.

TPU-first formulation: instead of an FFT primitive, framing + windowed DFT is
expressed as a single [frames, n_fft] x [n_fft, n_freq] matmul per (cos, sin)
pair (the window is folded into the DFT matrices), so the whole transform rides
the MXU and fuses into the surrounding graph.  The ISTFT head is the inverse
matmul + overlap-add; when ``n_fft`` is an integer multiple of ``hop`` the
overlap-add is a pure reshape/shift/sum (no scatter).

Semantics mirror ``torch.stft`` / ``torch.istft`` (reference uses them via
torchaudio in src/f5_tts/model/modules.py:80-109 and via the Vocos ISTFT head;
conv-STFT precedent: reference runtime/triton_trtllm/scripts/conv_stft.py).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, dtype=np.float32) -> np.ndarray:
    """Periodic Hann window, identical to ``torch.hann_window(win_length)``."""
    n = np.arange(win_length, dtype=np.float64)
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * n / win_length))
    return w.astype(dtype)


def dft_matrices(n_fft: int, window: np.ndarray | None = None, dtype=np.float32):
    """Real-FFT basis matrices with the analysis window folded in.

    Returns (cos_mat, sin_mat), each [n_fft, n_fft//2 + 1], such that for a
    frame ``f`` (length n_fft): ``re = f @ cos_mat``, ``im = -(f @ sin_mat)``
    matches ``torch.fft.rfft(f * window)``.
    """
    n_freq = n_fft // 2 + 1
    k = np.arange(n_freq, dtype=np.float64)
    n = np.arange(n_fft, dtype=np.float64)
    ang = 2.0 * np.pi * np.outer(n, k) / n_fft  # [n_fft, n_freq]
    cos_m, sin_m = np.cos(ang), np.sin(ang)
    if window is not None:
        w = window.astype(np.float64)[:, None]
        cos_m, sin_m = cos_m * w, sin_m * w
    return cos_m.astype(dtype), sin_m.astype(dtype)


def frame_signal(x: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """[b, T] -> [b, n_frames, n_fft] with n_frames = 1 + (T - n_fft)//hop."""
    n_frames = 1 + (x.shape[-1] - n_fft) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    return x[:, idx]


def stft_pad(x: jax.Array, n_fft: int, hop: int, center: bool) -> jax.Array:
    """Reflect-pad like torch.stft: n_fft//2 both sides if center, else the
    BigVGAN-style (n_fft - hop)//2 (reference modules.py:57-58)."""
    pad = n_fft // 2 if center else (n_fft - hop) // 2
    return jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")


@dataclass(frozen=True)
class STFTConfig:
    n_fft: int = 1024
    hop_length: int = 256
    win_length: int = 1024
    center: bool = True

    @property
    def n_freq(self) -> int:
        return self.n_fft // 2 + 1


@functools.lru_cache(maxsize=8)
def _stft_basis(n_fft: int, win_length: int):
    w = hann_window(win_length)
    if win_length < n_fft:  # torch pads window symmetrically to n_fft
        lp = (n_fft - win_length) // 2
        w = np.pad(w, (lp, n_fft - win_length - lp))
    return dft_matrices(n_fft, w)


def stft_magnitude(x: jax.Array, cfg: STFTConfig, eps: float = 0.0) -> jax.Array:
    """[b, T] -> magnitude spectrogram [b, n_frames, n_freq] (power=1).

    ``eps`` is added under the sqrt (reference BigVGAN path uses 1e-9,
    modules.py:72; the Vocos/torchaudio path uses 0).
    """
    cos_m, sin_m = _stft_basis(cfg.n_fft, cfg.win_length)
    cos_m = jnp.asarray(cos_m, dtype=x.dtype)
    sin_m = jnp.asarray(sin_m, dtype=x.dtype)
    x = stft_pad(x, cfg.n_fft, cfg.hop_length, cfg.center)
    frames = frame_signal(x, cfg.n_fft, cfg.hop_length)
    re = jnp.einsum("btn,nf->btf", frames, cos_m)
    im = -jnp.einsum("btn,nf->btf", frames, sin_m)
    return jnp.sqrt(re * re + im * im + eps)


def overlap_add(frames: jax.Array, hop: int) -> jax.Array:
    """[b, n_frames, n_fft] -> [b, (n_frames-1)*hop + n_fft] overlap-add.

    Fast path when n_fft % hop == 0: split each frame into n_fft//hop hop-sized
    chunks; chunk j of frame t lands at output block (t + j) — a pad/shift/sum
    with no scatter, which XLA fuses cleanly.
    """
    b, n_frames, n_fft = frames.shape
    out_len = (n_frames - 1) * hop + n_fft
    if n_fft % hop != 0:
        # general case: zero-pad each frame to the next hop multiple — the
        # appended zeros contribute nothing to the sum
        pad = hop - n_fft % hop
        frames = jnp.pad(frames, ((0, 0), (0, 0), (0, pad)))
        n_fft = n_fft + pad
    r = n_fft // hop
    # [b, n_frames, r, hop]: chunk j of frame t lands at output block (t + j)
    chunks = frames.reshape(b, n_frames, r, hop)
    out = jnp.zeros((b, n_frames + r - 1, hop), dtype=frames.dtype)
    for j in range(r):
        out = out.at[:, j : j + n_frames].add(chunks[:, :, j])
    return out.reshape(b, -1)[:, :out_len]


@functools.lru_cache(maxsize=8)
def _istft_basis(n_fft: int, win_length: int):
    """Inverse rFFT basis [n_freq(re)+n_freq(im), n_fft] with synthesis window
    folded in, matching torch.istft's irfft + window multiply."""
    n_freq = n_fft // 2 + 1
    k = np.arange(n_freq, dtype=np.float64)
    n = np.arange(n_fft, dtype=np.float64)
    ang = 2.0 * np.pi * np.outer(k, n) / n_fft  # [n_freq, n_fft]
    # irfft(X)[n] = (1/N) * sum_k w_k * (re_k cos - im_k sin), w_k = 2 except DC/Nyq
    scale = np.full((n_freq, 1), 2.0 / n_fft)
    scale[0] = 1.0 / n_fft
    if n_fft % 2 == 0:
        scale[-1] = 1.0 / n_fft
    cos_b = np.cos(ang) * scale
    sin_b = -np.sin(ang) * scale
    w = hann_window(win_length).astype(np.float64)
    if win_length < n_fft:
        lp = (n_fft - win_length) // 2
        w = np.pad(w, (lp, n_fft - win_length - lp))
    return (cos_b * w).astype(np.float32), (sin_b * w).astype(np.float32), (w * w).astype(np.float32)


def istft(
    re: jax.Array,
    im: jax.Array,
    cfg: STFTConfig,
    length: int | None = None,
    frame_lens: jax.Array | None = None,
) -> jax.Array:
    """Inverse STFT matching ``torch.istft(center=True)``.

    re/im: [b, n_frames, n_freq] -> waveform [b, length].

    ``frame_lens`` ([b] int) restricts synthesis to the first N frames per
    sample: trailing frames are zeroed AND excluded from the window-envelope
    normalization, so the result is bit-identical to running istft on an
    exact-length [b, N, f] input (static-shape bucketing without boundary
    artifacts).
    """
    cos_b, sin_b, wsq = _istft_basis(cfg.n_fft, cfg.win_length)
    cos_b = jnp.asarray(cos_b, dtype=re.dtype)
    sin_b = jnp.asarray(sin_b, dtype=re.dtype)
    frames = jnp.einsum("btf,fn->btn", re, cos_b) + jnp.einsum("btf,fn->btn", im, sin_b)
    n_frames = re.shape[1]
    wsq_j = jnp.asarray(wsq, dtype=re.dtype)
    if frame_lens is not None:
        valid = (jnp.arange(n_frames)[None, :] < frame_lens[:, None]).astype(re.dtype)
        frames = frames * valid[..., None]
        env = overlap_add(valid[..., None] * wsq_j[None, None, :], cfg.hop_length)
    else:
        env = overlap_add(
            jnp.broadcast_to(wsq_j, (1, n_frames, cfg.n_fft)), cfg.hop_length
        )
    y = overlap_add(frames, cfg.hop_length)
    y = y / jnp.maximum(env, 1e-11)
    if cfg.center:
        half = cfg.n_fft // 2
        y = y[:, half:-half]
    if length is not None:
        y = y[:, :length]
    return y
