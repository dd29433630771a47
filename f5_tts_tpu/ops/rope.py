"""Rotary position embeddings (x_transformers-compatible, interleaved layout)
and the concat-[cos||sin] absolute sinusoidal table used by the text encoder.

Reference behavior:
- audio-stream rotary: x_transformers RotaryEmbedding(dim_head) +
  apply_rotary_pos_emb (interleaved rotate-every-two pairs), consumed in
  src/f5_tts/model/modules.py:498-509 and backbones/dit.py:352.
- text abs-pos: precompute_freqs_cis (modules.py:207-218) producing
  [cos(t f) || sin(t f)] concatenated over the half-dim axis, added (not
  rotated) to text embeddings (backbones/dit.py:115-120).

Tables are precomputed as numpy constants and closed over by the jitted graph.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=16)
def rotary_freqs(max_len: int, dim: int, theta: float = 10000.0,
                 theta_rescale_factor: float = 1.0) -> np.ndarray:
    """Interleaved rotary angle table [max_len, dim]: [f0, f0, f1, f1, ...].

    ``theta_rescale_factor`` is the NTK-aware long-context rescale hook the
    reference exposes but ships unused (modules.py:207-212)."""
    if theta_rescale_factor != 1.0:
        theta = theta * theta_rescale_factor ** (dim / (dim - 2))
    inv_freq = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    freqs = np.outer(np.arange(max_len, dtype=np.float64), inv_freq)  # [n, dim/2]
    return np.repeat(freqs, 2, axis=-1).astype(np.float32)  # [n, dim]


def rotate_half_interleaved(x: jax.Array) -> jax.Array:
    """(x0, x1, x2, x3, ...) -> (-x1, x0, -x3, x2, ...) over the last axis."""
    x2 = x.reshape(*x.shape[:-1], x.shape[-1] // 2, 2)
    a, b = x2[..., 0], x2[..., 1]
    return jnp.stack((-b, a), axis=-1).reshape(x.shape)


def apply_rotary(t: jax.Array, freqs: jax.Array) -> jax.Array:
    """Apply rotary embedding. t: [..., n, d]; freqs: [n, d] interleaved angles."""
    cos = jnp.cos(freqs).astype(t.dtype)
    sin = jnp.sin(freqs).astype(t.dtype)
    return t * cos + rotate_half_interleaved(t) * sin


@functools.lru_cache(maxsize=16)
def abs_pos_table(max_len: int, dim: int, theta: float = 10000.0, theta_rescale_factor: float = 1.0) -> np.ndarray:
    """[cos || sin] absolute position table [max_len, dim] (modules.py:207-218)."""
    theta = theta * theta_rescale_factor ** (dim / (dim - 2))
    inv_freq = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64)[: dim // 2] / dim))
    freqs = np.outer(np.arange(max_len, dtype=np.float64), inv_freq)
    return np.concatenate([np.cos(freqs), np.sin(freqs)], axis=-1).astype(np.float32)
