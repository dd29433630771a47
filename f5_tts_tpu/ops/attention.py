"""Non-causal, length-masked multi-head attention.

Two backends behind one signature:
- ``sdpa``: plain XLA einsum attention with fp32 softmax (matches
  torch.nn.functional.scaled_dot_product_attention used by the reference,
  src/f5_tts/model/modules.py:511-520).
- Pallas flash attention (ops/flash_attention.py) for the TPU hot path,
  selected by ``attention(..., backend="flash")``.

Masking semantics mirror the reference: a key-side boolean padding mask
broadcast as [b, 1, 1, n]; fully-masked (padding) query rows are re-zeroed by
the caller via the output mask (modules.py:552-554).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def sdpa(
    q: jax.Array,  # [b, h, n, d]
    k: jax.Array,  # [b, h, n, d]
    v: jax.Array,  # [b, h, n, d]
    mask: jax.Array | None = None,  # [b, n] bool keep-mask (key side)
) -> jax.Array:
    """Returns [b, h, n, d]. Softmax accumulates in fp32."""
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * scale
    if mask is not None:
        bias = jnp.where(mask[:, None, None, :], 0.0, NEG_INF).astype(jnp.float32)
        logits = logits + bias
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


def chunked_attention(
    q: jax.Array,  # [b, h, n, d]
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array | None = None,  # [b, n] bool keep-mask
    chunk: int = 512,
) -> jax.Array:
    """Memory-efficient attention: online softmax over key chunks via lax.scan.

    Never materializes the [n, n] score matrix (peak activation O(n*chunk)), and
    is fully differentiable — autodiff through the scan yields the
    flash-style recomputing backward.  Used for TRAINING long sequences (the
    Pallas flash kernel has no backward); numerically matches sdpa.
    """
    b, h, n, d = q.shape
    scale = d**-0.5
    if n % chunk != 0:
        return sdpa(q, k, v, mask)
    kc = k.reshape(b, h, n // chunk, chunk, d).transpose(2, 0, 1, 3, 4)
    vc = v.reshape(b, h, n // chunk, chunk, d).transpose(2, 0, 1, 3, 4)
    if mask is not None:
        mc = mask.reshape(b, n // chunk, chunk).transpose(1, 0, 2)
    else:
        mc = jnp.ones((n // chunk, b, chunk), bool)

    def body(carry, inp):
        m_run, l_run, acc = carry
        k_j, v_j, mask_j = inp
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k_j).astype(jnp.float32) * scale
        s = jnp.where(mask_j[:, None, None, :], s, NEG_INF)
        m_new = jnp.maximum(m_run, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_run - m_new)
        l_new = l_run * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.einsum("bhqk,bhkd->bhqd", p.astype(v_j.dtype), v_j).astype(jnp.float32)
        return (m_new, l_new, acc), None

    m0 = jnp.full((b, h, n, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, h, n, 1), jnp.float32)
    a0 = jnp.zeros((b, h, n, d), jnp.float32)
    (m_f, l_f, acc), _ = jax.lax.scan(body, (m0, l0, a0), (kc, vc, mc))
    return (acc / jnp.maximum(l_f, 1e-30)).astype(q.dtype)


def attention(q, k, v, mask=None, backend: str = "auto"):
    """Dispatch between XLA SDPA and the Pallas flash kernel.

    backend: "auto" (flash on TPU when shapes allow, else SDPA), "sdpa",
    "flash" — or a callable ``(q, k, v, mask) -> o`` for mesh-aware backends
    (e.g. parallel/ring.py make_ring_attention's sequence-parallel ring).
    """
    if callable(backend):
        return backend(q, k, v, mask)
    if backend == "sdpa":
        return sdpa(q, k, v, mask)
    if backend == "chunked":
        return chunked_attention(q, k, v, mask)
    if backend in ("flash_train", "train_auto"):
        # differentiable Pallas kernel (custom VJP) for training
        try:
            from f5_tts_tpu.ops.flash_attention import flash_attention_trainable, flash_supported

            if backend == "flash_train" or flash_supported(q):
                return flash_attention_trainable(q, k, v, mask)
        except ImportError:
            if backend == "flash_train":
                raise
        return sdpa(q, k, v, mask)
    if backend in ("flash", "auto"):
        try:
            from f5_tts_tpu.ops.flash_attention import flash_attention, flash_supported

            if backend == "flash" or flash_supported(q):
                return flash_attention(q, k, v, mask)
        except ImportError:
            if backend == "flash":
                raise
    return sdpa(q, k, v, mask)
