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


def attention(q, k, v, mask=None, backend: str = "auto"):
    """Dispatch between XLA SDPA and the Pallas flash kernel.

    backend: "auto" (flash on TPU when shapes allow, else SDPA), "sdpa", "flash".
    """
    if backend == "sdpa":
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
