"""Pallas TPU flash attention — non-causal, length-masked (prefix padding mask).

Replaces the reference's flash-attn CUDA path / TRT bert_attention plugin
(reference modules.py:446-448,522-543; runtime patch modules.py:311-334) and
the XLA SDPA fallback for the DiT hot loop.  Never materializes the [n, n]
score matrix in HBM: online softmax over key chunks, fp32 accumulators in
VMEM, bf16 MXU matmuls.

Shapes: q/k/v [b, h, n, dh]; dh padded to a lane multiple by the caller
(dh=64 for all F5 configs); n must be a multiple of the query block.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_BIG = -1e30


def _kernel(lens_ref, q_ref, k_ref, v_ref, o_ref, *, scale, block_k, n_kv, heads):
    bh = pl.program_id(0)
    b = bh // heads
    kv_len = lens_ref[b]

    q = q_ref[0].astype(jnp.bfloat16)  # [BQ, dh]
    bq = q.shape[0]
    dh = q.shape[1]

    m = jnp.full((bq, 1), NEG_BIG, jnp.float32)
    l = jnp.zeros((bq, 1), jnp.float32)
    acc = jnp.zeros((bq, dh), jnp.float32)

    num_chunks = n_kv // block_k
    for j in range(num_chunks):  # static unroll; n_kv is a compile-time bucket
        k = k_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.bfloat16)
        v = v_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.bfloat16)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [BQ, BK]
        col = jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1) + j * block_k
        s = jnp.where(col < kv_len, s, NEG_BIG)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m = m_new

    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def _flash(q, k, v, lens, block_q: int, block_k: int):
    b, h, n, dh = q.shape
    scale = dh**-0.5
    grid = (b * h, n // block_q)

    # index maps get the scalar-prefetch ref appended to the grid indices
    def q_map(bh, iq, *_):
        return (bh, iq, 0)

    def kv_map(bh, iq, *_):
        return (bh, 0, 0)

    qf = q.reshape(b * h, n, dh)
    kf = k.reshape(b * h, n, dh)
    vf = v.reshape(b * h, n, dh)

    kernel = functools.partial(_kernel, scale=scale, block_k=block_k, n_kv=n, heads=h)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, dh), q_map),
                pl.BlockSpec((1, n, dh), kv_map),
                pl.BlockSpec((1, n, dh), kv_map),
            ],
            out_specs=pl.BlockSpec((1, block_q, dh), q_map),
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, n, dh), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(lens, qf, kf, vf)
    return out.reshape(b, h, n, dh)


def flash_supported(q) -> bool:
    """Shape/platform gate for the ``auto`` backend."""
    if jax.default_backend() == "cpu":
        return False
    b, h, n, dh = q.shape
    return n >= 256 and n % 256 == 0 and dh % 64 == 0


def flash_attention(q, k, v, mask=None, block_q: int = 256, block_k: int = 512):
    """Drop-in for ops.attention.sdpa.  ``mask`` must be a prefix (length)
    mask [b, n]; converted to per-sample lengths for the kernel."""
    b, h, n, dh = q.shape
    if mask is None:
        lens = jnp.full((b,), n, jnp.int32)
    else:
        lens = jnp.sum(mask, axis=-1).astype(jnp.int32)
    block_q = min(block_q, n)
    block_k = min(block_k, n)
    return _flash(q, k, v, lens, block_q, block_k)
