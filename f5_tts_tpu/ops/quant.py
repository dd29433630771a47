"""Int8 quantized matmul — Pallas TPU kernel (experimental).

W8A8 dynamic quantization: per-row activation scales x per-column weight
scales, int8 x int8 -> int32 accumulation on the MXU (2x bf16 MACs/clock on
v5e), dequantized at the tile epilogue.  Not wired into the default serving
path — quality on real checkpoints should be validated first (the reference's
TRT path exposes the analogous fp8 option, convert_checkpoint.py:225-231).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def quantize_rows(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """[m, k] -> (int8 values [m, k], scales [m, 1]); symmetric per-row."""
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def quantize_cols(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """[k, n] -> (int8 [k, n], scales [1, n]); symmetric per-column (weights)."""
    amax = jnp.max(jnp.abs(w), axis=0, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale.astype(jnp.float32)


def _kernel(x_ref, w_ref, xs_ref, ws_ref, o_ref, *, block_k, k_total):
    acc = jnp.zeros((x_ref.shape[0], w_ref.shape[1]), jnp.int32)
    for j in range(k_total // block_k):
        xb = x_ref[:, pl.ds(j * block_k, block_k)]
        wb = w_ref[pl.ds(j * block_k, block_k), :]
        acc = acc + jax.lax.dot_general(
            xb, wb, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
    o_ref[:, :] = acc.astype(jnp.float32) * xs_ref[:, :] * ws_ref[:, :]


@functools.partial(jax.jit, static_argnames=("block_m", "block_n", "block_k"))
def int8_matmul(
    x_q: jax.Array,  # [m, k] int8
    x_scale: jax.Array,  # [m, 1] f32
    w_q: jax.Array,  # [k, n] int8
    w_scale: jax.Array,  # [1, n] f32
    block_m: int = 256,
    block_n: int = 256,
    block_k: int = 512,
) -> jax.Array:
    m, k = x_q.shape
    _, n = w_q.shape
    # blocks must DIVIDE their dims — the grid / unrolled-K loop has no
    # remainder handling (same failure family as the flash kernel's old
    # fixed block_k: silently dropped tails)
    from f5_tts_tpu.ops.flash_attention import _pick_block

    block_m = _pick_block(m, block_m)
    block_n = _pick_block(n, block_n)
    block_k = _pick_block(k, block_k)
    grid = (m // block_m, n // block_n)
    return pl.pallas_call(
        functools.partial(_kernel, block_k=block_k, k_total=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, k), lambda i, j: (i, 0)),
            pl.BlockSpec((k, block_n), lambda i, j: (0, j)),
            pl.BlockSpec((block_m, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((1, block_n), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
    )(x_q, w_q, x_scale, w_scale)


def quantized_linear(x: jax.Array, w: jax.Array, bias: jax.Array | None = None) -> jax.Array:
    """Drop-in W8A8 linear: [m, k] @ [k, n] with on-the-fly quantization.
    Weights should be pre-quantized once for serving; this form is for testing."""
    x_q, xs = quantize_rows(x)
    w_q, ws = quantize_cols(w)
    y = int8_matmul(x_q, xs, w_q, ws)
    if bias is not None:
        y = y + bias
    return y


# ------------------------------------------------------------ serving wiring


def quantize_linear_params(lin: dict) -> dict:
    """{"kernel" [.., k, n], "bias"?} -> {"kernel_q" int8, "w_scale" f32,
    "bias"?}; stacked (scan) leading depth axes quantize per block."""
    w = lin["kernel"]
    qf = quantize_cols
    for _ in range(w.ndim - 2):
        qf = jax.vmap(qf)
    w_q, ws = qf(jnp.asarray(w, jnp.float32))
    out = {"kernel_q": w_q, "w_scale": ws}
    if "bias" in lin:
        out["bias"] = lin["bias"]
    return out


def quantize_dit_blocks(params: dict) -> dict:
    """W8A8-quantize the hot scan-stacked DiT block linears (attention
    projections + feedforward); everything else (AdaLN, embeddings, output
    head) stays dense.  The engine applies this behind EngineOptions.quantize
    (the analog of the reference TRT path's fp8 option,
    scripts/convert_checkpoint.py:225-231)."""
    params = dict(params)
    blocks = dict(params["blocks"])
    if "attn" in blocks:
        attn = dict(blocks["attn"])
        for k in ("to_q", "to_k", "to_v", "to_qkv", "to_out"):
            if k in attn:
                attn[k] = quantize_linear_params(attn[k])
        blocks["attn"] = attn
    if "ff" in blocks:
        ff = dict(blocks["ff"])
        for k in ("in", "out"):
            ff[k] = quantize_linear_params(ff[k])
        blocks["ff"] = ff
    params["blocks"] = blocks
    return params
