"""Layer library: pure init/apply functions over plain dict pytrees.

Design: no Module framework — every layer is an ``*_init(key, ...) -> params``
plus an ``apply(params, x, ...) -> y`` pure function, so the whole model is a
pytree + a jittable function (pjit/shard_map/scan friendly, and checkpoint
loading is a plain tree mapping).

Numerical semantics mirror the reference layer library
src/f5_tts/model/modules.py (file:line cites on each layer).  Initializers
reproduce torch defaults (kaiming-uniform Linear/Conv, N(0,1) Embedding) so
random-init behavior matches the reference.

Layout conventions: sequences are [b, n, d]; convs run in NWC layout
(TPU-native); linear kernels are stored [in, out] (checkpoint converter
transposes torch's [out, in]).
"""

from __future__ import annotations

import math
import threading

import jax
import jax.numpy as jnp

from f5_tts_tpu.ops.attention import attention
from f5_tts_tpu.ops.rope import apply_rotary

# ---------------------------------------------------------------------------
# primitives


def _uniform(key, shape, bound):
    return jax.random.uniform(key, shape, minval=-bound, maxval=bound, dtype=jnp.float32)


def linear_init(key, in_dim: int, out_dim: int, bias: bool = True, zero: bool = False):
    """torch.nn.Linear default init: U(+-1/sqrt(fan_in)) for weight and bias."""
    if zero:
        p = {"kernel": jnp.zeros((in_dim, out_dim), jnp.float32)}
        if bias:
            p["bias"] = jnp.zeros((out_dim,), jnp.float32)
        return p
    k1, k2 = jax.random.split(key)
    bound = 1.0 / math.sqrt(in_dim)
    p = {"kernel": _uniform(k1, (in_dim, out_dim), bound)}
    if bias:
        p["bias"] = _uniform(k2, (out_dim,), bound)
    return p


def linear(p, x):
    if "kernel_q" in p:  # W8A8 serving path (ops/quant.py, EngineOptions.quantize)
        from f5_tts_tpu.ops.quant import int8_matmul, quantize_rows

        shp = x.shape
        x2 = x.reshape(-1, shp[-1])
        x_q, xs = quantize_rows(x2)
        y = int8_matmul(x_q, xs, p["kernel_q"], p["w_scale"])
        y = y.reshape(*shp[:-1], -1).astype(x.dtype)
    else:
        y = x @ p["kernel"]
    if "bias" in p:
        y = y + p["bias"]
    return y


def embedding_init(key, num_embeddings: int, dim: int):
    """torch.nn.Embedding default init: N(0, 1)."""
    return {"weight": jax.random.normal(key, (num_embeddings, dim), jnp.float32)}


def embedding(p, ids):
    # mode="clip": out-of-vocab ids clamp to the last row instead of jit's
    # default NaN fill (ids must already be valid for parity; this only guards
    # against silent NaN poisoning on config mismatch)
    return jnp.take(p["weight"], ids, axis=0, mode="clip")


def layer_norm(x, weight=None, bias=None, eps: float = 1e-6):
    """LayerNorm over the last axis; non-affine when weight is None.  Statistics
    in fp32 (matches torch autocast behavior)."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.astype(x.dtype)
    if weight is not None:
        y = y * weight
    if bias is not None:
        y = y + bias
    return y


def layer_norm_init(dim: int):
    return {"weight": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


def rms_norm_init(dim: int):
    return {"weight": jnp.ones((dim,), jnp.float32)}


def rms_norm(p, x, eps: float = 1e-6):
    """modules.py:286-305 — fp32 mean-square, then scale."""
    var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
    y = (x.astype(jnp.float32) * jax.lax.rsqrt(var + eps)).astype(x.dtype)
    return y * p["weight"].astype(x.dtype)


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def conv1d_init(key, in_dim: int, out_dim: int, kernel_size: int, groups: int = 1, bias: bool = True):
    """torch.nn.Conv1d default init; kernel stored [k, in/groups, out] (WIO)."""
    k1, k2 = jax.random.split(key)
    fan_in = (in_dim // groups) * kernel_size
    bound = 1.0 / math.sqrt(fan_in)
    p = {"kernel": _uniform(k1, (kernel_size, in_dim // groups, out_dim), bound)}
    if bias:
        p["bias"] = _uniform(k2, (out_dim,), bound)
    return p


def conv1d(p, x, groups: int = 1, dilation: int = 1, padding: str | int = "same"):
    """x: [b, n, d_in] -> [b, n, d_out], NWC layout."""
    k = p["kernel"].shape[0]
    if padding == "same":
        pad_total = dilation * (k - 1)
        pads = [(pad_total // 2, pad_total - pad_total // 2)]
    else:
        pads = [(padding, padding)]
    y = jax.lax.conv_general_dilated(
        x,
        p["kernel"].astype(x.dtype),
        window_strides=(1,),
        padding=pads,
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


# ---------------------------------------------------------------------------
# F5-TTS layers


def grn_init(dim: int):
    """Global Response Norm (modules.py:236-245)."""
    return {"gamma": jnp.zeros((dim,), jnp.float32), "beta": jnp.zeros((dim,), jnp.float32)}


def grn(p, x):
    # L2 norm over the sequence axis per channel, normalized by channel mean.
    gx = jnp.sqrt(jnp.sum(jnp.square(x.astype(jnp.float32)), axis=1, keepdims=True))
    nx = gx / (gx.mean(axis=-1, keepdims=True) + 1e-6)
    nx = nx.astype(x.dtype)
    return p["gamma"].astype(x.dtype) * (x * nx) + p["beta"].astype(x.dtype) + x


def convnext_v2_init(key, dim: int, intermediate_dim: int):
    """ConvNeXt-V2 block (modules.py:252-280): dwconv k=7 -> LN -> pw -> GELU ->
    GRN -> pw, residual."""
    ks = jax.random.split(key, 3)
    return {
        "dwconv": conv1d_init(ks[0], dim, dim, 7, groups=dim),
        "norm": layer_norm_init(dim),
        "pwconv1": linear_init(ks[1], dim, intermediate_dim),
        "grn": grn_init(intermediate_dim),
        "pwconv2": linear_init(ks[2], intermediate_dim, dim),
    }


def convnext_v2(p, x, dilation: int = 1):
    residual = x
    x = conv1d(p["dwconv"], x, groups=x.shape[-1], dilation=dilation)
    x = layer_norm(x, p["norm"]["weight"].astype(x.dtype), p["norm"]["bias"].astype(x.dtype), eps=1e-6)
    x = linear(p["pwconv1"], x)
    x = jax.nn.gelu(x, approximate=False)
    x = grn(p["grn"], x)
    x = linear(p["pwconv2"], x)
    return residual + x


def conv_pos_embed_init(key, dim: int, kernel_size: int = 31, groups: int = 16):
    """ConvPositionEmbedding (modules.py:175-201): 2x (grouped conv k=31 + Mish)."""
    k1, k2 = jax.random.split(key)
    return {
        "conv1": conv1d_init(k1, dim, dim, kernel_size, groups=groups),
        "conv2": conv1d_init(k2, dim, dim, kernel_size, groups=groups),
    }


def conv_pos_embed_xla(p, x, mask=None, groups: int = 16):
    """Re-masks after each conv so padding never leaks (modules.py:192-197)."""
    g = groups
    m = None if mask is None else mask[..., None].astype(x.dtype)
    if m is not None:
        x = x * m
    x = mish(conv1d(p["conv1"], x, groups=g))
    if m is not None:
        x = x * m
    x = mish(conv1d(p["conv2"], x, groups=g))
    if m is not None:
        x = x * m
    return x


def _grouped_conv1d_taps(p, x, groups: int):
    """Grouped k-tap conv as k shifted block-diagonal einsums.

    GSPMD workaround: XLA's partitioner refuses to batch-shard convolutions
    with ``feature_group_count > 1`` — under a data-parallel mesh the grouped
    conv all-gathers and runs the FULL batch replicated on every device
    (measured: per-device flops ratio 3.7/8 on a dp=8 train step, convs at
    full batch in the partitioned HLO; vmap-over-groups folds back to the
    same grouped conv).  Expressed as per-tap einsums the op stays dot-based
    and shards cleanly (zero all-gathers).  Same math, same fan-in order."""
    k = p["kernel"].shape[0]
    b, n, c = x.shape
    g, cg = groups, c // groups
    lo = (k - 1) // 2
    xp = jnp.pad(x, ((0, 0), (lo, k - 1 - lo), (0, 0)))
    xg = xp.reshape(b, n + k - 1, g, cg)
    wg = p["kernel"].astype(x.dtype).reshape(k, cg, g, cg)  # [k, in/g, g, out/g]
    out = jnp.zeros((b, n, g, cg), x.dtype)
    for t in range(k):
        out = out + jnp.einsum("bngi,igo->bngo", xg[:, t : t + n], wg[t])
    out = out.reshape(b, n, c)
    if "bias" in p:
        out = out + p["bias"].astype(x.dtype)
    return out


def conv_pos_embed_taps(p, x, mask=None, groups: int = 16):
    """conv_pos_embed via the einsum-tap grouped conv (GSPMD-shardable);
    numerics match conv_pos_embed_xla to float reassociation."""
    m = None if mask is None else mask[..., None].astype(x.dtype)
    if m is not None:
        x = x * m
    x = mish(_grouped_conv1d_taps(p["conv1"], x, groups))
    if m is not None:
        x = x * m
    x = mish(_grouped_conv1d_taps(p["conv2"], x, groups))
    if m is not None:
        x = x * m
    return x


# "auto": fused Pallas chain on TPU, XLA grouped convs elsewhere.
# "taps": einsum-tap formulation — set via set_convpos_impl for data-parallel
# meshes where the XLA grouped conv would run replicated (see
# _grouped_conv1d_taps).  THREAD-LOCAL and read at trace time: scope a
# set/restore pair around the code that traces the graph (Trainer step build,
# engine _sample_and_decode body), so concurrent traces on server worker
# threads can't see each other's switch.  Callers must also key their jit
# cache on the choice (EngineOptions.convpos_taps is a static arg).
_convpos_tls = threading.local()


def set_convpos_impl(impl: str) -> str:
    """Returns the previous impl ("auto" | "taps"); thread-local."""
    assert impl in ("auto", "taps"), impl
    prev = getattr(_convpos_tls, "impl", "auto")
    _convpos_tls.impl = impl
    return prev


def _convpos_impl() -> str:
    return getattr(_convpos_tls, "impl", "auto")


def conv_pos_embed(p, x, mask=None, groups: int = 16):
    """ConvPositionEmbedding: fused Pallas chain on TPU (ops/fused_convpos.py
    keeps both convs + Mish + re-masking VMEM-resident per group), XLA grouped
    convs elsewhere; ``set_convpos_impl("taps")`` switches to the
    GSPMD-shardable einsum-tap formulation for data-parallel meshes."""
    if _convpos_impl() == "taps":
        return conv_pos_embed_taps(p, x, mask=mask, groups=groups)
    try:
        from f5_tts_tpu.ops.fused_convpos import conv_pos_fused, conv_pos_supported

        if conv_pos_supported(x, groups):
            return conv_pos_fused(p, x, mask=mask, groups=groups)
    except ImportError:
        pass
    return conv_pos_embed_xla(p, x, mask=mask, groups=groups)


def sinus_pos_embed(x: jax.Array, dim: int, scale: float = 1000.0) -> jax.Array:
    """SinusPositionEmbedding (modules.py:157-169): [b] -> [b, dim], cat(sin, cos)."""
    half = dim // 2
    freqs = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -(math.log(10000.0) / (half - 1)))
    ang = scale * x.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


def timestep_embed_init(key, dim: int, freq_embed_dim: int = 256):
    """TimestepEmbedding (modules.py:852-862)."""
    k1, k2 = jax.random.split(key)
    return {
        "mlp1": linear_init(k1, freq_embed_dim, dim),
        "mlp2": linear_init(k2, dim, dim),
    }


def timestep_embed(p, t: jax.Array, dtype=jnp.float32, freq_embed_dim: int = 256) -> jax.Array:
    h = sinus_pos_embed(t, freq_embed_dim).astype(dtype)
    h = linear(p["mlp1"], h)
    h = jax.nn.silu(h)
    return linear(p["mlp2"], h)


def adaln_init(key, dim: int, zero: bool = True):
    """AdaLayerNorm (modules.py:312-326): SiLU -> Linear(dim, 6*dim), zero-init
    in DiT blocks (backbones/dit.py:264-274)."""
    return {"linear": linear_init(key, dim, dim * 6, zero=zero)}


def adaln(p, x, emb):
    """Returns (modulated_x, gate_msa, shift_mlp, scale_mlp, gate_mlp)."""
    e = linear(p["linear"], jax.nn.silu(emb))
    shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = jnp.split(e, 6, axis=-1)
    x = layer_norm(x, eps=1e-6) * (1 + scale_msa[:, None]) + shift_msa[:, None]
    return x, gate_msa, shift_mlp, scale_mlp, gate_mlp


def adaln_final_init(key, dim: int, zero: bool = True):
    """AdaLayerNorm_Final (modules.py:333-347)."""
    return {"linear": linear_init(key, dim, dim * 2, zero=zero)}


def adaln_final(p, x, emb):
    e = linear(p["linear"], jax.nn.silu(emb))
    scale, shift = jnp.split(e, 2, axis=-1)
    return layer_norm(x, eps=1e-6) * (1 + scale[:, None]) + shift[:, None]


def adaln_final_from_mod(mod, x):
    """adaln_final from a precomputed modulation: [2*dim] (one timestep shared
    by the batch) or [rows, 2*dim] (per-row timesteps — time-parallel window,
    models/cfm.py _picard_integrate)."""
    m = mod if mod.ndim == 2 else mod[None]
    scale, shift = jnp.split(m, 2, axis=-1)
    return layer_norm(x, eps=1e-6) * (1 + scale[:, None]) + shift[:, None]


def feedforward_init(key, dim: int, mult: int = 4, dim_out: int | None = None):
    """FeedForward (modules.py:353-364): Linear -> GELU(tanh) -> Linear."""
    inner = int(dim * mult)
    k1, k2 = jax.random.split(key)
    return {"in": linear_init(k1, dim, inner), "out": linear_init(k2, inner, dim_out or dim)}


def feedforward(p, x):
    return linear(p["out"], jax.nn.gelu(linear(p["in"], x), approximate=True))


def mha_init(key, dim: int, heads: int, dim_head: int, qk_norm: str | None = None):
    """Attention projections (modules.py:371-427), self-attention variant."""
    inner = heads * dim_head
    ks = jax.random.split(key, 4)
    p = {
        "to_q": linear_init(ks[0], dim, inner),
        "to_k": linear_init(ks[1], dim, inner),
        "to_v": linear_init(ks[2], dim, inner),
        "to_out": linear_init(ks[3], inner, dim),
    }
    if qk_norm == "rms_norm":
        p["q_norm"] = rms_norm_init(dim_head)
        p["k_norm"] = rms_norm_init(dim_head)
    return p


def fuse_qkv(p):
    """Fuse separate q/k/v projections into one [dim, 3*inner] matmul (serving
    optimization: one pass over the activations instead of three).  Returns a
    new attn param dict with a "to_qkv" entry; mha() detects it."""
    if "to_qkv" in p:
        return p
    out = {k: v for k, v in p.items() if k not in ("to_q", "to_k", "to_v")}
    out["to_qkv"] = {
        # axis=-1 handles both plain [in, out] and scan-stacked [depth, in, out]
        "kernel": jnp.concatenate(
            [p["to_q"]["kernel"], p["to_k"]["kernel"], p["to_v"]["kernel"]], axis=-1
        ),
        "bias": jnp.concatenate(
            [p["to_q"]["bias"], p["to_k"]["bias"], p["to_v"]["bias"]], axis=-1
        ),
    }
    return out


def mha(
    p,
    x,
    heads: int,
    mask=None,
    rope_freqs=None,
    pe_attn_head: int | None = None,
    backend: str = "auto",
):
    """Self-attention with rotary embedding (AttnProcessor, modules.py:451-556).

    rope is applied to the first ``pe_attn_head`` heads only when set (legacy v0
    configs); padding-key masking + output re-masking match the reference.
    """
    b, n, _ = x.shape
    if "to_qkv" in p:
        qkv = linear(p["to_qkv"], x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
    else:
        q, k, v = linear(p["to_q"], x), linear(p["to_k"], x), linear(p["to_v"], x)
    q = q.reshape(b, n, heads, -1).transpose(0, 2, 1, 3)  # [b, h, n, d]
    k = k.reshape(b, n, heads, -1).transpose(0, 2, 1, 3)
    v = v.reshape(b, n, heads, -1).transpose(0, 2, 1, 3)
    if "q_norm" in p:
        q = rms_norm(p["q_norm"], q)
        k = rms_norm(p["k_norm"], k)
    if rope_freqs is not None:
        if pe_attn_head is not None:
            pn = pe_attn_head
            q = jnp.concatenate([apply_rotary(q[:, :pn], rope_freqs), q[:, pn:]], axis=1)
            k = jnp.concatenate([apply_rotary(k[:, :pn], rope_freqs), k[:, pn:]], axis=1)
        else:
            q = apply_rotary(q, rope_freqs)
            k = apply_rotary(k, rope_freqs)
    o = attention(q, k, v, mask=mask, backend=backend)
    o = o.transpose(0, 2, 1, 3).reshape(b, n, -1)
    o = linear(p["to_out"], o)
    if mask is not None:
        o = o * mask[..., None].astype(o.dtype)
    return o


def dit_block_init(key, dim: int, heads: int, dim_head: int, ff_mult: int = 4, qk_norm=None):
    """DiTBlock (modules.py:711-757): AdaLN-zero attention + gated FF."""
    ks = jax.random.split(key, 3)
    return {
        "attn_norm": adaln_init(ks[0], dim, zero=True),
        "attn": mha_init(ks[1], dim, heads, dim_head, qk_norm=qk_norm),
        "ff": feedforward_init(ks[2], dim, mult=ff_mult),
    }


def dit_block(p, x, t_emb, heads: int, mask=None, rope_freqs=None, pe_attn_head=None,
              backend="auto", mod=None):
    """``mod``: optional precomputed AdaLN modulation — row [6*dim] for a
    timestep shared by the whole batch, or [rows, 6*dim] per-row timesteps
    (time-parallel window) — skips the per-block adaln matmul (and its
    6.3M-param weight read)."""
    if mod is not None:
        e = mod if mod.ndim == 2 else mod[None]  # [rows|1, 6*dim]
        shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = jnp.split(e, 6, axis=-1)
        norm = layer_norm(x, eps=1e-6) * (1 + scale_msa[:, None]) + shift_msa[:, None]
    else:
        norm, gate_msa, shift_mlp, scale_mlp, gate_mlp = adaln(p["attn_norm"], x, t_emb)
    attn_out = mha(
        p["attn"], norm, heads, mask=mask, rope_freqs=rope_freqs, pe_attn_head=pe_attn_head, backend=backend
    )
    x = x + gate_msa[:, None] * attn_out
    norm = layer_norm(x, eps=1e-6) * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
    x = x + gate_mlp[:, None] * feedforward(p["ff"], norm)
    return x
