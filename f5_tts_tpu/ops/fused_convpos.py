"""Fused ConvPositionEmbedding Pallas kernel.

The reference ConvPositionEmbedding (src/f5_tts/model/modules.py:175-201) is
two grouped Conv1d(k=31, groups=16) + Mish stages with re-masking.  XLA
lowers each grouped conv into group-split fusions ([b, n, 16, 64] layout)
costing ~0.8 ms per NFE step at the 1024 bucket (scripts/
bench_step_breakdown.py profile) — ~8% of the step.

Key structural fact: both convs share the same grouping, and a grouped conv's
output group g depends only on input group g — so the ENTIRE chain
``mask -> conv1 -> mish -> mask -> conv2 -> mish -> mask`` is separable per
(batch, group).  This kernel runs the whole chain for one (b, g) pair with
the x slice, both weight slices, and the intermediate all VMEM-resident: one
pass over HBM in, one out, taps as 31 small MXU dots from VMEM.

Gradients: the kernel is wrapped in a custom VJP whose backward linearizes
the plain-XLA composition (models/layers.py conv_pos_embed math) — training
uses the fused forward and exact XLA-derived gradients.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from f5_tts_tpu.models import layers as L

KSIZE = 31
HALF = KSIZE // 2  # 15
PAD = 2 * HALF  # halo for the two stacked convs


def _kernel(lens_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *, n, dg, dtype):
    """One (batch row, PAIR of groups): blocks are 2*dg = 128 lanes wide
    (Pallas TPU requires 128-divisible last block dims); the two 64-wide
    group halves are sliced in-register.  x_ref [1, n+2*PAD, 2*dg] pre-masked
    + zero-padded; w refs [31, dg, 2*dg]; bias [1, 2*dg]; o_ref [1, n, 2*dg]."""
    # one program = one (batch row, group pair, <=1024-row chunk).  Chunking
    # via the GRID (not an unrolled in-kernel loop): the unrolled 31-tap
    # loop's live intermediates scale with the row span, and Mosaic does not
    # reuse stack across unrolled chunk iterations — full 2048+ buckets blew
    # the 16 MB scoped-vmem stack.  Chunk halos recompute 2*HALF conv1 rows.
    bi = pl.program_id(0)
    ci = pl.program_id(2)
    length = lens_ref[bi]
    ch = o_ref.shape[1]  # chunk rows (out block)
    c0 = pl.multiple_of(ci * ch, ch)
    ni = ch + 2 * HALF  # intermediate rows: logical [c0-HALF, c0+ch+HALF)
    ridx1 = jax.lax.broadcasted_iota(jnp.int32, (ni, dg), 0) + (c0 - HALF)
    ridx2 = jax.lax.broadcasted_iota(jnp.int32, (ch, dg), 0) + c0

    for s in (0, 1):  # the two groups of this pair
        sl = slice(s * dg, (s + 1) * dg)
        # ONE aligned dynamic load of the chunk's halo window (start c0 is a
        # chunk multiple, provably 8-aligned for Mosaic; per-tap dynamic
        # starts c0+t are not), then static in-register tap slices.
        # x_ref row p maps to logical row p - PAD; conv1 output rows
        # [c0-HALF, c0+ch+HALF) need x logical [c0-2*HALF, c0+ch+2*HALF)
        # = ref rows [c0, c0 + ch + 2*PAD) and tap t reads xw[t : t + ni].
        xw = x_ref[0, pl.ds(c0, ni + KSIZE - 1), sl].astype(dtype)
        acc = jnp.zeros((ni, dg), jnp.float32)
        for t in range(KSIZE):
            acc = acc + jax.lax.dot_general(
                xw[t : t + ni], w1_ref[t, :, sl].astype(dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        acc = acc + b1_ref[0, sl].astype(jnp.float32)
        inter = L.mish(acc)
        # re-mask (modules.py:192-197): valid logical rows are [0, length)
        inter = jnp.where((ridx1 >= 0) & (ridx1 < length), inter, 0.0).astype(dtype)

        acc2 = jnp.zeros((ch, dg), jnp.float32)
        for t in range(KSIZE):
            acc2 = acc2 + jax.lax.dot_general(
                inter[t : t + ch], w2_ref[t, :, sl].astype(dtype), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        acc2 = acc2 + b2_ref[0, sl].astype(jnp.float32)
        out = L.mish(acc2)
        out = jnp.where(ridx2 < length, out, 0.0)
        o_ref[0, :, sl] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("groups",))
def _conv_pos_fused(x, w1, b1, w2, b2, lens, groups: int):
    b, n, d = x.shape
    dg = d // groups
    # pre-mask + halo-pad once (fuses with upstream elementwise in XLA)
    xm = jnp.where(jnp.arange(n)[None, :, None] < lens[:, None, None], x, 0)
    xp = jnp.pad(xm, ((0, 0), (PAD, PAD), (0, 0)))
    dtype = jnp.bfloat16 if x.dtype == jnp.bfloat16 else jnp.float32
    kernel = functools.partial(_kernel, n=n, dg=dg, dtype=dtype)
    dp = 2 * dg  # group-pair block width (128 lanes)
    ch = min(n, 1024)
    while ch > 0 and n % ch:  # largest row-chunk divisor <= 1024 (1536 bucket -> 768)
        ch -= 128
    if ch <= 0:  # no 128-step divisor (conv_pos_supported gates this; belt+braces)
        raise ValueError(f"conv_pos fused kernel: no row-chunk divisor for n={n}")
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, groups // 2, n // ch),
            in_specs=[
                pl.BlockSpec((1, n + 2 * PAD, dp), lambda bi, gi, ci, *_: (bi, 0, gi)),
                pl.BlockSpec((KSIZE, dg, dp), lambda bi, gi, ci, *_: (0, 0, gi)),
                pl.BlockSpec((1, dp), lambda bi, gi, ci, *_: (0, gi)),
                pl.BlockSpec((KSIZE, dg, dp), lambda bi, gi, ci, *_: (0, 0, gi)),
                pl.BlockSpec((1, dp), lambda bi, gi, ci, *_: (0, gi)),
            ],
            out_specs=pl.BlockSpec((1, ch, dp), lambda bi, gi, ci, *_: (bi, ci, gi)),
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, d), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
    )(lens, xp, w1, b1.reshape(1, d), w2, b2.reshape(1, d))


def _xla_ref(p, x, mask, groups):
    """The plain composition (models/layers.py conv_pos_embed) — used for the
    backward linearization and as the CPU fallback."""
    from f5_tts_tpu.models import layers as L

    return L.conv_pos_embed_xla(p, x, mask=mask, groups=groups)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused_diff(p, x, lens, groups):
    return _conv_pos_fused(
        x, p["conv1"]["kernel"], p["conv1"]["bias"],
        p["conv2"]["kernel"], p["conv2"]["bias"], lens, groups)


def _fused_diff_fwd(p, x, lens, groups):
    return _fused_diff(p, x, lens, groups), (p, x, lens)


def _fused_diff_bwd(groups, res, g):
    p, x, lens = res
    n = x.shape[1]
    mask = jnp.arange(n)[None, :] < lens[:, None]
    _, vjp = jax.vjp(lambda p_, x_: _xla_ref(p_, x_, mask, groups), p, x)
    dp, dx = vjp(g)
    return dp, dx, jnp.zeros(lens.shape, dtype=jax.dtypes.float0)


_fused_diff.defvjp(_fused_diff_fwd, _fused_diff_bwd)


def conv_pos_supported(x, groups: int) -> bool:
    """Fused kernel gate: TPU, lane-multiple group width (dim 1024 / 16
    groups -> 64; the 768-dim Small configs fall back to XLA convs).
    Also requires a row-chunk divisor for the sequence length: n <= 1024
    or n a multiple of 128 (the kernel chunks rows by the largest divisor
    <= 1024 in steps of 128 — a 1100-frame custom bucket has none)."""
    if jax.default_backend() == "cpu":
        return False
    d = x.shape[-1]
    n = x.shape[1]
    if n > 1024 and n % 128 != 0:
        return False
    return groups % 2 == 0 and d % groups == 0 and (d // groups) % 64 == 0


def conv_pos_fused(p, x, mask=None, groups: int = 16):
    """Drop-in for models/layers.py conv_pos_embed on TPU."""
    b, n, _ = x.shape
    lens = (jnp.full((b,), n, jnp.int32) if mask is None
            else jnp.sum(mask, axis=-1).astype(jnp.int32))
    return _fused_diff(p, x, lens, groups)
