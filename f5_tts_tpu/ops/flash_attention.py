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
LOG2E = 1.4426950408889634  # log2(e): folds exp->exp2 into the q prescale


def _out_struct(x, shape, dtype=None):
    """pallas_call out_shape that carries x's varying-mesh-axes (vma) set:
    inside a manual shard_map region (parallel/ring.py rings these kernels
    over the 'seq' axis) jax requires the output vma to be declared; outside
    shard_map the set is empty and this degrades to a plain struct."""
    return jax.ShapeDtypeStruct(shape, dtype or x.dtype, vma=jax.typeof(x).vma)


def _valid_cols(lens_ref, b, col, seg):
    """Key-column validity mask. ``seg=None``: single valid prefix
    [0, lens[b]).  Static ``seg``: the two-segment MMDiT joint-attention mask
    — audio prefix [0, lens[b, 0]) plus text prefix [seg, seg + lens[b, 1])
    over the concatenated [audio, text] sequence (reference
    modules.py:563-705)."""
    if seg is None:
        return col < lens_ref[b]
    return (col < lens_ref[b, 0]) | ((col >= seg) & (col < seg + lens_ref[b, 1]))


def _kernel_fwd_stats(lens_ref, q_ref, k_ref, v_ref, o_ref, l_ref, *, scale, block_k, n_kv, heads,
                      seg=None):
    """Forward with logsumexp stats output (for the custom-vjp backward).

    Runs the same exp2-domain softmax with folded q prescale as the serving
    ``_kernel`` (two fewer [BQ, BK] VPU passes per chunk); the stored
    logsumexp converts back to NATURAL log at the end — parallel/ring.py's
    log-space merge and the backward kernels both depend on that."""
    bh = pl.program_id(0)
    b = bh // heads
    q = (q_ref[0].astype(jnp.float32) * (scale * LOG2E)).astype(jnp.bfloat16)
    bq, dh = q.shape
    m = jnp.full((bq, 1), NEG_BIG, jnp.float32)  # log2-domain running max
    l = jnp.zeros((bq, 1), jnp.float32)
    acc = jnp.zeros((bq, dh), jnp.float32)
    for j in range(n_kv // block_k):
        k = k_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.bfloat16)
        v = v_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.bfloat16)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1) + j * block_k
        s = jnp.where(_valid_cols(lens_ref, b, col, seg), s, NEG_BIG)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp2(s - m_new)
        alpha = jnp.exp2(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m = m_new
    l_safe = jnp.maximum(l, 1e-30)
    o_ref[0] = (acc / l_safe).astype(o_ref.dtype)
    # natural-log logsumexp: L = (m2 + log2(l)) / log2(e)
    l_ref[0, 0] = ((m + jnp.log2(l_safe)) * (1.0 / LOG2E))[:, 0]


def _kernel_dq(lens_ref, q_ref, k_ref, v_ref, do_ref, L_ref, D_ref, dq_ref,
               *, scale, block_k, n_kv, heads, seg=None):
    """dq_i = scale * sum_j ds_ij k_j;  ds = p * (do k v^T - D).

    p recomputes through the exp2 domain: q carries the folded prescale so
    the score dot lands in log2 space, and the natural-log L converts once
    per q block (p = exp2(s2 - L*log2e) == exp(s - L))."""
    bh = pl.program_id(0)
    b = bh // heads
    q = (q_ref[0].astype(jnp.float32) * (scale * LOG2E)).astype(jnp.bfloat16)
    do = do_ref[0].astype(jnp.bfloat16)
    L2 = L_ref[0, 0][:, None] * LOG2E  # [bq, 1] log2-domain logsumexp
    D = D_ref[0, 0][:, None]
    bq, dh = q.shape
    dq = jnp.zeros((bq, dh), jnp.float32)
    for j in range(n_kv // block_k):
        k = k_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.bfloat16)
        v = v_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.bfloat16)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1) + j * block_k
        s = jnp.where(_valid_cols(lens_ref, b, col, seg), s, NEG_BIG)
        p = jnp.exp2(s - L2)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - D)
        dq = dq + jax.lax.dot_general(ds.astype(jnp.bfloat16), k, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _kernel_dkv(lens_ref, q_ref, k_ref, v_ref, do_ref, L_ref, D_ref, dk_ref, dv_ref,
                *, scale, block_q, n_q, heads, seg=None):
    """Per key block: dv_j = sum_i p_ij^T do_i;  dk_j = scale * sum_i ds_ij^T q_i."""
    bh = pl.program_id(0)
    b = bh // heads
    k = k_ref[0].astype(jnp.bfloat16)  # [bk, dh]
    v = v_ref[0].astype(jnp.bfloat16)
    bk, dh = k.shape
    jk = pl.program_id(1)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, bk), 1) + jk * bk
    valid = _valid_cols(lens_ref, b, col, seg)
    dk = jnp.zeros((bk, dh), jnp.float32)
    dv = jnp.zeros((bk, dh), jnp.float32)
    for i in range(n_q // block_q):
        # q is needed BOTH raw (dk accumulation) and prescaled (exp2-domain
        # scores) — the [bq, dh] prescale pass is far cheaper than the two
        # [bq, bk]-wide passes the exp2 domain removes
        qf = q_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.float32)
        q = qf.astype(jnp.bfloat16)
        qs = (qf * (scale * LOG2E)).astype(jnp.bfloat16)
        do = do_ref[0, pl.ds(i * block_q, block_q), :].astype(jnp.bfloat16)
        L2 = L_ref[0, 0, pl.ds(i * block_q, block_q)][:, None] * LOG2E
        D = D_ref[0, 0, pl.ds(i * block_q, block_q)][:, None]
        s = jax.lax.dot_general(qs, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = jnp.where(valid, s, NEG_BIG)
        p = jnp.exp2(s - L2)  # [bq, bk] == exp(s_nat - L)
        dv = dv + jax.lax.dot_general(p.astype(jnp.bfloat16), do, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = (p * (dp - D)).astype(jnp.bfloat16)
        dk = dk + jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _kernel(lens_ref, q_ref, k_ref, v_ref, o_ref, *, scale, block_k, n_kv, heads):
    bh = pl.program_id(0)
    b = bh // heads
    kv_len = lens_ref[b]

    # Fold scale AND log2(e) into a one-time q prescale (fp32, before the
    # bf16 cast): the scores land directly in the exp2 domain, removing two
    # full [BQ, BK] VPU multiply passes per chunk (the *scale after the dot,
    # and the hidden *log2e inside every exp).  exp2-domain softmax is
    # exactly softmax — the base change cancels in p / l.
    q = (q_ref[0].astype(jnp.float32) * (scale * LOG2E)).astype(jnp.bfloat16)  # [BQ, dh]
    bq = q.shape[0]
    dh = q.shape[1]

    m = jnp.full((bq, 1), NEG_BIG, jnp.float32)
    l = jnp.zeros((bq, 1), jnp.float32)
    acc = jnp.zeros((bq, dh), jnp.float32)

    # static unroll with register-carried online-softmax state: measured
    # fastest at full bucket occupancy (fori_loop and @pl.when/scratch-ref
    # variants that skip masked chunks were 10-20% slower on live chunks,
    # which dominates the headline configs)
    num_chunks = n_kv // block_k
    for j in range(num_chunks):
        k = k_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.bfloat16)
        v = v_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.bfloat16)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [BQ, BK], log2-domain logits
        col = jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1) + j * block_k
        s = jnp.where(col < kv_len, s, NEG_BIG)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp2(s - m_new)
        alpha = jnp.exp2(m - m_new)
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
        out_shape=_out_struct(qf, (b * h, n, dh)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(lens, qf, kf, vf)
    return out.reshape(b, h, n, dh)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "seg"))
def _flash_fwd_stats(q, k, v, lens, block_q: int, block_k: int, seg=None):
    b, h, n, dh = q.shape
    scale = dh**-0.5
    qf, kf, vf = (x.reshape(b * h, n, dh) for x in (q, k, v))
    kernel = functools.partial(_kernel_fwd_stats, scale=scale, block_k=block_k, n_kv=n, heads=h,
                               seg=seg)
    out, L = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b * h, n // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, dh), lambda bh, iq, *_: (bh, iq, 0)),
                pl.BlockSpec((1, n, dh), lambda bh, iq, *_: (bh, 0, 0)),
                pl.BlockSpec((1, n, dh), lambda bh, iq, *_: (bh, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, block_q, dh), lambda bh, iq, *_: (bh, iq, 0)),
                pl.BlockSpec((1, 1, block_q), lambda bh, iq, *_: (bh, 0, iq)),
            ],
        ),
        out_shape=[
            _out_struct(qf, (b * h, n, dh)),
            _out_struct(qf, (b * h, 1, n), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "arbitrary")),
    )(lens, qf, kf, vf)
    return out.reshape(b, h, n, dh), L


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "seg"))
def _flash_bwd(q, k, v, do, L, D, lens, block_q: int, block_k: int, seg=None):
    b, h, n, dh = q.shape
    scale = dh**-0.5
    qf, kf, vf, dof = (x.reshape(b * h, n, dh) for x in (q, k, v, do))
    dq = pl.pallas_call(
        functools.partial(_kernel_dq, scale=scale, block_k=block_k, n_kv=n, heads=h, seg=seg),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b * h, n // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, dh), lambda bh, iq, *_: (bh, iq, 0)),
                pl.BlockSpec((1, n, dh), lambda bh, iq, *_: (bh, 0, 0)),
                pl.BlockSpec((1, n, dh), lambda bh, iq, *_: (bh, 0, 0)),
                pl.BlockSpec((1, block_q, dh), lambda bh, iq, *_: (bh, iq, 0)),
                pl.BlockSpec((1, 1, block_q), lambda bh, iq, *_: (bh, 0, iq)),
                pl.BlockSpec((1, 1, block_q), lambda bh, iq, *_: (bh, 0, iq)),
            ],
            out_specs=pl.BlockSpec((1, block_q, dh), lambda bh, iq, *_: (bh, iq, 0)),
        ),
        out_shape=_out_struct(qf, (b * h, n, dh)),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "arbitrary")),
    )(lens, qf, kf, vf, dof, L, D)
    dk, dv = pl.pallas_call(
        functools.partial(_kernel_dkv, scale=scale, block_q=block_q, n_q=n, heads=h, seg=seg),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b * h, n // block_k),
            in_specs=[
                pl.BlockSpec((1, n, dh), lambda bh, jk, *_: (bh, 0, 0)),
                pl.BlockSpec((1, block_k, dh), lambda bh, jk, *_: (bh, jk, 0)),
                pl.BlockSpec((1, block_k, dh), lambda bh, jk, *_: (bh, jk, 0)),
                pl.BlockSpec((1, n, dh), lambda bh, jk, *_: (bh, 0, 0)),
                pl.BlockSpec((1, 1, n), lambda bh, jk, *_: (bh, 0, 0)),
                pl.BlockSpec((1, 1, n), lambda bh, jk, *_: (bh, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, block_k, dh), lambda bh, jk, *_: (bh, jk, 0)),
                pl.BlockSpec((1, block_k, dh), lambda bh, jk, *_: (bh, jk, 0)),
            ],
        ),
        out_shape=[
            _out_struct(qf, (b * h, n, dh)),
            _out_struct(qf, (b * h, n, dh)),
        ],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "arbitrary")),
    )(lens, qf, kf, vf, dof, L, D)
    return dq.reshape(b, h, n, dh), dk.reshape(b, h, n, dh), dv.reshape(b, h, n, dh)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash_diff(q, k, v, lens, block_q, block_k, seg):
    if seg is None:
        return _flash(q, k, v, lens, block_q, block_k)
    return _flash_seg(q, k, v, lens, seg, block_q, block_k)


def _tag_for_remat(out, L):
    """Name the forward kernel's outputs for ``jax.checkpoint`` policies.

    Under ``remat_policy="flash"`` (models/dit.py) these become the ONLY saved
    per-block residuals, so the backward-pass recompute skips this Pallas
    forward entirely: the backward kernel needs just (q, k, v, out, lse), and
    q/k/v re-derive from the block input via cheap matmuls.  Outside a
    ``jax.checkpoint`` region the tags are identity ops."""
    from jax.ad_checkpoint import checkpoint_name

    return checkpoint_name(out, "flash_out"), checkpoint_name(L, "flash_lse")


def _flash_diff_fwd(q, k, v, lens, block_q, block_k, seg):
    out, L = _flash_fwd_stats(q, k, v, lens, block_q, block_k, seg)
    out, L = _tag_for_remat(out, L)
    return out, (q, k, v, lens, out, L)


def _flash_diff_bwd(block_q, block_k, seg, res, do):
    q, k, v, lens, out, L = res
    b, h, n, dh = q.shape
    # D_i = rowsum(do_i * o_i) — the softmax-jacobian correction term
    D = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1).reshape(b * h, 1, n)
    dq, dk, dv = _flash_bwd(q, k, v, do, L, D, lens, block_q, block_k, seg)
    return dq, dk, dv, jnp.zeros(lens.shape, dtype=jax.dtypes.float0)


_flash_diff.defvjp(_flash_diff_fwd, _flash_diff_bwd)


# --------------------------------------- differentiable forward-with-stats
# The ring-attention block primitive (parallel/ring.py) needs BOTH the
# normalized block output and its logsumexp, and needs gradients to flow
# through both (the ring's online merge weights blocks by exp(lse - m)).
# The logsumexp cotangent folds into the standard flash backward:
#     dL_i/ds_ij = softmax_j(s)_ij = p_ij
# so  ds_ij = p_ij * (dp_ij - D_i + dL_i)  —  i.e. the usual backward with
# the jacobian correction shifted to D' = D - dL.  _flash_bwd is reused
# unchanged.


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash_stats_diff(q, k, v, lens, block_q, block_k):
    return _flash_fwd_stats(q, k, v, lens, block_q, block_k)


def _flash_stats_diff_fwd(q, k, v, lens, block_q, block_k):
    out, L = _flash_fwd_stats(q, k, v, lens, block_q, block_k)
    out, L = _tag_for_remat(out, L)
    return (out, L), (q, k, v, lens, out, L)


def _flash_stats_diff_bwd(block_q, block_k, res, cot):
    do, dL = cot
    q, k, v, lens, out, L = res
    b, h, n, dh = q.shape
    do = do.astype(q.dtype)
    D = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32), axis=-1).reshape(b * h, 1, n)
    D = D - dL.astype(jnp.float32).reshape(b * h, 1, n)
    dq, dk, dv = _flash_bwd(q, k, v, do, L, D, lens, block_q, block_k)
    return dq, dk, dv, jnp.zeros(lens.shape, dtype=jax.dtypes.float0)


_flash_stats_diff.defvjp(_flash_stats_diff_fwd, _flash_stats_diff_bwd)


def flash_attention_with_stats(q, k, v, lens, block_q: int = 256, block_k: int = 512):
    """Differentiable flash attention returning ``(out, logsumexp)``.

    ``lens`` is the per-row valid key-prefix length [b] (0 allowed — a fully
    masked row yields out=0, lse=NEG_BIG-ish, and zero gradients).  The
    logsumexp is NATURAL-log (parallel/ring.py's merge depends on this).
    """
    n, nk = q.shape[2], k.shape[2]
    if n != nk:  # the stats kernels tile k/v with q's n (ring shards are equal)
        raise ValueError(f"flash_attention_with_stats needs len(q)==len(k), got {n} vs {nk}")
    return _flash_stats_diff(q, k, v, lens, _pick_block(n, block_q), _pick_block(nk, block_k))


def _pick_block(n: int, preferred: int) -> int:
    """Largest block size <= preferred that divides n (halving from preferred).

    The kernels iterate ``range(n // block)`` with no remainder handling, so a
    non-dividing block would silently drop trailing keys/queries (e.g. the 768
    serving bucket with the old fixed block_k=512 never attended keys 512:768).
    """
    blk = min(preferred, n)
    while blk > 1 and n % blk:
        blk //= 2
    if n % blk:
        raise ValueError(f"sequence length {n} has no power-of-two block divisor <= {preferred}")
    if blk < 8 and n > 8:
        # e.g. n=1324 -> blk=4: Mosaic rejects (or crawls through) sub-sublane
        # blocks; a FORCED backend bypasses flash_supported's shape gate, so
        # fail loudly instead (auto dispatch falls back to SDPA before this)
        raise ValueError(
            f"sequence length {n} factors to flash block {blk} (<8); "
            "use a 128-multiple bucket or backend='sdpa'"
        )
    return blk


def flash_attention_trainable(q, k, v, mask=None,
                              block_q: int | None = None, block_k: int | None = None):
    """Differentiable flash attention (custom VJP with Pallas fwd+bwd kernels).
    Padding-query rows must receive zero upstream gradient — guaranteed when
    the caller re-masks the attention output (models/layers.py mha does).

    Default blocks are shape-aware (round-5 v5e sweep via bench_train,
    F5TTS_v1_Base 8x1024 dots_flash): whole-row 1024/1024 beats the old
    512/512 by 4.3% end-to-end train step (40.46k -> 42.20k frames/s;
    1024/512 = 41.07k) — same bigger-block/fewer-program-switch win the
    serving kernel got in round 2.  At n > 1024 the kernels' UNROLLED inner
    loops do not share VMEM stack (16x2048 with 1024 blocks: Mosaic scoped
    vmem OOM, 17.86M > 16M), so larger buckets keep 512/512."""
    b, h, n, dh = q.shape
    if block_q is None:
        block_q = 1024 if n <= 1024 else 512
    if block_k is None:
        block_k = 1024 if n <= 1024 else 512
    lens = jnp.full((b,), n, jnp.int32) if mask is None else jnp.sum(mask, axis=-1).astype(jnp.int32)
    return _flash_diff(q, k, v, lens, _pick_block(n, block_q), _pick_block(n, block_k), None)


def flash_attention_two_segment_trainable(q, k, v, lens_a, lens_t, seg: int,
                                          block_q: int = 512, block_k: int = 512):
    """Differentiable two-segment flash attention (MMDiT joint-attention
    training path; custom VJP with Pallas fwd+bwd kernels sharing the
    single-prefix machinery via the static ``seg`` mask mode).  Padding-query
    rows must get zero upstream gradient — models/mmdit.py re-masks xo/co."""
    b, h, n, dh = q.shape
    lens2 = jnp.stack([lens_a.astype(jnp.int32), lens_t.astype(jnp.int32)], axis=1)
    return _flash_diff(q, k, v, lens2, _pick_block(n, block_q), _pick_block(n, block_k), seg)


# --------------------------------------------------------- two-segment mask
# MMDiT joint attention runs over the concatenated [audio, text] sequence
# (reference modules.py:563-705): validity is TWO prefixes — audio cols
# [0, len_a) and text cols [seg, seg + len_t).  Same online-softmax kernel,
# two-part column mask.


def _kernel_seg(lens_ref, q_ref, k_ref, v_ref, o_ref, *, scale, block_k, n_kv, heads, seg):
    bh = pl.program_id(0)
    b = bh // heads
    len_a = lens_ref[b, 0]
    len_t = lens_ref[b, 1]
    # same exp2-domain prescale trick as _kernel
    q = (q_ref[0].astype(jnp.float32) * (scale * LOG2E)).astype(jnp.bfloat16)
    bq, dh = q.shape
    m = jnp.full((bq, 1), NEG_BIG, jnp.float32)
    l = jnp.zeros((bq, 1), jnp.float32)
    acc = jnp.zeros((bq, dh), jnp.float32)
    for j in range(n_kv // block_k):
        k = k_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.bfloat16)
        v = v_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.bfloat16)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1) + j * block_k
        valid = (col < len_a) | ((col >= seg) & (col < seg + len_t))
        s = jnp.where(valid, s, NEG_BIG)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp2(s - m_new)
        alpha = jnp.exp2(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(jnp.bfloat16), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        m = m_new
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("seg", "block_q", "block_k"))
def _flash_seg(q, k, v, lens2, seg: int, block_q: int, block_k: int):
    b, h, n, dh = q.shape
    scale = dh**-0.5
    qf, kf, vf = (x.reshape(b * h, n, dh) for x in (q, k, v))
    kernel = functools.partial(_kernel_seg, scale=scale, block_k=block_k,
                               n_kv=n, heads=h, seg=seg)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b * h, n // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, dh), lambda bh, iq, *_: (bh, iq, 0)),
                pl.BlockSpec((1, n, dh), lambda bh, iq, *_: (bh, 0, 0)),
                pl.BlockSpec((1, n, dh), lambda bh, iq, *_: (bh, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, dh), lambda bh, iq, *_: (bh, iq, 0)),
        ),
        out_shape=_out_struct(qf, (b * h, n, dh)),
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel", "arbitrary")),
    )(lens2, qf, kf, vf)
    return out.reshape(b, h, n, dh)


def flash_attention_two_segment(q, k, v, lens_a, lens_t, seg: int,
                                block_q: int = 256, block_k: int = 512):
    """Flash attention with a two-prefix key mask: cols [0, lens_a[i]) and
    [seg, seg + lens_t[i]) are valid for batch row i.  The MMDiT joint-
    attention counterpart of ``flash_attention``'s single prefix."""
    b, h, n, dh = q.shape
    lens2 = jnp.stack([lens_a.astype(jnp.int32), lens_t.astype(jnp.int32)], axis=1)
    return _flash_seg(q, k, v, lens2, seg, _pick_block(n, block_q), _pick_block(n, block_k))


def flash_seg_supported(q) -> bool:
    if jax.default_backend() == "cpu":
        return False
    b, h, n, dh = q.shape
    return n >= 256 and n % 128 == 0 and dh % 64 == 0


def flash_supported(q) -> bool:
    """Shape/platform gate for the ``auto`` backend."""
    if jax.default_backend() == "cpu":
        return False
    b, h, n, dh = q.shape
    return n >= 256 and n % 256 == 0 and dh % 64 == 0


def flash_attention(q, k, v, mask=None, block_q: int = 1024, block_k: int = 512):
    """Drop-in for ops.attention.sdpa.  ``mask`` must be a prefix (length)
    mask [b, n]; converted to per-sample lengths for the kernel.

    Default blocks 1024/512: v5e sweep at n=1024 measured 118.6 us (1024/512)
    vs 123.9 (512/512) vs 132.0 (256/512) — bigger q blocks amortize program
    switches; whole-row programs win (scripts/bench_step_breakdown.py attn).
    _pick_block shrinks them for shorter/non-dividing buckets."""
    b, h, n, dh = q.shape
    if mask is None:
        lens = jnp.full((b,), n, jnp.int32)
    else:
        lens = jnp.sum(mask, axis=-1).astype(jnp.int32)
    return _flash(q, k, v, lens, _pick_block(n, block_q), _pick_block(n, block_k))
