"""Pipeline parallelism over the scanned DiT block stack.

The reference stubs pipeline parallelism entirely (its TRT-LLM
``convert_checkpoint.py:274`` asserts ``pp_size == 1``); this module provides
a real implementation, built the TPU way: the transformer blocks are already
a depth-stacked pytree consumed by ``lax.scan`` (models/dit.py:152-161), so a
``pipe`` mesh axis shards the *depth* dimension and a GPipe-style microbatch
schedule streams activations between stages with ``lax.ppermute`` over ICI.

Key properties:
- ``jax.shard_map`` is manual ONLY over the ``pipe`` axis (``axis_names``
  subset) — ``data``/``model`` axes stay under GSPMD auto-partitioning, so
  dp x pp x tp compose: batch stays sharded on ``data``, block weights stay
  Megatron-split on ``model``, and depth shards on ``pipe``.
- the schedule is expressed as a ``lax.scan`` over M + pp - 1 ticks; autodiff
  through ``ppermute`` (its transpose is the inverse permutation) yields the
  backward pipeline for free — training needs no hand-written 1F1B.
- bubble fraction is (pp-1)/(M+pp-1); pick n_micro >= 4*pp for ~<20% bubble.

Sharding-design reference: jax-ml.github.io/scaling-book (pipelining chapter
pattern: shift-register over stages with collective-permute).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from f5_tts_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, PIPE_AXIS  # noqa: F401


def make_pp_mesh(data: int = 1, pipe: int = 2, model: int = 1, devices=None) -> Mesh:
    """3-axis mesh [data, pipe, model].

    ``pipe`` is placed between ``data`` and ``model`` so that, on a physical
    torus, tensor-parallel collectives (highest bandwidth demand) ride the
    innermost (fastest-wrapping) axis and pipeline ppermutes (lowest demand,
    point-to-point) sit outside them.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    assert data * pipe * model <= n, f"mesh {data}x{pipe}x{model} exceeds {n} devices"
    dev = np.asarray(devices[: data * pipe * model]).reshape(data, pipe, model)
    return Mesh(dev, (DATA_AXIS, PIPE_AXIS, MODEL_AXIS))


def pp_param_specs(specs, depth: int, pp: int):
    """Compose pipeline sharding into existing DiT param specs.

    Stacked block leaves carry depth as their leading axis; `dit_param_specs`
    leaves that axis unsharded (P(None, ...)). Replace the leading None with
    PIPE_AXIS so each stage holds depth/pp consecutive blocks. Non-block
    leaves (embeddings, final norm/proj) stay as-is: they are small and run
    outside the pipelined region on every stage.
    """
    assert depth % pp == 0, f"depth {depth} not divisible by pp {pp}"

    def fix(kp, s):
        path = jax.tree_util.keystr(kp)
        # the depth-stacked transformer blocks only — NOT text_embed's
        # ConvNeXt list, whose path also contains 'blocks'
        if "'blocks'" in path and "'text_embed'" not in path:
            rest = tuple(s)[1:] if len(tuple(s)) >= 1 else ()
            return P(PIPE_AXIS, *rest)
        return s

    return jax.tree_util.tree_map_with_path(fix, specs)


def gpipe_block_scan(
    block_fn,
    stacked_blocks,
    h: jax.Array,  # [b, n, dim]
    t_emb: jax.Array,  # [b, dim_t]
    mask: jax.Array | None,  # [b, n] bool
    rope: jax.Array | None = None,  # [n, dim_head] rotary angle table
    *,
    mesh: Mesh,
    n_micro: int,
    checkpoint: bool = False,
    policy=None,  # jax.checkpoint policy (models/dit.py remat_policy)
    seq_shard: bool = False,  # widen the manual region to {pipe, seq}: the
    # frame axis of h/mask/rope shards over ``seq`` so a per-shard ring
    # attention body (parallel/ring.py make_ring_attention_local) can rotate
    # KV inside every microbatch tick — pp x sp without a nested shard_map
):
    """Run ``depth`` stacked blocks over ``h`` with the depth axis sharded on
    the mesh's ``pipe`` axis.

    ``block_fn(block_params, h_mb, t_emb_mb, mask_mb, rope) -> h_mb`` applies
    ONE block to one microbatch. Equivalent to
    ``lax.scan(block_fn, h, stacked_blocks)`` (models/dit.py:161) up to
    float reassociation; parity-tested in tests/test_pipeline_parallel.py.
    """
    from f5_tts_tpu.parallel.mesh import SEQ_AXIS

    pp = mesh.shape[PIPE_AXIS]
    if pp == 1:
        def f(carry, bp):
            return block_fn(bp, carry, t_emb, mask, rope), None
        if checkpoint:
            f = jax.checkpoint(f, policy=policy)
        out, _ = jax.lax.scan(f, h, stacked_blocks)
        return out

    b, n, dim = h.shape
    M = n_micro
    assert b % M == 0, f"batch {b} not divisible by n_micro {M}"
    mb = b // M
    xm = h.reshape(M, mb, n, dim)
    tem = t_emb.reshape(M, mb, *t_emb.shape[1:])
    if mask is None:
        mask = jnp.ones((b, n), bool)
    maskm = mask.reshape(M, mb, n)
    if rope is None:
        rope = jnp.zeros((n, 0), h.dtype)

    def stage_fn(blocks_local, xm, tem, maskm, rope_local):
        s = jax.lax.axis_index(PIPE_AXIS)

        def run_stage(h_in, te, mk):
            def f(carry, bp):
                return block_fn(bp, carry, te, mk, rope_local), None
            g = jax.checkpoint(f, policy=policy) if checkpoint else f
            out, _ = jax.lax.scan(g, h_in, blocks_local)
            return out

        def tick(carry, t):
            h_prev, acc = carry
            # shift-register: stage s-1's last output arrives at stage s
            h_recv = jax.lax.ppermute(
                h_prev, PIPE_AXIS, [(i, i + 1) for i in range(pp - 1)]
            )
            # stage s processes microbatch (t - s) at tick t
            m = jnp.clip(t - s, 0, M - 1)
            h_in = jnp.where(s == 0, xm[jnp.clip(t, 0, M - 1)], h_recv)
            h_out = run_stage(h_in, tem[m], maskm[m])
            # microbatch (t - pp + 1) leaves the last stage at tick t
            mf = t - (pp - 1)
            mfc = jnp.clip(mf, 0, M - 1)
            write = (s == pp - 1) & (mf >= 0)
            acc = acc.at[mfc].set(jnp.where(write, h_out, acc[mfc]))
            return (h_out, acc), None

        # initial carry is device-varying over pipe (each stage's shift register)
        acc0 = jax.lax.pcast(jnp.zeros_like(xm), (PIPE_AXIS,), to="varying")
        h0 = jax.lax.pcast(jnp.zeros_like(xm[0]), (PIPE_AXIS,), to="varying")
        (_, acc), _ = jax.lax.scan(tick, (h0, acc0), jnp.arange(M + pp - 1))
        # results live on the last stage only; replicate across stages
        acc = jax.lax.psum(jnp.where(s == pp - 1, acc, jnp.zeros_like(acc)), PIPE_AXIS)
        return acc

    if seq_shard:
        sp = mesh.shape[SEQ_AXIS]
        assert n % sp == 0, f"frames {n} not divisible by seq axis {sp}"
        axis_names = frozenset({PIPE_AXIS, SEQ_AXIS})
        # frame axes shard over seq; each stage/shard holds its contiguous
        # frame chunk (global offset = shard index * n/sp, which is what the
        # ring body's owner-offset arithmetic assumes) and its rope rows
        in_specs = (P(PIPE_AXIS), P(None, None, SEQ_AXIS, None), P(),
                    P(None, None, SEQ_AXIS), P(SEQ_AXIS))
        out_specs = P(None, None, SEQ_AXIS, None)
    else:
        axis_names = frozenset({PIPE_AXIS})
        in_specs = (P(PIPE_AXIS), P(), P(), P(), P())
        out_specs = P()

    out = jax.shard_map(
        stage_fn,
        mesh=mesh,
        in_specs=in_specs,
        out_specs=out_specs,
        axis_names=axis_names,
    )(stacked_blocks, xm, tem, maskm, rope)
    return out.reshape(b, n, dim)


def make_dit_block_scan(cfg, mesh: Mesh, n_micro: int, backend: str = "auto",
                        ring_sequence: str | None = None):
    """Build the ``block_scan`` hook for ``dit.forward`` (models/dit.py):
    pipelines the DiT block stack over the mesh's ``pipe`` axis.

    ``ring_sequence``: ring-attention block impl ("auto"/"xla"/"flash") to
    run INSIDE the pipeline region when the mesh also has a ``seq`` axis —
    the manual region widens to {pipe, seq} and KV chunks rotate over ICI
    per microbatch tick (pp x sp without GSPMD's full-KV all-gather).  Falls
    back to ``backend`` under GSPMD sequence sharding when the frame count
    does not divide over ``seq``.
    """
    from f5_tts_tpu.models import layers as L
    from f5_tts_tpu.parallel.mesh import SEQ_AXIS
    from f5_tts_tpu.parallel.ring import make_ring_attention_local

    sp = mesh.shape[SEQ_AXIS] if SEQ_AXIS in mesh.axis_names else 1
    want_ring = bool(ring_sequence) and sp > 1 and mesh.shape[PIPE_AXIS] > 1

    def block_scan(stacked_blocks, h, t_emb, mask, rope):
        use_ring = want_ring and h.shape[1] % sp == 0
        blk_backend = (
            make_ring_attention_local(ring_sequence) if use_ring else backend
        )

        def block_fn(bp, hh, te, mk, rp):
            return L.dit_block(
                bp, hh, te, cfg.heads, mask=mk,
                rope_freqs=rp if rp is not None and rp.size else None,
                pe_attn_head=cfg.pe_attn_head, backend=blk_backend,
            )

        from f5_tts_tpu.models.dit import remat_policy

        return gpipe_block_scan(
            block_fn, stacked_blocks, h, t_emb, mask, rope,
            mesh=mesh, n_micro=n_micro, checkpoint=cfg.checkpoint_activations,
            # per-device tokens inside the pipeline body: one microbatch,
            # frame axis split over seq when ring-sharded
            policy=remat_policy(cfg, tokens=max(1, h.shape[0] // max(n_micro, 1))
                                * h.shape[1] // (sp if use_ring else 1)),
            seq_shard=use_ring,
        )

    return block_scan
