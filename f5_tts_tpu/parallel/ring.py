"""Ring attention: sequence-parallel attention over the ``seq`` mesh axis.

Upgrade path over ``parallel/sequence.py``'s GSPMD-SDPA formulation: instead
of letting GSPMD all-gather the full key/value tensors around the [n, n]
contraction, each device keeps its frame shard resident, computes block
attention against the KV chunk it currently holds, and rotates the KV shards
around the ring with ``jax.lax.ppermute`` — sp steps, each overlapping the
next chunk's transfer with the current block's compute.  Peak attention
memory and QK/PV FLOPs per chip drop by sp^2 / sp respectively, and the
all-gather's O(n) resident KV never materializes.

Composition: ``jax.shard_map`` is manual ONLY over ``seq`` (``axis_names``
subset, same pattern as parallel/pipeline.py), so data/model axes stay under
GSPMD auto-partitioning and dp x sp x tp compose.  pp x sp: a nested ring
shard_map cannot re-bind axes inside the GPipe ``pipe`` region (Shardy
rejects an inner manual region over axes the parent already bound), so the
pipeline instead widens its own region to a FLAT manual over {pipe, seq}
(parallel/pipeline.py ``seq_shard=True``) and calls the per-shard ring body
directly via ``make_ring_attention_local`` — no inner shard_map, KV chunks
still rotate with ppermute over ``seq`` inside every microbatch tick.

Masking is the reference's key-side prefix padding mask
(src/f5_tts/model/modules.py:513-518): global column c of batch row i is
valid iff c < lens[i]; within a ring chunk at global offset o this is again a
prefix mask of length clip(lens - o, 0, chunk), which is what lets the
single-prefix Pallas flash kernel (ops/flash_attention.py) serve as the
block primitive unchanged.

Two block implementations, BOTH differentiable (autodiff through ppermute
transposes the ring; the merge arithmetic is plain jnp):
- ``xla``: einsum block scores + online-softmax merge in fp32.  Works on any
  platform (CPU tests, small shards).
- ``flash``: the Pallas flash forward-with-stats as the block primitive,
  merged in log space; gradients via the per-block custom VJP
  (ops/flash_attention.flash_attention_with_stats — the logsumexp cotangent
  folds into the backward's jacobian-correction term).  TPU serving AND
  training path.

Sharding-design reference: jax-ml.github.io/scaling-book, context
parallelism (ring attention with collective-permute).  The reference has no
counterpart (its TRT ``cp_size`` flag is dead plumbing, SURVEY.md §2.7).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from f5_tts_tpu.parallel.mesh import SEQ_AXIS

NEG_BIG = -1e30


def _block_scores_merge(q, k_cur, v_cur, lens, offset, scale, m, l, acc):
    """One ring step of the xla block impl: masked block scores + online merge.

    q [b,h,nl,d]; k_cur/v_cur [b,h,nc,d]; lens [b]; offset: traced scalar
    global column offset of the held chunk.  Carries (m, l, acc) in fp32.
    """
    nc = k_cur.shape[2]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k_cur).astype(jnp.float32) * scale
    col = offset + jnp.arange(nc)
    valid = col[None, :] < lens[:, None]  # [b, nc]
    s = jnp.where(valid[:, None, None, :], s, NEG_BIG)
    m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m - m_new)
    l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc = acc * alpha + jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(v_cur.dtype), v_cur
    ).astype(jnp.float32)
    return m_new, l, acc


def _block_flash_merge(q, k_cur, v_cur, lens, offset, m, l, acc):
    """One ring step using the Pallas flash forward-with-stats as the block
    primitive; merges normalized block outputs in log space.  Differentiable:
    flash_attention_with_stats carries a custom VJP over (out, logsumexp), so
    sequence-parallel TRAINING runs on the Pallas kernels too."""
    from f5_tts_tpu.ops import flash_attention as fa

    b, h, nl, d = q.shape
    nc = k_cur.shape[2]
    lens_local = jnp.clip(lens - offset, 0, nc).astype(jnp.int32)
    # block sizes resolve via _pick_block inside, not min(): a non-dividing
    # block would silently drop trailing rows in the kernel's floor-division
    # grid (e.g. local shard 384 from bucket 768 at sp=2 needs block 128)
    out_b, L_b = fa.flash_attention_with_stats(q, k_cur, v_cur, lens_local)
    lse = L_b.reshape(b, h, nl)[..., None]  # [b,h,nl,1]
    m_new = jnp.maximum(m, lse)
    w_old = jnp.exp(m - m_new)
    w_b = jnp.exp(lse - m_new)
    l = l * w_old + w_b
    acc = acc * w_old + out_b.astype(jnp.float32) * w_b
    return m_new, l, acc


def _ring_local(q, k, v, lens, *, axis_name: str, block_impl: str):
    """Per-shard ring attention body (runs inside shard_map, manual over
    ``axis_name``).  q/k/v are the LOCAL frame shards [b, h, nl, d]; lens are
    the replicated global valid lengths [b]."""
    sp = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)
    b, h, nl, d = q.shape
    scale = d**-0.5
    m = jnp.full((b, h, nl, 1), NEG_BIG, jnp.float32)
    l = jnp.zeros((b, h, nl, 1), jnp.float32)
    acc = jnp.zeros((b, h, nl, d), jnp.float32)
    perm = [(i, (i + 1) % sp) for i in range(sp)]
    k_cur, v_cur = k, v
    for step in range(sp):
        # after `step` rotations device `my` holds the chunk that started on
        # device (my - step) % sp, i.e. global columns [owner*nl, owner*nl+nl)
        owner = (my - step) % sp
        offset = owner * nl
        if step + 1 < sp:
            # issue the rotation before the block compute so XLA's scheduler
            # overlaps the ICI transfer with the matmuls
            k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
            v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        if block_impl == "flash":
            m, l, acc = _block_flash_merge(q, k_cur, v_cur, lens, offset, m, l, acc)
        else:
            m, l, acc = _block_scores_merge(q, k_cur, v_cur, lens, offset, scale, m, l, acc)
        if step + 1 < sp:
            k_cur, v_cur = k_nxt, v_nxt
    return (acc / jnp.maximum(l, 1e-30)).astype(q.dtype)


def ring_supported_flash(n_local: int, dh: int) -> bool:
    """Shape/platform gate for the flash block primitive on local shards."""
    return jax.default_backend() != "cpu" and n_local >= 256 and n_local % 256 == 0 and dh % 64 == 0


def make_ring_attention_local(block_impl: str = "auto"):
    """Attention-backend callable for use INSIDE a shard_map region that is
    already manual over ``seq`` (the flat {pipe, seq} GPipe region,
    parallel/pipeline.py gpipe_block_scan(seq_shard=True)).

    Unlike ``make_ring_attention`` this opens NO shard_map of its own — the
    caller's region bound the axis, so the per-shard ring body runs directly.
    q/k/v/mask are the LOCAL frame shards [b, h, n_local, d] / [b, n_local];
    the global valid lengths come from a psum of the per-shard mask counts
    (the padding mask is a global prefix mask — modules.py:513-518 — so
    contiguous-shard counts sum exactly to the global length).
    """

    def backend(q, k, v, mask):
        b, h, nl, dh = q.shape
        impl = block_impl
        if impl == "auto":
            impl = "flash" if ring_supported_flash(nl, dh) else "xla"
        lens_local = (
            jnp.full((b,), nl, jnp.int32)
            if mask is None
            else jnp.sum(mask, axis=-1).astype(jnp.int32)
        )
        lens = jax.lax.psum(lens_local, SEQ_AXIS)
        return _ring_local(q, k, v, lens, axis_name=SEQ_AXIS, block_impl=impl)

    return backend


def make_ring_attention(mesh: Mesh, block_impl: str = "xla"):
    """Build an ``attention``-backend callable (ops/attention.py accepts a
    callable backend) that runs ring attention over ``mesh``'s ``seq`` axis.

    block_impl: "xla" (any platform; CPU tests), "flash" (Pallas block
    primitive with custom-VJP gradients; TPU serving + training), or "auto"
    (flash when the local shard shapes allow and the platform is not CPU).
    """
    assert SEQ_AXIS in mesh.axis_names, f"mesh {mesh.axis_names} has no '{SEQ_AXIS}' axis"
    sp = mesh.shape[SEQ_AXIS]
    spec_qkv = P(None, None, SEQ_AXIS, None)

    def ring_backend(q, k, v, mask):
        b, h, n, dh = q.shape
        assert n % sp == 0, f"frames {n} not divisible by seq axis {sp}"
        impl = block_impl
        if impl == "auto":
            impl = "flash" if ring_supported_flash(n // sp, dh) else "xla"
        lens = (
            jnp.full((b,), n, jnp.int32)
            if mask is None
            else jnp.sum(mask, axis=-1).astype(jnp.int32)
        )
        # under a jax.set_mesh context the shard_map must use the context's
        # ABSTRACT mesh — a concrete Mesh is rejected there.  Standalone
        # calls keep the concrete mesh.  NOTE this does NOT make the ring
        # nest inside another manual region (Shardy: re-binding a
        # parent-bound axis is illegal) — for pp x sp use
        # make_ring_attention_local inside the flat {pipe, seq} GPipe region.
        cur = jax.sharding.get_abstract_mesh()
        use_mesh = cur if SEQ_AXIS in getattr(cur, "axis_names", ()) else mesh
        fn = jax.shard_map(
            functools.partial(_ring_local, axis_name=SEQ_AXIS, block_impl=impl),
            mesh=use_mesh,
            in_specs=(spec_qkv, spec_qkv, spec_qkv, P()),
            out_specs=spec_qkv,
            axis_names=frozenset({SEQ_AXIS}),
        )
        return fn(q, k, v, lens)

    return ring_backend
