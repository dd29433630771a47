"""Conditional flow matching: training loss + zero-shot infilling sampler.

Functional rebuild of reference src/f5_tts/model/cfm.py:34-302.  The TPU-first
difference vs the reference/TRT runtime: the ENTIRE NFE Euler loop — fused-CFG
2B forward, guidance combine, Euler update — runs as one ``lax.scan`` inside a
single jitted graph (the reference pays one engine dispatch per ODE step,
runtime/triton_trtllm/f5_tts_trtllm.py:296-372).  The text encoder runs once
before the scan for both CFG streams (replacing the reference's thread-local
text-embed cache, backbones/dit.py:239-262).

Static shapes: callers pad ``cond``/``noise`` to a bucketed max length; all
dynamic lengths (``lens``, ``duration``) are masked in-graph.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from f5_tts_tpu.models.backbones import get_backbone


# Empirically Pruned Step Sampling tables (reference model/utils.py:205-218),
# expressed as fractions of 32.
_EPSS = {
    5: [0, 2, 4, 8, 16, 32],
    6: [0, 2, 4, 6, 8, 16, 32],
    7: [0, 2, 4, 6, 8, 16, 24, 32],
    10: [0, 2, 4, 6, 8, 12, 16, 20, 24, 28, 32],
    12: [0, 2, 4, 6, 8, 10, 12, 14, 16, 20, 24, 28, 32],
    16: [0, 1, 2, 3, 4, 5, 6, 7, 8, 10, 12, 14, 16, 20, 24, 28, 32],
}


def timestep_schedule(
    steps: int,
    sway_sampling_coef: float | None = -1.0,
    use_epss: bool = True,
    t_start: float = 0.0,
) -> np.ndarray:
    """Host-precomputed ODE timesteps [steps+1] incl. sway warping
    (cfm.py:211-216).  With coef=-1: t' = 1 - cos(pi*t/2)."""
    if t_start == 0.0 and use_epss and steps in _EPSS:
        t = np.asarray(_EPSS[steps], dtype=np.float64) / 32.0
    else:
        t = np.linspace(t_start, 1.0, steps + 1, dtype=np.float64)
    if sway_sampling_coef is not None:
        t = t + sway_sampling_coef * (np.cos(np.pi / 2.0 * t) - 1.0 + t)
    return t.astype(np.float32)


@dataclass(frozen=True)
class SampleOptions:
    """Inference knobs (defaults = reference utils_infer.py:52-65)."""

    steps: int = 32
    cfg_strength: float = 2.0
    sway_sampling_coef: float | None = -1.0
    use_epss: bool = True
    t_start: float = 0.0
    # "euler" | "midpoint" — fixed-step solvers matching the reference's
    # torchdiffeq odeint methods (reference cfm.py:42, 219-222); midpoint does
    # two model evals per step (explicit midpoint rule on the sway-warped grid)
    ode_method: str = "euler"
    # precompute the per-step AdaLN modulation tables outside the NFE scan
    # (models/dit.py precompute_adaln — the timestep schedule is known ahead,
    # so ~41% of DiT weights drop out of the per-step reads); euler-only,
    # DiT-only, numerically identical up to matmul reassociation
    precompute_adaln: bool = True
    # time-parallel (Picard / parallel-in-time) ODE integration: solve a
    # sliding window of W Euler steps as one batched fixed-point iteration
    # instead of W sequential model calls.  The W per-step states ride the
    # BATCH axis of a single forward (W*b rows), so on a device mesh the ODE's
    # time dimension data-parallelizes over chips — a latency axis that
    # sequential NFE scanning cannot use (the reference has no counterpart;
    # the sweep recurrence is Shih et al. 2023 "Parallel Sampling of
    # Diffusion Models" adapted to the CFM Euler grid).  0 = sequential scan.
    time_parallel_window: int = 0
    # sweep convergence tolerance: a window entry is frozen when its masked
    # RMS change between sweeps falls below this (mel-log units).  The leading
    # entry of each sweep is the exact Euler successor of a frozen state, so
    # the iteration always terminates in <= steps sweeps; tol only controls
    # how much of the tail is accepted early.
    picard_tol: float = 1e-3


def lens_to_mask(lens: jax.Array, length: int) -> jax.Array:
    return jnp.arange(length)[None, :] < lens[:, None]


def _picard_integrate(velocity_rows, y0, ts, W: int, tol: float, mask,
                      rows_constraint=None, mod_tables=None):
    """Parallel-in-time Euler: solve a sliding window of W steps per sweep.

    Fixed-point recurrence (Picard iteration over the Euler grid — the
    deterministic-ODE case of Shih et al. 2023, "Parallel Sampling of
    Diffusion Models"):

        Y'[s+j+1] = Y[s] + sum_{m<=j} dt_{s+m} * v(Y[s+m], t_{s+m})

    All W velocity evaluations of a sweep run as ONE forward with the window
    on the batch axis, so (a) the matmuls see W× more rows (MXU efficiency
    rises with M) and (b) under a mesh the rows shard over ``data`` — the ODE
    time axis becomes a parallelism axis.  The leading window entry is always
    the exact Euler successor of the frozen prefix, so each sweep freezes >= 1
    step and the loop terminates in <= steps sweeps (tol only accelerates the
    tail).  tol -> 0 reproduces the sequential Euler trajectory exactly (same
    grid, same evaluation points).

    Returns (y_final, {"sweeps": int32 scalar}).
    """
    b, n, d = y0.shape
    T = len(ts) - 1
    W = min(W, T)
    dtype = y0.dtype
    ts_head = jnp.asarray(ts[:-1], jnp.float32)
    dts = jnp.asarray(ts[1:] - ts[:-1], jnp.float32)
    ts_pad = jnp.concatenate([ts_head, jnp.full((W,), float(ts[-1]), jnp.float32)])
    dts_pad = jnp.concatenate([dts, jnp.zeros((W,), jnp.float32)])  # dt=0: no-op tail rows
    fmask = mask[None, :, :, None].astype(jnp.float32)  # [1, b, n, 1]
    denom = jnp.maximum(jnp.sum(fmask) * d, 1.0)
    # state buffer Y[i] ~ y(t_i), padded so every window slice is in bounds
    Y0 = jnp.broadcast_to(y0[None], (T + W + 1, b, n, d)).astype(dtype)

    def body(carry):
        Y, s, sweeps = carry
        Xw = jax.lax.dynamic_slice_in_dim(Y, s, W, axis=0)
        tw = jax.lax.dynamic_slice_in_dim(ts_pad, s, W)
        dw = jax.lax.dynamic_slice_in_dim(dts_pad, s, W)
        x_rows = Xw.reshape(W * b, n, d)
        if rows_constraint is not None:
            x_rows = rows_constraint(x_rows)
        mods = None
        if mod_tables is not None:
            # precomputed AdaLN tables, sliced to the window and expanded to
            # per-row mods (row order is w-major then batch, matching reshape)
            blk_w = jax.lax.dynamic_slice_in_dim(mod_tables[0], s, W, axis=0)
            fin_w = jax.lax.dynamic_slice_in_dim(mod_tables[1], s, W, axis=0)
            mods = (
                jnp.repeat(blk_w.transpose(1, 0, 2), b, axis=1),  # [depth, W*b, 6dim]
                jnp.repeat(fin_w, b, axis=0),  # [W*b, 2dim]
            )
        v = velocity_rows(x_rows, jnp.repeat(tw, b), mods)
        if rows_constraint is not None:
            # pin the output too: without it GSPMD may pick replicated
            # layouts for the epilogue and back-propagate them into the body
            v = rows_constraint(v)
        v = v.reshape(W, b, n, d)
        incr = jnp.cumsum(dw[:, None, None, None].astype(dtype) * v, axis=0)
        base = jax.lax.dynamic_slice_in_dim(Y, s, 1, axis=0)  # frozen Y[s]
        Ynew = base + incr  # new guesses for Y[s+1 .. s+W]
        Yold = jax.lax.dynamic_slice_in_dim(Y, s + 1, W, axis=0)
        diff = (Ynew - Yold).astype(jnp.float32) * fmask
        err = jnp.sqrt(jnp.sum(diff * diff, axis=(1, 2, 3)) / denom)  # [W]
        # entry 0 is exact (successor of a frozen state); freeze the longest
        # converged prefix after it
        adv = 1 + jnp.sum(jnp.cumprod((err[1:] < tol).astype(jnp.int32)))
        Y = jax.lax.dynamic_update_slice_in_dim(Y, Ynew.astype(dtype), s + 1, axis=0)
        # warm-start entries beyond the window from the sweep frontier so the
        # window never slides onto a cold y0 guess
        idx = jnp.arange(T + W + 1)[:, None, None, None]
        Y = jnp.where(idx > s + W, Ynew[-1][None].astype(dtype), Y)
        return Y, s + adv, sweeps + 1

    Y, _, sweeps = jax.lax.while_loop(
        lambda c: c[1] < T, body, (Y0, jnp.int32(0), jnp.int32(0))
    )
    return Y[T], {"sweeps": sweeps, "window": jnp.int32(W)}


def sample(
    params,
    arch_cfg,
    cond: jax.Array,  # [b, n, d] reference mel, zero-padded to bucket length n
    text_ids: jax.Array,  # [b, nt] int ids, -1 padded
    duration: jax.Array,  # [b] total frames (ref + generated), <= n
    noise: jax.Array,  # [b, n, d] N(0,1); padding region may be nonzero (masked here)
    lens: jax.Array | None = None,  # [b] ref-audio frames; default: full cond
    opts: SampleOptions = SampleOptions(),
    edit_mask: jax.Array | None = None,  # [b, n] True where ref audio is KEPT
    no_ref_audio: bool = False,
    duplicate_test: bool = False,  # debug: blend a shifted copy of cond into y0
    return_trajectory: bool = False,
    backend: str = "auto",
    block_scan=None,  # pipeline-parallel block schedule (parallel/pipeline.py)
    activation_constraint=None,  # sequence-parallel sharding pin (parallel/sequence.py)
    time_rows_constraint=None,  # time-parallel mode: sharding pin applied to the
    # [W*b, n, d] window rows (e.g. PartitionSpec('data') over a mesh, so the
    # ODE's time axis data-parallelizes over chips)
    time_parallel_mesh=None,  # time-parallel mode: run the window forward as
    # jax.shard_map manual over the mesh's `data` axis instead of GSPMD
    # constraints — guarantees per-shard execution of EVERY op (GSPMD chooses
    # to replicate grouped convolutions / custom calls under mere sharding
    # constraints; measured per-device flops ratio 2.7/8 on the DiT).  Other
    # mesh axes (e.g. `model` tensor parallel) stay GSPMD-auto, same pattern
    # as parallel/{ring,pipeline}.py.  Overrides time_rows_constraint.
    return_info: bool = False,  # also return {"sweeps": ...} diagnostics
    # (time-parallel mode only)
):
    """CFM.sample (cfm.py:83-229) — returns generated mel [b, n, d] (frames
    beyond ``duration`` zeroed; the ref region is overwritten with ``cond``).
    """
    b, n, d = cond.shape
    compute_dtype = cond.dtype
    if lens is None:
        lens = jnp.full((b,), n, dtype=jnp.int32)

    # ref-region mask (cond_mask): positions whose mel is fixed to the prompt
    cond_mask = lens_to_mask(lens, n)
    if edit_mask is not None:
        cond_mask = cond_mask & edit_mask

    if no_ref_audio:
        cond = jnp.zeros_like(cond)

    step_cond = jnp.where(cond_mask[..., None], cond, 0.0)

    # duration >= max(text_len, lens) + 1 so something is generated (cfm.py:135-138)
    text_len = jnp.sum(text_ids != -1, axis=-1)
    duration = jnp.maximum(jnp.maximum(text_len, lens) + 1, duration)
    duration = jnp.clip(duration, max=n)
    mask = lens_to_mask(duration, n)

    bb = get_backbone(arch_cfg)
    # text embeddings for both CFG streams, computed ONCE (no per-step cache)
    te_cond = bb.text_embedding(params, arch_cfg, text_ids, n, lens=duration).astype(compute_dtype)
    use_cfg = opts.cfg_strength >= 1e-5
    if use_cfg:
        te_uncond = bb.text_embedding(
            params, arch_cfg, text_ids, n, lens=duration, drop_text=True
        ).astype(compute_dtype)

    y0 = jnp.where(mask[..., None], noise, 0.0).astype(compute_dtype)

    if duplicate_test:
        # intermediate-step observation corner (cfm.py:141-143, 205-209):
        # place a second copy of the ref mel right after the ref region and
        # start the ODE at t_start = t_inter from the blended state
        assert opts.t_start > 0.0, "duplicate_test requires opts.t_start = t_inter > 0"
        test_cond = jax.vmap(lambda m, s: jnp.roll(m, s, axis=0))(step_cond, lens)
        dup_region = (jnp.arange(n)[None, :] >= lens[:, None]) & (
            jnp.arange(n)[None, :] < 2 * lens[:, None]
        )
        test_cond = jnp.where(dup_region[..., None], test_cond, 0.0)
        y0 = (1.0 - opts.t_start) * y0 + opts.t_start * test_cond.astype(compute_dtype)

    # reference cfm.py:205-209: a t_start>0 launch (duplicate_test) keeps the
    # ODE grid density by integrating only the remaining (1-t_start) fraction
    # of the step budget over [t_start, 1]
    n_steps = int(opts.steps * (1.0 - opts.t_start)) if opts.t_start > 0.0 else opts.steps
    ts = timestep_schedule(n_steps, opts.sway_sampling_coef, opts.use_epss, opts.t_start)
    t_dt = jnp.stack([ts[:-1], ts[1:] - ts[:-1]], axis=1)  # [steps, 2]

    # MMDiT keeps text as its own stream and needs the text validity mask
    extra = {}
    if getattr(arch_cfg, "backbone", "") == "MMDiT":
        extra["c_mask"] = text_ids != -1
    if block_scan is not None:
        extra["block_scan"] = block_scan
    if activation_constraint is not None:
        extra["activation_constraint"] = activation_constraint

    def velocity(x, t_k, adaln_mods=None):
        time = jnp.broadcast_to(t_k, (b,)).astype(compute_dtype)
        kw = dict(extra)
        if adaln_mods is not None:
            kw["adaln_mods"] = adaln_mods
        if use_cfg:
            pred, null = bb.forward_cfg(
                params, arch_cfg, x, step_cond, te_cond, te_uncond, time, mask=mask,
                backend=backend, **kw
            )
            return pred + (pred - null) * opts.cfg_strength
        return bb.forward(
            params, arch_cfg, x, step_cond, te_cond, time, mask=mask, backend=backend, **kw
        )

    assert opts.ode_method in ("euler", "midpoint"), opts.ode_method

    # the step timesteps are known ahead of the scan: precompute every step's
    # AdaLN modulations once so the 22 adaln matmuls (41% of the weights)
    # drop out of the per-step loop (models/dit.py precompute_adaln)
    if opts.time_parallel_window > 0:
        # ---- parallel-in-time integration (see _picard_integrate) --------
        assert opts.ode_method == "euler", "time-parallel integration is euler-only"
        assert not return_trajectory, "trajectory capture needs the sequential scan"
        W = min(opts.time_parallel_window, len(ts) - 1)
        if time_parallel_mesh is not None:
            assert block_scan is None and activation_constraint is None, (
                "time_parallel_mesh is manual over `data`; pipeline/sequence "
                "hooks cannot nest inside it"
            )
            dp = time_parallel_mesh.shape["data"]
            assert (W * b) % dp == 0, (
                f"window rows {W}x{b} must divide the data axis ({dp}); "
                f"pick time_parallel_window as a multiple of {dp}//b"
            )
        # conditioning tiled once onto the window axis; per-row times make the
        # backbone evaluate W different ODE steps in one forward
        cond_r = jnp.tile(step_cond, (W, 1, 1))
        te_cond_r = jnp.tile(te_cond, (W, 1, 1))
        te_uncond_r = jnp.tile(te_uncond, (W, 1, 1)) if use_cfg else None
        mask_r = jnp.tile(mask, (W, 1))
        extra_r = dict(extra)
        if "c_mask" in extra_r:
            extra_r["c_mask"] = jnp.tile(extra_r["c_mask"], (W, 1))
        if time_rows_constraint is not None:
            # pin the tiled conditioning to the same row sharding as the
            # window states — one unconstrained operand is enough for GSPMD
            # to replicate whole subgraphs of the forward
            cond_r = time_rows_constraint(cond_r)
            te_cond_r = time_rows_constraint(te_cond_r)
            if te_uncond_r is not None:
                te_uncond_r = time_rows_constraint(te_uncond_r)
            mask_r = time_rows_constraint(mask_r)

        def _velocity_on(x_rows, t_rows, cond_l, te_l, teu_l, mask_l, cmask_l,
                         adaln_mods=None, constraint=None):
            t_rows = t_rows.astype(compute_dtype)
            kwm = dict(extra_r)
            kwm.pop("c_mask", None)
            if cmask_l is not None:
                kwm["c_mask"] = cmask_l
            if adaln_mods is not None:
                kwm["adaln_mods"] = adaln_mods
            if constraint is not None and "activation_constraint" not in kwm:
                # keep the row sharding pinned INSIDE the block scan (GSPMD
                # drops it from the scan carry otherwise; see dit.forward)
                kwm["activation_constraint"] = constraint
            if use_cfg:
                pred, null = bb.forward_cfg(
                    params, arch_cfg, x_rows, cond_l, te_l, teu_l,
                    t_rows, mask=mask_l, backend=backend, **kwm,
                )
                return pred + (pred - null) * opts.cfg_strength
            return bb.forward(
                params, arch_cfg, x_rows, cond_l, te_l, t_rows,
                mask=mask_l, backend=backend, **kwm,
            )

        cmask_r = extra_r.get("c_mask")
        if time_parallel_mesh is not None:
            # manual-over-`data` evaluation: every op in the forward runs on
            # its rows shard by construction (no GSPMD partitioning choices);
            # params and other mesh axes stay auto, so time x tp composes
            from f5_tts_tpu.parallel.mesh import DATA_AXIS

            P_ = jax.sharding.PartitionSpec
            rowspec = P_(DATA_AXIS)

            def velocity_rows(x_rows, t_rows, adaln_mods=None):
                args = [x_rows, t_rows, cond_r, te_cond_r]
                specs = [rowspec, rowspec, rowspec, rowspec]
                flags = dict(teu=te_uncond_r is not None, cmask=cmask_r is not None,
                             mods=adaln_mods is not None)
                if flags["teu"]:
                    args.append(te_uncond_r)
                    specs.append(rowspec)
                args.append(mask_r)
                specs.append(rowspec)
                if flags["cmask"]:
                    args.append(cmask_r)
                    specs.append(rowspec)
                if flags["mods"]:
                    args.append(adaln_mods)
                    specs.append((P_(None, DATA_AXIS), rowspec))

                def local(*a):
                    it = iter(a)
                    x_l, t_l, cond_l, te_l = next(it), next(it), next(it), next(it)
                    teu_l = next(it) if flags["teu"] else None
                    mask_l = next(it)
                    cmask_l = next(it) if flags["cmask"] else None
                    mods_l = next(it) if flags["mods"] else None
                    return _velocity_on(x_l, t_l, cond_l, te_l, teu_l, mask_l,
                                        cmask_l, adaln_mods=mods_l)

                return jax.shard_map(
                    local, mesh=time_parallel_mesh, in_specs=tuple(specs),
                    out_specs=rowspec, axis_names=frozenset({DATA_AXIS}),
                )(*args)
        else:

            def velocity_rows(x_rows, t_rows, adaln_mods=None):
                return _velocity_on(
                    x_rows, t_rows, cond_r, te_cond_r, te_uncond_r, mask_r,
                    cmask_r, adaln_mods=adaln_mods,
                    constraint=time_rows_constraint,
                )

        # the schedule is known ahead, so the AdaLN tables drop out of the
        # sweeps exactly as they do for the sequential scan; padded window
        # rows reuse the last step's mods (their dt=0 discards the result)
        mod_tables = None
        if opts.precompute_adaln and block_scan is None and hasattr(bb, "precompute_adaln"):
            blk_t, fin_t = bb.precompute_adaln(
                params, arch_cfg, jnp.asarray(ts[:-1]), dtype=compute_dtype
            )

            def _pad_w(a):
                return jnp.concatenate(
                    [a, jnp.broadcast_to(a[-1:], (W,) + a.shape[1:])], axis=0
                )

            mod_tables = (_pad_w(blk_t), _pad_w(fin_t))

        y, info = _picard_integrate(
            velocity_rows, y0, ts, W, opts.picard_tol, mask,
            rows_constraint=time_rows_constraint, mod_tables=mod_tables,
        )
        out = jnp.where(cond_mask[..., None], cond, y)
        out = jnp.where(mask[..., None], out, 0.0)
        return (out, info) if return_info else out

    tables = None
    if (
        opts.precompute_adaln
        and opts.ode_method == "euler"
        and block_scan is None
        and hasattr(bb, "precompute_adaln")
    ):
        tables = bb.precompute_adaln(
            params, arch_cfg, jnp.asarray(ts[:-1]), dtype=compute_dtype
        )

    def ode_step(x, inp):
        if tables is None:
            t_dt_k = inp
            mods_k = None
        else:
            t_dt_k, blk_k, fin_k = inp
            mods_k = (blk_k, fin_k)
        t_k, dt_k = t_dt_k[0], t_dt_k[1]
        dt_c = dt_k.astype(compute_dtype)
        if opts.ode_method == "midpoint":
            k1 = velocity(x, t_k)
            x = x + dt_c * velocity(x + 0.5 * dt_c * k1, t_k + 0.5 * dt_k)
        else:
            x = x + dt_c * velocity(x, t_k, adaln_mods=mods_k)
        # keep the carry in compute_dtype: fp32 params with bf16 activations
        # promote the update to fp32 (the picard path casts likewise at :152)
        x = x.astype(compute_dtype)
        return x, (x if return_trajectory else None)

    xs = t_dt if tables is None else (t_dt, tables[0], tables[1])
    y, traj = jax.lax.scan(ode_step, y0, xs)

    out = jnp.where(cond_mask[..., None], cond, y)
    out = jnp.where(mask[..., None], out, 0.0)
    if return_trajectory:
        return out, jnp.concatenate([y0[None], traj], axis=0)
    if return_info:  # sequential scan: one model eval per step, by definition
        return out, {"sweeps": jnp.int32(len(ts) - 1), "window": jnp.int32(1)}
    return out


def mask_from_frac_lengths(key: jax.Array, lens: jax.Array, length: int, frac_range=(0.7, 1.0)):
    """Random contiguous span mask covering frac in [0.7, 1.0] of each sample
    (reference model/utils.py:61-77)."""
    k1, k2 = jax.random.split(key)
    b = lens.shape[0]
    frac = jax.random.uniform(k1, (b,), minval=frac_range[0], maxval=frac_range[1])
    span = (frac * lens).astype(jnp.int32)
    max_start = lens - span
    start = (max_start * jax.random.uniform(k2, (b,))).astype(jnp.int32)
    start = jnp.maximum(start, 0)
    end = start + span
    pos = jnp.arange(length)[None, :]
    return (pos >= start[:, None]) & (pos < end[:, None])


def loss(
    params,
    arch_cfg,
    mel: jax.Array,  # [b, n, d] target mel (x1)
    text_ids: jax.Array,  # [b, nt]
    lens: jax.Array,  # [b]
    key: jax.Array,
    audio_drop_prob: float = 0.3,
    cond_drop_prob: float = 0.2,
    frac_lengths_mask=(0.7, 1.0),
    backend: str = "sdpa",  # default kept for CPU tests; Trainer passes
    # "train_auto" which picks the Pallas flash fwd+bwd custom-VJP kernel on
    # TPU (ops/flash_attention.py flash_attention_trainable)
    valid: jax.Array | None = None,  # [b] 1=real row, 0=DP-padding duplicate
    block_scan=None,  # pipeline-parallel block schedule (parallel/pipeline.py)
    activation_constraint=None,  # sequence-parallel sharding pin (parallel/sequence.py)
    inject: dict | None = None,  # deterministic overrides for the random draws
    # (keys: "x0" [b,n,d], "time" [b], "span_mask" [b,n] bool, "drop_audio"
    # bool, "drop_both" bool) — used by direct-parity tests against the
    # reference's CFM.forward (tests/test_reference_parity.py) and for
    # reproducible debugging; None draws from ``key`` as usual
):
    """CFM training loss (cfm.py:231-302): flow-matching MSE over a random
    infilling span, with CFG condition drops.

    The reference draws drop decisions per optimizer step at python level
    (cfm.py:286-291, shared across the batch); here they are traced bernoullis
    from ``key`` — same distribution, jit-compatible.

    ``valid`` zeroes the loss contribution of rows duplicated to pad the batch
    to the data-parallel size (the reference never pads, Accelerate drops the
    remainder instead) so padded rows don't bias the masked-mean gradient.
    """
    b, n, d = mel.shape
    k_frac, k_x0, k_t, k_drop1, k_drop2 = jax.random.split(key, 5)
    inject = inject or {}

    mask = lens_to_mask(lens, n)
    rand_span_mask = (
        inject["span_mask"] if "span_mask" in inject
        else mask_from_frac_lengths(k_frac, lens, n, frac_lengths_mask)
    ) & mask

    x1 = mel
    x0 = inject.get("x0")
    if x0 is None:
        x0 = jax.random.normal(k_x0, x1.shape, dtype=x1.dtype)
    time = inject.get("time")
    if time is None:
        time = jax.random.uniform(k_t, (b,), dtype=x1.dtype)

    t = time[:, None, None]
    phi = (1.0 - t) * x0 + t * x1
    flow = x1 - x0

    cond = jnp.where(rand_span_mask[..., None], 0.0, x1)

    drop_audio = inject.get("drop_audio")
    if drop_audio is None:
        drop_audio = jax.random.bernoulli(k_drop1, audio_drop_prob)
    drop_both = inject.get("drop_both")
    if drop_both is None:
        drop_both = jax.random.bernoulli(k_drop2, cond_drop_prob)
    drop_audio = drop_audio | drop_both

    # traced drops: zero the conditioning inputs (equivalent to the reference's
    # boolean branches in dit.py:106-112, 159-161).  Computing BOTH text-embed
    # streams and selecting with `where` looks like a 2x waste, but it was
    # A/B-measured against a lax.cond single-branch variant on a v5e chip
    # (F5TTS_v1_Base, b=8 x n=1024, bf16 + remat): where = 218 ms/step vs
    # cond = 228-241 ms/step.  The text stack is small next to the 22-block
    # DiT and XLA's cond blocks fusion around the branch, so the dual compute
    # wins; expected saving from branching is bounded by p(drop)=0.2 anyway.
    bb = get_backbone(arch_cfg)
    # per-sample lens: the reference training path passes seq_len =
    # audio_mask.sum(1) into text_embed (dit.py get_input_embed), which
    # valid-masks text positions beyond each sample's mel length — matters
    # for legacy configs with text_mask_padding=False
    te = bb.text_embedding(params, arch_cfg, text_ids, n, lens=lens)
    te_uncond = bb.text_embedding(params, arch_cfg, text_ids, n, lens=lens, drop_text=True)
    te = jnp.where(drop_both, te_uncond.astype(x1.dtype), te.astype(x1.dtype))
    cond_in = jnp.where(drop_audio, 0.0, cond)

    extra = {}
    if getattr(arch_cfg, "backbone", "") == "MMDiT":
        # text stream validity (the reference MMDiT recomputes c_mask from the
        # padded ids and re-masks c between blocks)
        extra["c_mask"] = text_ids != -1
    if block_scan is not None:
        extra["block_scan"] = block_scan
    if activation_constraint is not None:
        extra["activation_constraint"] = activation_constraint
    pred = bb.forward(params, arch_cfg, phi, cond_in, te, time, mask=mask, backend=backend, **extra)

    sq = jnp.square(pred - flow)
    w = rand_span_mask[..., None].astype(jnp.float32)
    if valid is not None:
        w = w * valid.astype(jnp.float32)[:, None, None]
    total = jnp.sum(sq.astype(jnp.float32) * w)
    count = jnp.maximum(jnp.sum(w) * d, 1.0)  # selected elements = masked frames * d
    return total / count
