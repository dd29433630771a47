"""Time-parallel (Picard / parallel-in-time) ODE sampling.

The sliding-window fixed-point iteration in ``cfm._picard_integrate`` solves
the SAME Euler grid as the sequential ``lax.scan`` — with tol -> 0 its fixed
point IS the sequential trajectory — so parity is an exact property, not a
statistical one (modulo fp reassociation of the window cumsum).  No reference
counterpart (the reference dispatches one TRT engine call per ODE step,
runtime/triton_trtllm/f5_tts_trtllm.py:296-372, strictly sequentially); the
recurrence is Shih et al. 2023 "Parallel Sampling of Diffusion Models"
adapted to the deterministic CFM Euler grid.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

from f5_tts_tpu.models import cfm as C
from tests.test_dit import SMALL, make_params


def _problem(seed=7, b=2, n=48, nt=10):
    rng = np.random.default_rng(seed)
    cfg = SMALL
    cond = rng.standard_normal((b, n, cfg.mel_dim)).astype(np.float32)
    lens = np.array([12, 9][:b], np.int32)
    for i, ln in enumerate(lens):
        cond[i, ln:] = 0.0
    text = rng.integers(0, cfg.text_num_embeds, (b, nt)).astype(np.int32)
    text[-1, 6:] = -1
    duration = np.array([40, 30][:b], np.int32)
    noise = rng.standard_normal((b, n, cfg.mel_dim)).astype(np.float32)
    return (
        jnp.asarray(cond), jnp.asarray(text), jnp.asarray(duration),
        jnp.asarray(noise), jnp.asarray(lens),
    )


def _run(params, args, steps, cfg_strength=2.0, window=0, tol=1e-3,
         precompute_adaln=False, time_parallel_mesh=None, **kw):
    if time_parallel_mesh is not None:
        kw["time_parallel_mesh"] = time_parallel_mesh
    cond, text, duration, noise, lens = args
    opts = C.SampleOptions(
        steps=steps, cfg_strength=cfg_strength, precompute_adaln=precompute_adaln,
        time_parallel_window=window, picard_tol=tol,
    )
    return C.sample(
        params, SMALL, cond, text, duration, noise, lens=lens, opts=opts,
        backend="sdpa", **kw,
    )


def test_picard_tol_zero_is_exact_euler():
    """tol=0 never early-accepts, so every frozen entry is the exact Euler
    successor of a frozen prefix: output == sequential scan, sweeps == steps."""
    params = make_params(SMALL)
    args = _problem()
    seq = np.asarray(_run(params, args, steps=8))
    par, info = _run(
        params, args, steps=8, window=4, tol=0.0, return_info=True,
    )
    np.testing.assert_allclose(np.asarray(par), seq, atol=3e-4)
    assert int(info["sweeps"]) == 8  # adv == 1 per sweep at tol 0


def test_picard_huge_tol_advances_full_windows():
    """tol=inf accepts every window entry on first evaluation: the advance
    arithmetic must stride exactly ceil(steps / W) sweeps."""
    params = make_params(SMALL)
    args = _problem(seed=9)
    for steps, w, want in ((8, 4, 2), (7, 4, 2), (8, 3, 3), (6, 8, 1)):
        _, info = _run(
            params, args, steps=steps, window=w, tol=float("inf"), return_info=True,
        )
        assert int(info["sweeps"]) == want, (steps, w, int(info["sweeps"]))


def test_picard_tolerance_bounds_drift():
    """A practical tol early-accepts tail entries; the result must stay within
    an O(steps * tol) band of the sequential trajectory."""
    params = make_params(SMALL)
    args = _problem(seed=11)
    tol = 1e-3
    seq = np.asarray(_run(params, args, steps=16))
    par, info = _run(
        params, args, steps=16, window=8, tol=tol, return_info=True,
    )
    err = np.sqrt(np.mean((np.asarray(par) - seq) ** 2))
    assert err < 60 * tol, err
    assert int(info["sweeps"]) <= 16


def test_picard_precomputed_adaln_tables_match():
    """The window reuses the sequential path's precomputed AdaLN tables as
    per-row mods (expanded via dit.forward_cfg row doubling); numerics match
    the non-table window up to matmul reassociation."""
    params = make_params(SMALL)
    args = _problem(seed=23)
    plain = np.asarray(_run(params, args, steps=8, window=4, tol=0.0))
    tabled = np.asarray(
        _run(params, args, steps=8, window=4, tol=0.0, precompute_adaln=True)
    )
    np.testing.assert_allclose(tabled, plain, atol=3e-4)
    # and still matches the default sequential sampler (tables on there too)
    seq = np.asarray(_run(params, args, steps=8, precompute_adaln=True))
    np.testing.assert_allclose(tabled, seq, atol=5e-4)


def test_picard_no_cfg_path():
    params = make_params(SMALL)
    args = _problem(seed=13)
    seq = np.asarray(_run(params, args, steps=6, cfg_strength=0.0))
    par = _run(
        params, args, steps=6, cfg_strength=0.0, window=3, tol=0.0,
    )
    np.testing.assert_allclose(np.asarray(par), seq, atol=3e-4)


def test_engine_time_parallel_option():
    """EngineOptions(time_parallel_window=...) plumbs through to the fused
    sample+vocode graph: tol=0 output matches the sequential engine."""
    import jax as _jax

    from f5_tts_tpu.infer.engine import EngineOptions, InferenceEngine
    from f5_tts_tpu.models import vocos as V
    from tests.test_pipeline import tiny_model

    cfg, params, _, _ = tiny_model()
    voc = V.init(_jax.random.PRNGKey(1), V.VocosConfig())
    rng = np.random.default_rng(3)
    ref = rng.standard_normal((40, cfg.mel.n_mel_channels)).astype(np.float32)
    text = rng.integers(0, 200, size=30).astype(np.int32)
    outs = {}
    for w in (0, 2):
        eng = InferenceEngine(
            params, cfg, vocoder_params=voc,
            options=EngineOptions(nfe_step=4, time_parallel_window=w, picard_tol=0.0),
        )
        _, wavs, _ = eng.generate_batch([ref], [text], [200], seeds=[0], fetch_mel=False)
        outs[w] = wavs[0]
    np.testing.assert_allclose(outs[2], outs[0], atol=2e-4)


def test_picard_other_backbones():
    """The window path is backbone-generic (per-row times through forward /
    forward_cfg): UNetT (time-as-token) and MMDiT (dual-stream, tiled c_mask)
    match their sequential samplers at tol=0."""
    from f5_tts_tpu.models import mmdit as M
    from f5_tts_tpu.models import unett as U
    from tests.test_mmdit import SMALL as MM_SMALL
    from tests.test_unett import SMALL as UN_SMALL

    rng = np.random.default_rng(29)
    for cfg, init in ((UN_SMALL, U.init), (MM_SMALL, M.init)):
        params = init(jax.random.PRNGKey(5), cfg)
        b, n, nt = 2, 48, 10
        cond = rng.standard_normal((b, n, cfg.mel_dim)).astype(np.float32)
        lens = np.array([12, 9], np.int32)
        cond[0, 12:] = 0.0
        cond[1, 9:] = 0.0
        text = rng.integers(0, cfg.text_num_embeds, (b, nt)).astype(np.int32)
        text[1, 6:] = -1
        noise = rng.standard_normal((b, n, cfg.mel_dim)).astype(np.float32)
        args = [jnp.asarray(a) for a in
                (cond, text, np.array([40, 30], np.int32), noise, lens)]
        seq = C.sample(params, cfg, *args[:4], lens=args[4], backend="sdpa",
                       opts=C.SampleOptions(steps=4, precompute_adaln=False))
        par = C.sample(params, cfg, *args[:4], lens=args[4], backend="sdpa",
                       opts=C.SampleOptions(steps=4, precompute_adaln=False,
                                            time_parallel_window=4, picard_tol=0.0))
        np.testing.assert_allclose(np.asarray(par), np.asarray(seq), atol=3e-4)


def test_picard_window_rows_shard_over_data_axis():
    """The W*b window rows pin to the ``data`` mesh axis: the ODE's TIME
    dimension runs data-parallel over 8 devices, output unchanged."""
    params = make_params(SMALL)
    args = _problem(seed=17)
    host = np.asarray(
        _run(params, args, steps=8, window=4, tol=0.0)
    )
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:8]).reshape(8), ("data",))
    rows_sh = NamedSharding(mesh, P("data"))
    cond, text, duration, noise, lens = args
    opts = C.SampleOptions(
        steps=8, precompute_adaln=False, time_parallel_window=4, picard_tol=0.0
    )

    @jax.jit
    def f(params, cond, text, duration, noise, lens):
        return C.sample(
            params, SMALL, cond, text, duration, noise, lens=lens, opts=opts,
            backend="sdpa",
            time_rows_constraint=lambda x: jax.lax.with_sharding_constraint(x, rows_sh),
        )

    with mesh:
        out = np.asarray(f(params, cond, text, duration, noise, lens))
    np.testing.assert_allclose(out, host, atol=3e-4)


def test_picard_shard_map_mesh_mode_matches():
    """time_parallel_mesh: the window forward runs shard_map manual over
    `data` (every op per-shard by construction — GSPMD constraints leave
    grouped convs replicated); numerics match the unsharded window."""
    from f5_tts_tpu.parallel.mesh import make_mesh

    params = make_params(SMALL)
    args = _problem(seed=31)
    host = np.asarray(_run(params, args, steps=8, window=4, tol=0.0))
    mesh = make_mesh(data=8, model=1)
    got = np.asarray(_run(params, args, steps=8, window=4, tol=0.0,
                          time_parallel_mesh=mesh))
    np.testing.assert_allclose(got, host, atol=3e-4)
    # with precomputed AdaLN tables (per-row mods shard with the rows)
    host_t = np.asarray(_run(params, args, steps=8, window=4, tol=0.0,
                             precompute_adaln=True))
    got_t = np.asarray(_run(params, args, steps=8, window=4, tol=0.0,
                            precompute_adaln=True, time_parallel_mesh=mesh))
    np.testing.assert_allclose(got_t, host_t, atol=3e-4)


def test_picard_shard_map_divides_per_device_flops():
    """The whole point of the axis: per-device FLOPs must divide ~W-fold.
    XLA cost analysis on the partitioned executable (8 devices, W*b=8 rows)
    measured 7.1x at this config; guard against regressions to the GSPMD
    constraint behavior (2.4x — grouped convs replicated)."""
    import functools

    from f5_tts_tpu.parallel.mesh import make_mesh

    params = make_params(SMALL)
    cond, text, duration, noise, lens = _problem(seed=37)
    opts = C.SampleOptions(steps=8, precompute_adaln=False,
                           time_parallel_window=8, picard_tol=0.0)
    mesh = make_mesh(data=8, model=1)

    def g(params, cond, text, duration, noise, lens, m):
        return C.sample(params, SMALL, cond, text, duration, noise, lens=lens,
                        opts=opts, backend="sdpa", time_parallel_mesh=m)

    with mesh:
        fm = (jax.jit(functools.partial(g, m=mesh))
              .lower(params, cond, text, duration, noise, lens)
              .compile().cost_analysis()["flops"])
    fs = (jax.jit(functools.partial(g, m=None))
          .lower(params, cond, text, duration, noise, lens)
          .compile().cost_analysis()["flops"])
    assert fs / fm > 5.0, f"per-device flops ratio {fs/fm:.2f} (want ~8)"


def test_engine_time_parallel_mesh_serving():
    """InferenceEngine.enable_time_parallel(mesh): the fused serving graph
    runs the window over 8 devices, wavs identical to the plain engine."""
    import jax as _jax

    from f5_tts_tpu.infer.engine import EngineOptions, InferenceEngine
    from f5_tts_tpu.models import vocos as V
    from f5_tts_tpu.parallel.mesh import make_mesh
    from tests.test_pipeline import tiny_model

    cfg, params, _, _ = tiny_model()
    voc = V.init(_jax.random.PRNGKey(1), V.VocosConfig())
    rng = np.random.default_rng(5)
    refs = [rng.standard_normal((40, cfg.mel.n_mel_channels)).astype(np.float32)
            for _ in range(2)]
    texts = [rng.integers(0, 200, size=30).astype(np.int32) for _ in range(2)]
    opts = EngineOptions(nfe_step=4, time_parallel_window=4, picard_tol=0.0)
    plain = InferenceEngine(params, cfg, vocoder_params=voc, options=opts)
    _, want, _ = plain.generate_batch(refs, texts, [200, 210], seeds=[0, 1],
                                      fetch_mel=False)
    tp = InferenceEngine(params, cfg, vocoder_params=voc, options=opts)
    tp.enable_time_parallel(make_mesh(data=8, model=1))  # rows = W*b = 8
    _, got, _ = tp.generate_batch(refs, texts, [200, 210], seeds=[0, 1],
                                  fetch_mel=False)
    for a, b_ in zip(got, want):
        np.testing.assert_allclose(a, b_, atol=2e-4)


def test_picard_composes_with_tensor_parallel():
    """time x tp on one mesh: window rows on `data`, Megatron weight shards on
    `model` — GSPMD inserts the all-reduces, output matches the host result."""
    from f5_tts_tpu.parallel.mesh import dit_param_specs, make_mesh, shard_params

    params = make_params(SMALL)
    args = _problem(seed=19)
    host = np.asarray(_run(params, args, steps=8, window=4, tol=0.0))
    mesh = make_mesh(data=4, model=2)
    sharded = shard_params(params, mesh, dit_param_specs(params))
    rows_sh = NamedSharding(mesh, P("data"))
    cond, text, duration, noise, lens = args
    opts = C.SampleOptions(
        steps=8, precompute_adaln=False, time_parallel_window=4, picard_tol=0.0
    )

    @jax.jit
    def f(params, cond, text, duration, noise, lens):
        return C.sample(
            params, SMALL, cond, text, duration, noise, lens=lens, opts=opts,
            backend="sdpa",
            time_rows_constraint=lambda x: jax.lax.with_sharding_constraint(x, rows_sh),
        )

    with mesh:
        out = np.asarray(f(sharded, cond, text, duration, noise, lens))
    np.testing.assert_allclose(out, host, atol=3e-4)
