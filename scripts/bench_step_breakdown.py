"""Device-only microbenchmarks for the serving hot path.

Times are measured the tunnel-safe way (DEVELOPMENT.md): the op under test is
repeated inside ONE jitted ``lax.scan`` whose carry feeds the next iteration
(defeats loop-invariant hoisting / remote caching), so the wall clock spans a
single multi-second device-only graph.

    python scripts/bench_step_breakdown.py step        # full DiT NFE step
    python scripts/bench_step_breakdown.py attn        # flash block sweep
    python scripts/bench_step_breakdown.py attn_sdpa   # XLA SDPA baseline
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from f5_tts_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()


def timed_loop(make_step, x0, iters: int, *consts) -> float:
    """Build scan(step) over `iters`, run twice (compile + measure), return
    seconds per iteration.  ``consts`` are passed as jit ARGUMENTS — closing
    over large pytrees bakes them into the HLO as constants and blows the
    axon remote-compile payload limit (DEVELOPMENT.md)."""

    @jax.jit
    def loop(x, *cs):
        def body(c, _):
            y = make_step(c, *cs)
            return x + y * 1e-6, ()

        out, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(out.astype(jnp.float32))

    loop(x0, *consts).block_until_ready()  # compile
    t0 = time.perf_counter()
    loop(x0, *consts).block_until_ready()
    return (time.perf_counter() - t0) / iters


def bench_step(iters=300):
    from f5_tts_tpu.models import dit
    from f5_tts_tpu.models.configs import MODEL_CONFIGS

    cfg = MODEL_CONFIGS["F5TTS_v1_Base"].arch
    b, n = 2, 1024  # fused-CFG pair, serving bucket
    params = dit.fuse_for_inference(dit.init(jax.random.PRNGKey(0), cfg))
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    rng = np.random.default_rng(0)
    cond = jnp.asarray(rng.standard_normal((b, n, cfg.mel_dim)), jnp.bfloat16)
    te = jnp.asarray(rng.standard_normal((b, n, cfg.text_dim)), jnp.bfloat16)
    time_t = jnp.asarray([0.4, 0.4], jnp.bfloat16)
    x0 = jnp.asarray(rng.standard_normal((b, n, cfg.mel_dim)), jnp.bfloat16)
    mask = jnp.arange(n)[None, :] < jnp.asarray([n, n - 200])[:, None]

    def step(x, p):
        return dit.forward(p, cfg, x, cond, te, time_t, mask=mask, backend="flash")

    per = timed_loop(step, x0, iters, params)
    print(f"dit_step: {per * 1e3:.3f} ms/step  ({iters} iters)")


def bench_attn(block_pairs=((1024, 1024), (1024, 512))):
    from f5_tts_tpu.ops.flash_attention import _flash

    b, h, n, dh = 2, 16, 1024, 64
    rng = np.random.default_rng(0)
    q0, k, v = (jnp.asarray(rng.standard_normal((b, h, n, dh)), jnp.bfloat16) for _ in range(3))
    lens = jnp.asarray([n, n - 200], jnp.int32)
    for bq, bk in block_pairs:
        def step(x, bq=bq, bk=bk):
            return _flash(x, k, v, lens, bq, bk)

        per = timed_loop(step, q0, 3000)
        print(f"flash bq={bq} bk={bk}: {per * 1e6:.1f} us/call")


def bench_attn_sdpa():
    from f5_tts_tpu.ops.attention import sdpa

    b, h, n, dh = 2, 16, 1024, 64
    rng = np.random.default_rng(0)
    q0, k, v = (jnp.asarray(rng.standard_normal((b, h, n, dh)), jnp.bfloat16) for _ in range(3))
    lens = jnp.asarray([n, n - 200], jnp.int32)
    mask = jnp.arange(n)[None, :] < lens[:, None]

    def step(x):
        return sdpa(x, k, v, mask)

    per = timed_loop(step, q0, 2000)
    print(f"sdpa: {per * 1e6:.1f} us/call")


def profile_step(iters=30, outdir="/tmp/jaxtrace"):
    """Trace `iters` DiT steps and print the per-HLO time table (top 25)."""
    import glob
    import shutil

    from f5_tts_tpu.models import dit
    from f5_tts_tpu.models.configs import MODEL_CONFIGS

    cfg = MODEL_CONFIGS["F5TTS_v1_Base"].arch
    b, n = 2, 1024
    params = dit.fuse_for_inference(dit.init(jax.random.PRNGKey(0), cfg))
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    rng = np.random.default_rng(0)
    cond = jnp.asarray(rng.standard_normal((b, n, cfg.mel_dim)), jnp.bfloat16)
    te = jnp.asarray(rng.standard_normal((b, n, cfg.text_dim)), jnp.bfloat16)
    time_t = jnp.asarray([0.4, 0.4], jnp.bfloat16)
    x0 = jnp.asarray(rng.standard_normal((b, n, cfg.mel_dim)), jnp.bfloat16)
    mask = jnp.arange(n)[None, :] < jnp.asarray([n, n - 200])[:, None]

    @jax.jit
    def loop(x, p):
        def body(c, _):
            y = dit.forward(p, cfg, c, cond, te, time_t, mask=mask, backend="flash")
            return x + y * 1e-6, ()

        out, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(out.astype(jnp.float32))

    loop(x0, params).block_until_ready()  # compile
    shutil.rmtree(outdir, ignore_errors=True)
    with jax.profiler.trace(outdir):
        loop(x0, params).block_until_ready()
    print_hlo_table(outdir)


def print_hlo_table(outdir: str, top: int = 28):
    """Parse the xplane proto directly and print the per-HLO time table
    (needs PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python with this
    tb-profile build)."""
    import glob
    from collections import defaultdict

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = sorted(glob.glob(f"{outdir}/**/*.xplane.pb", recursive=True))
    space = xplane_pb2.XSpace()
    with open(xs[-1], "rb") as f:
        space.ParseFromString(f.read())
    for plane in space.planes:
        if "TPU" not in plane.name:
            continue
        em = plane.event_metadata
        totals = defaultdict(int)
        counts = defaultdict(int)
        for line in plane.lines:
            if line.name not in ("XLA Ops", "XLA Op"):  # op-level stream
                continue
            for ev in line.events:
                name = em[ev.metadata_id].name
                totals[name] += ev.duration_ps
                counts[name] += 1
        if not totals:
            continue
        total = sum(totals.values())
        print(f"\nplane: {plane.name}  total op time {total / 1e12 * 1e3:.2f} ms")
        for name, t in sorted(totals.items(), key=lambda kv: -kv[1])[:top]:
            print(f"{t / 1e12 * 1e3:9.3f} ms {t / total * 100:5.1f}%  x{counts[name]:<5} {name[:100]}")


def profile_train(iters=10, outdir="/tmp/jaxtrace_train"):
    """Trace `iters` full training steps (fwd+bwd+optimizer, the bench_train
    configuration) and print the per-HLO time table — the training analog of
    ``profile`` for the serving step.

        python scripts/bench_step_breakdown.py profile_train [b] [n] [policy]
    """
    import dataclasses
    import functools
    import shutil

    from f5_tts_tpu.models import dit
    from f5_tts_tpu.models.configs import MODEL_CONFIGS
    from f5_tts_tpu.train.step import OptimConfig, init_train_state, train_step

    b = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    policy = sys.argv[4] if len(sys.argv) > 4 else "dots_flash"
    arch = dataclasses.replace(MODEL_CONFIGS["F5TTS_v1_Base"].arch,
                               checkpoint_activations=True, remat_policy=policy)
    params = dit.init(jax.random.PRNGKey(0), arch)
    opt_cfg = OptimConfig(mixed_precision=True)
    opt_state, ema, step = init_train_state(params, opt_cfg)
    rng = np.random.default_rng(0)
    batch = {
        "mel": rng.standard_normal((b, n, 100)).astype(np.float32),
        "text_ids": rng.integers(0, 2545, (b, 256)).astype(np.int32),
        "lens": np.full((b,), n, np.int32),
    }
    step_fn = jax.jit(
        functools.partial(train_step, arch_cfg=arch, opt_cfg=opt_cfg, backend="train_auto"),
        donate_argnums=(0, 1, 2, 3),
    )
    key = jax.random.PRNGKey(1)
    subs = list(jax.random.split(key, iters + 1))
    state = step_fn(params, opt_state, ema, step, batch, subs[0])  # compile
    jax.block_until_ready(state[-1]["loss"])
    shutil.rmtree(outdir, ignore_errors=True)
    with jax.profiler.trace(outdir):
        for i in range(iters):
            state = step_fn(*state[:4], batch, subs[i + 1])
        jax.block_until_ready(state[-1]["loss"])
    print(f"train step b={b} n={n} policy={policy} ({iters} steps traced; "
          "divide ms by step count)")
    print_hlo_table(outdir, top=40)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "step"
    print(f"devices: {jax.devices()}")
    if which == "step":
        bench_step()
    elif which == "attn":
        bench_attn()
    elif which == "attn_sdpa":
        bench_attn_sdpa()
    elif which == "profile":
        profile_step()
    elif which == "profile_train":
        profile_train()
    else:
        raise SystemExit(f"unknown bench {which}")
