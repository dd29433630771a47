"""Training-step throughput on the current device (frames/s per chip).

Reference scale point: 8 GPUs x 38,400 frames/GPU per update
(configs/F5TTS_v1_Base.yaml).  Measures one chip's sustainable frames/s.

    python scripts/bench_train.py [b] [bf16] [backend] [policy] [bucket] [accum] [model]

model = any MODEL_CONFIGS name (F5TTS_v1_Base default; F5TTS_MMDiT_Base,
E2TTS_Base, ... pick the matching backbone automatically).
"""

import sys

sys.path.insert(0, ".")

import dataclasses
import json
import time

import jax
import numpy as np


def main():
    from f5_tts_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    import functools

    from f5_tts_tpu.models.backbones import get_backbone
    from f5_tts_tpu.models.configs import MODEL_CONFIGS
    from f5_tts_tpu.train.step import OptimConfig, init_train_state, train_step

    pol = sys.argv[4] if len(sys.argv) > 4 else "nothing"
    model = sys.argv[7] if len(sys.argv) > 7 else "F5TTS_v1_Base"
    # "none" = no jax.checkpoint at all (every activation saved; zero recompute)
    arch = dataclasses.replace(MODEL_CONFIGS[model].arch,
                               checkpoint_activations=pol != "none",
                               remat_policy=("nothing" if pol == "none" else pol))
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n = int(sys.argv[5]) if len(sys.argv) > 5 else 1024  # frame bucket
    accum = int(sys.argv[6]) if len(sys.argv) > 6 else 1  # grad accumulation
    nt = 256
    backbone = get_backbone(arch)
    params = backbone.init(jax.random.PRNGKey(0), arch)
    opt_cfg = OptimConfig(mixed_precision=len(sys.argv) > 2 and sys.argv[2] == "bf16",
                          grad_accumulation_steps=accum)
    opt_state, ema, step = init_train_state(params, opt_cfg)

    rng = np.random.default_rng(0)
    batch = {
        "mel": rng.standard_normal((b, n, 100)).astype(np.float32),
        "text_ids": rng.integers(0, 2545, (b, nt)).astype(np.int32),
        "lens": np.full((b,), n, np.int32),
    }
    step_fn = jax.jit(
        functools.partial(train_step, arch_cfg=arch, opt_cfg=opt_cfg, backend=(sys.argv[3] if len(sys.argv) > 3 else "chunked")),
        donate_argnums=(0, 1, 2, 3),
    )
    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    params, opt_state, ema, step, m = step_fn(params, opt_state, ema, step, batch, key)
    jax.block_until_ready(m["loss"])
    print(f"compile: {time.perf_counter() - t0:.1f}s, loss {float(m['loss']):.4f}", file=sys.stderr)

    iters = 10
    # presplit keys OUTSIDE the timed loop: through the axon tunnel a single
    # host-driven split costs a 40-80 ms round trip per iteration and pollutes
    # the measurement (observed 25k vs 37k frames/s for identical graphs)
    subs = list(jax.random.split(key, iters))
    jax.block_until_ready(subs[-1])
    t0 = time.perf_counter()
    for i in range(iters):
        params, opt_state, ema, step, m = step_fn(params, opt_state, ema, step, batch, subs[i])
    jax.block_until_ready(m["loss"])
    dt = (time.perf_counter() - t0) / iters
    frames_s = b * n / dt
    print(f"step: {dt*1000:.1f} ms, {frames_s:,.0f} frames/s/chip (batch {b}x{n})", file=sys.stderr)
    # MFU on the repo-wide basis (f5_tts_tpu/utils/flops.py: fwd+bwd = 3x fwd,
    # remat recompute not counted)
    from f5_tts_tpu.utils.flops import V5E_BF16_PEAK_FLOPS, train_step_flops

    step_flops = train_step_flops(MODEL_CONFIGS[model], n, batch=b)
    tflops = step_flops / dt / 1e12
    mfu_pct = 100.0 * step_flops / dt / V5E_BF16_PEAK_FLOPS
    print(f"MFU: {tflops:.1f} TFLOP/s = {mfu_pct:.1f}% of v5e bf16 peak", file=sys.stderr)
    print(json.dumps({"metric": "train_frames_per_s", "value": round(frames_s),
                      "unit": "frames/s/chip", "model_tflops_per_s": round(tflops, 1),
                      "mfu_pct": round(mfu_pct, 1)}))


if __name__ == "__main__":
    main()
