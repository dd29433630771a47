"""A/B the time-parallel (Picard) ODE sampler against the sequential NFE scan.

Measures serial wall/RTF for both engines on identical prompts/seeds plus the
mel MAE between them (tol-controlled) and the sweep count actually taken.
Single-chip expectation: the window batches W steps onto the matmul M axis
(efficiency rises with rows) but pays >1 model evals per accepted step and
loses the precomputed-AdaLN tables, so this is a MULTI-CHIP latency lever —
run this script to record the honest single-chip number.

    python scripts/picard_ab.py [--nfe 16] [--window 8] [--iters 6]

(No PYTHONPATH needed — the script inserts "." itself. Never set PYTHONPATH=.
alone: it clobbers /root/.axon_site and silently drops the TPU plugin.)
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nfe", type=int, default=16)
    ap.add_argument("--window", type=int, default=8)
    ap.add_argument("--tol", type=float, default=1e-3)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (env vars alone are too late "
                    "when a sitecustomize pre-registers a TPU plugin)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from f5_tts_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    from f5_tts_tpu.infer.engine import EngineOptions, InferenceEngine
    from f5_tts_tpu.models import cfm, dit, vocos
    from f5_tts_tpu.models.configs import MODEL_CONFIGS

    model_cfg = MODEL_CONFIGS["F5TTS_v1_Base"]
    on_tpu = any(d.platform != "cpu" for d in jax.devices())
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    params = dit.init(jax.random.PRNGKey(0), model_cfg.arch)
    from f5_tts_tpu.models import layers as L

    ks = jax.random.split(jax.random.PRNGKey(100), 3)
    arch = model_cfg.arch
    params["norm_out"] = L.adaln_final_init(ks[0], arch.dim, zero=False)
    params["proj_out"] = L.linear_init(ks[1], arch.dim, arch.mel_dim, zero=False)
    stacked = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[L.adaln_init(k, arch.dim, zero=False) for k in jax.random.split(ks[2], arch.depth)])
    params["blocks"]["attn_norm"] = stacked
    voc = vocos.init(jax.random.PRNGKey(1))

    rng = np.random.default_rng(0)
    ref_frames, duration = (282, 1023) if on_tpu else (64, 255)
    ref = rng.standard_normal((ref_frames, model_cfg.mel.n_mel_channels)).astype(np.float32)
    text = rng.integers(0, 2545, size=min(180, duration // 2)).astype(np.int32)
    sr = model_cfg.mel.target_sample_rate

    results = {}
    for tag, window in (("sequential", 0), (f"picard_w{args.window}", args.window)):
        eng = InferenceEngine(params, model_cfg, vocoder_params=voc, dtype=dtype,
                              options=EngineOptions(nfe_step=args.nfe,
                                                    time_parallel_window=window,
                                                    picard_tol=args.tol))
        mels, wavs, _ = eng.generate_batch([ref], [text], [duration], seeds=[0])  # compile
        t0 = time.perf_counter()
        for i in range(args.iters):
            _, wavs, _ = eng.generate_batch([ref], [text], [duration], seeds=[i + 1],
                                            fetch_mel=False)
        wall = (time.perf_counter() - t0) / args.iters
        audio_s = len(wavs[0]) / sr
        results[tag] = {"rtf": wall / audio_s, "mel": mels[0]}
        print(f"{tag}: {wall*1000:.1f} ms/utt -> RTF {wall/audio_s:.4f}", file=sys.stderr)

    # sweep count at these settings (device-independent diagnostic)
    n = ref_frames + 1
    pad = 0  # duration <= bucket handled by engine; here raw sample call on a round bucket
    b = 1
    cond = jnp.asarray(np.pad(ref, ((0, duration + 1 - ref_frames), (0, 0)))[None])
    tids = jnp.asarray(np.pad(text, (0, duration + 1 - len(text)), constant_values=-1)[None])
    del n, pad, b
    noise = jax.random.normal(jax.random.PRNGKey(7), cond.shape, jnp.float32)
    opts = cfm.SampleOptions(steps=args.nfe, time_parallel_window=args.window,
                             picard_tol=args.tol)
    _, info = cfm.sample(params, arch, cond.astype(dtype), tids,
                         jnp.asarray([duration]), noise.astype(dtype),
                         lens=jnp.asarray([ref_frames]), opts=opts,
                         backend="auto" if on_tpu else "sdpa", return_info=True)
    sweeps = int(info["sweeps"])

    seq_tag, pic_tag = "sequential", f"picard_w{args.window}"
    mae = float(np.abs(results[seq_tag]["mel"] - results[pic_tag]["mel"]).mean())
    rep = {
        "metric": f"picard_ab_nfe{args.nfe}_w{args.window}",
        "rtf_sequential": round(results[seq_tag]["rtf"], 5),
        "rtf_picard": round(results[pic_tag]["rtf"], 5),
        "speedup": round(results[seq_tag]["rtf"] / results[pic_tag]["rtf"], 3),
        "sweeps": sweeps,
        "evals_per_step": round(sweeps * min(args.window, args.nfe) / args.nfe, 2),
        "mel_mae": round(mae, 5),
        "tol": args.tol,
    }
    print(json.dumps(rep))


if __name__ == "__main__":
    main()
