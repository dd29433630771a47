"""A/B the int8 W8A8 serving option against dense bf16 on the current device.

Quality gate: mel MAE between the two engines on identical prompts/seeds
must stay under --mel-mae-gate (log-mel units) for the quant config to be
considered shippable.  Prints one JSON line with both RTFs and the MAE.

    PYTHONPATH=. python scripts/quant_ab.py [--nfe 16] [--iters 8]
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
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--mel-mae-gate", type=float, default=0.10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from f5_tts_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    from f5_tts_tpu.infer.engine import EngineOptions, InferenceEngine
    from f5_tts_tpu.models import dit, vocos
    from f5_tts_tpu.models.configs import MODEL_CONFIGS

    model_cfg = MODEL_CONFIGS["F5TTS_v1_Base"]
    on_tpu = any(d.platform != "cpu" for d in jax.devices())
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    params = dit.init(jax.random.PRNGKey(0), model_cfg.arch)
    # random-weight A/B: randomize the zero-init AdaLN/output head so the
    # blocks' (quantized) contribution actually reaches the mel output
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
    for tag, quant in (("bf16", False), ("int8", True)):
        eng = InferenceEngine(params, model_cfg, vocoder_params=voc, dtype=dtype,
                              options=EngineOptions(nfe_step=args.nfe, quantize=quant))
        mels, wavs, _ = eng.generate_batch([ref], [text], [duration], seeds=[0])  # compile
        t0 = time.perf_counter()
        for i in range(args.iters):
            _, wavs, _ = eng.generate_batch([ref], [text], [duration], seeds=[i + 1],
                                            fetch_mel=False)
        wall = (time.perf_counter() - t0) / args.iters
        audio_s = len(wavs[0]) / sr
        results[tag] = {"rtf": wall / audio_s, "mel": mels[0]}
        print(f"{tag}: {wall*1000:.1f} ms/utt -> RTF {wall/audio_s:.4f}", file=sys.stderr)

    mae = float(np.abs(results["bf16"]["mel"] - results["int8"]["mel"]).mean())
    rep = {
        "metric": "quant_ab_nfe%d" % args.nfe,
        "rtf_bf16": round(results["bf16"]["rtf"], 5),
        "rtf_int8": round(results["int8"]["rtf"], 5),
        "speedup": round(results["bf16"]["rtf"] / results["int8"]["rtf"], 3),
        "mel_mae": round(mae, 5),
        "gate": args.mel_mae_gate,
        "pass_quality_gate": mae < args.mel_mae_gate,
    }
    print(json.dumps(rep))


if __name__ == "__main__":
    main()
