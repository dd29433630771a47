"""Build AOT serving artifacts — the TRT-LLM `trtllm-build` stage analog.

Traces the fused text->waveform graph at the requested operating points and
serializes StableHLO artifacts (runtime/aot.py).  Runs on any host: TPU
artifacts cross-lower from a CPU-only build box.

    python scripts/build_engine.py --out artifacts/ \
        --model F5TTS_v1_Base --ckpt model.safetensors --vocoder vocos.bin \
        --batches 1 2 --buckets 1024 --ref-buckets 512 --platforms tpu
"""

import argparse
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--model", default="F5TTS_v1_Base")
    ap.add_argument("--ckpt", default="", help="checkpoint (.pt/.safetensors/.npz); random if empty")
    ap.add_argument("--vocoder", default="", help="vocoder weights; random if empty")
    ap.add_argument("--nfe", type=int, default=16)
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 2])
    ap.add_argument("--buckets", type=int, nargs="+", default=[1024])
    ap.add_argument("--ref-buckets", type=int, nargs="+", default=[512])
    ap.add_argument("--platforms", nargs="+", default=["tpu"])
    ap.add_argument("--cpu-build", action="store_true",
                    help="force the CPU backend for the build process itself")
    args = ap.parse_args()

    import jax

    if args.cpu_build:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from f5_tts_tpu.infer.engine import EngineOptions, InferenceEngine
    from f5_tts_tpu.models import vocos
    from f5_tts_tpu.models.backbones import get_backbone
    from f5_tts_tpu.models.configs import MODEL_CONFIGS
    from f5_tts_tpu.runtime.aot import default_specs, export_engine
    from f5_tts_tpu.utils import ckpt as ckpt_util

    model_cfg = MODEL_CONFIGS[args.model]
    backbone = get_backbone(model_cfg.arch)
    if args.ckpt:
        state = ckpt_util.load_torch_state(args.ckpt, use_ema=True)
        params = ckpt_util.params_from_state(state, model_cfg.arch)
    else:
        params = backbone.init(jax.random.PRNGKey(0), model_cfg.arch)
    if args.vocoder:
        vstate = ckpt_util.load_torch_state(args.vocoder, use_ema=False)
        voc = ckpt_util.vocos_params_from_state(vstate)
    else:
        voc = vocos.init(jax.random.PRNGKey(1))

    dtype = jnp.bfloat16 if "tpu" in args.platforms else jnp.float32
    eng = InferenceEngine(params, model_cfg, vocoder_params=voc, dtype=dtype,
                          options=EngineOptions(nfe_step=args.nfe))
    specs = default_specs(args.batches, args.buckets, args.ref_buckets)
    names = export_engine(eng, args.out, specs, platforms=tuple(args.platforms))
    print(f"wrote {len(names)} artifacts to {args.out}:")
    for n in names:
        print(" ", n)


if __name__ == "__main__":
    main()
