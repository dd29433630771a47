"""Pre-compile serving graphs into the persistent compilation cache.

Run once per deployment (or bake into the image) so production servers start
with zero cold-start compiles:

    JAX_COMPILATION_CACHE_DIR=/var/cache/jax python scripts/warmup_cache.py \
        --model F5TTS_v1_Base --nfe 16 32 --buckets 512 1024 2048 --batch 1 2
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="F5TTS_v1_Base")
    p.add_argument("--nfe", type=int, nargs="+", default=[16, 32])
    p.add_argument("--buckets", type=int, nargs="+", default=[512, 1024])
    p.add_argument("--batch", type=int, nargs="+", default=[1])
    p.add_argument("--cache_dir", default=None,
                   help="persistent cache location (default: the durable "
                   "location from f5_tts_tpu.utils.compile_cache)")
    args = p.parse_args()

    import jax  # noqa: F401  (backend init before engine imports)
    import jax.numpy as jnp

    from f5_tts_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache(args.cache_dir)

    from f5_tts_tpu.infer.engine import EngineOptions, InferenceEngine
    from f5_tts_tpu.models import vocos
    from f5_tts_tpu.models.backbones import get_backbone
    from f5_tts_tpu.models.configs import MODEL_CONFIGS

    model_cfg = MODEL_CONFIGS[args.model]
    backbone = get_backbone(model_cfg.arch)
    params = backbone.init(jax.random.PRNGKey(0), model_cfg.arch)
    voc = vocos.init(jax.random.PRNGKey(1))
    on_tpu = any(d.platform != "cpu" for d in jax.devices())
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    for nfe in args.nfe:
        eng = InferenceEngine(params, model_cfg, vocoder_params=voc, dtype=dtype,
                              options=EngineOptions(nfe_step=nfe))
        t0 = time.perf_counter()
        eng.warmup_all(buckets=args.buckets, batch_sizes=tuple(args.batch))
        print(f"nfe={nfe}: warmed {len(args.buckets)}x{len(args.batch)} graphs "
              f"in {time.perf_counter() - t0:.1f}s")


if __name__ == "__main__":
    main()
