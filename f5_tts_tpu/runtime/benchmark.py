"""Offline serving benchmark with same-harness backend comparison
(reference runtime/triton_trtllm/benchmark.py: --backend-type trt|pytorch).

Here the comparison axes are the attention backend (Pallas ``flash`` vs XLA
``sdpa``) and dtype — same harness, same prompts, RTF + DiT/vocoder time split.

    python -m f5_tts_tpu.runtime.benchmark --backend-type flash --nfe 16
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--backend-type", default="flash", choices=["flash", "sdpa"])
    p.add_argument("--dtype", default="auto", choices=["auto", "bf16", "fp32"])
    p.add_argument("--model", default="F5TTS_v1_Base")
    p.add_argument("--ckpt_file", default="")
    p.add_argument("--vocoder_local_path", default=None)
    p.add_argument("--nfe", type=int, default=16)
    p.add_argument("--num-prompts", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--output", default=None, help="write rtf report json here")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from f5_tts_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from f5_tts_tpu.infer.engine import EngineOptions, InferenceEngine
    from f5_tts_tpu.infer.serve import BatchServer, Request, rtf_report
    from f5_tts_tpu.models import vocos
    from f5_tts_tpu.models.backbones import get_backbone
    from f5_tts_tpu.models.configs import MODEL_CONFIGS
    from f5_tts_tpu.utils import ckpt as ckpt_util

    model_cfg = MODEL_CONFIGS[args.model]
    backbone = get_backbone(model_cfg.arch)
    if args.ckpt_file:
        state = ckpt_util.load_torch_state(args.ckpt_file)
        params = ckpt_util.params_from_state(state, model_cfg.arch)
    else:
        params = backbone.init(jax.random.PRNGKey(0), model_cfg.arch)
    if args.vocoder_local_path:
        voc = ckpt_util.vocos_params_from_state(ckpt_util.load_torch_state(args.vocoder_local_path))
    else:
        voc = vocos.init(jax.random.PRNGKey(1))

    on_tpu = any(d.platform != "cpu" for d in jax.devices())
    dtype = {"bf16": jnp.bfloat16, "fp32": jnp.float32}.get(
        args.dtype, jnp.bfloat16 if on_tpu else jnp.float32
    )
    engine = InferenceEngine(
        params, model_cfg, vocoder_params=voc, dtype=dtype,
        options=EngineOptions(nfe_step=args.nfe, backend=args.backend_type),
    )

    rng = np.random.default_rng(0)
    reqs = []
    for i in range(args.num_prompts):
        ref = rng.standard_normal((int(rng.integers(200, 300)), model_cfg.mel.n_mel_channels)).astype(np.float32)
        text = rng.integers(0, 2545, size=int(rng.integers(80, 200))).astype(np.int32)
        reqs.append(Request(ref_mel=ref, text_ids=text, duration=int(rng.integers(500, 1020)), seed=i))

    srv = BatchServer(engine, mesh=None, batch_size=args.batch_size)
    # warm with a full pass: compiles every (bucket, batch) graph AND the
    # per-crop-length fetch slices the request set will hit (a production
    # server is warm; first-hit compile walls are deployment one-offs)
    srv.run(reqs, overlap=1)
    t0 = time.perf_counter()
    wavs, lats = srv.run(reqs, overlap=2)
    wall = time.perf_counter() - t0
    rep = rtf_report(wavs, lats, model_cfg.mel.target_sample_rate)
    rep["wall_s"] = wall
    rep["wall_rtf"] = wall / rep["total_audio_s"]
    rep["backend"] = args.backend_type
    rep["nfe"] = args.nfe
    print(json.dumps(rep, indent=2))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(rep, f, indent=2)
    return rep


if __name__ == "__main__":
    main()
