"""Request-level latency profile: where do the milliseconds of ONE serving
call go?  (round-3 verdict item #1: p50 415 ms vs reference 253 ms avg,
/root/reference README.md:131-138 Triton client_grpc methodology.)

Phases per request batch:
  assemble  host numpy batch assembly (pad/bucket/clamp)
  upload    device_put of all input arrays, blocked
  compute   jitted sample+decode graph, blocked on device completion
  fetch     np.asarray of the int16 wav (host <-> device bandwidth)

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_request.py [batch] [nfe]
"""

import sys
import time

import numpy as np


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    nfe = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    import jax
    import jax.numpy as jnp

    from f5_tts_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from f5_tts_tpu.infer.engine import (
        EngineOptions, InferenceEngine, _clamp_duration, _sample_and_decode,
    )
    from f5_tts_tpu.models import vocos
    from f5_tts_tpu.models.backbones import get_backbone
    from f5_tts_tpu.models.configs import MODEL_CONFIGS

    model_cfg = MODEL_CONFIGS["F5TTS_v1_Base"]
    backbone = get_backbone(model_cfg.arch)
    params = backbone.init(jax.random.PRNGKey(0), model_cfg.arch)
    voc = vocos.init(jax.random.PRNGKey(1))
    engine = InferenceEngine(params, model_cfg, vocoder_params=voc, dtype=jnp.bfloat16,
                             options=EngineOptions(nfe_step=nfe))

    rng = np.random.default_rng(0)
    d = model_cfg.mel.n_mel_channels

    def one_profile(n_bucket, durs):
        b = len(durs)
        ref_mels = [rng.standard_normal((250, d)).astype(np.float32) for _ in range(b)]
        texts = [rng.integers(0, 2545, size=150).astype(np.int32) for _ in range(b)]

        t0 = time.perf_counter()
        cond = np.zeros((b, n_bucket, d), np.float32)
        lens = np.zeros((b,), np.int32)
        text_ids = np.full((b, n_bucket), -1, np.int32)
        for i, (m, t) in enumerate(zip(ref_mels, texts)):
            cond[i, : len(m)] = m
            lens[i] = len(m)
            text_ids[i, : len(t)] = t
        duration = _clamp_duration(np.asarray(durs, np.int32), text_ids, lens, n_bucket)
        seeds = np.arange(b, dtype=np.int32)
        t1 = time.perf_counter()

        dev_in = [
            jnp.asarray(cond, dtype=engine.dtype),
            jnp.asarray(text_ids),
            jnp.asarray(lens),
            jnp.asarray(duration),
            jnp.asarray(seeds),
        ]
        jax.block_until_ready(dev_in)
        t2 = time.perf_counter()

        mel_out, wav = _sample_and_decode(
            engine.dit_params, engine.vocoder_params, engine.model_cfg, engine.options,
            *dev_in, decode=True, vocoder_type=engine.vocoder_type,
            vocoder_cfg=engine.vocoder_cfg, hooks=engine.parallel_hooks,
        )
        wav.block_until_ready()
        t3 = time.perf_counter()

        wav_np = np.asarray(wav)
        t4 = time.perf_counter()
        bytes_up = sum(int(np.asarray(x).nbytes) for x in [cond.astype(np.float16), text_ids, lens, duration, seeds])
        # cond ships as bf16 (2 bytes) — use fp16 nbytes as the same-size proxy
        return {
            "assemble_ms": (t1 - t0) * 1e3,
            "upload_ms": (t2 - t1) * 1e3,
            "compute_ms": (t3 - t2) * 1e3,
            "fetch_ms": (t4 - t3) * 1e3,
            "total_ms": (t4 - t0) * 1e3,
            "upload_bytes": bytes_up,
            "fetch_bytes": int(wav_np.nbytes),
        }

    for n_bucket in (768, 1024):
        durs = [n_bucket - 10] * batch
        one_profile(n_bucket, durs)  # warm (compile or cache load)
        rows = [one_profile(n_bucket, durs) for _ in range(5)]
        med = {k: float(np.median([r[k] for r in rows])) for k in rows[0]}
        print(f"bucket {n_bucket} batch {batch} nfe {nfe}:")
        for k, v in med.items():
            unit = "B" if k.endswith("bytes") else "ms"
            print(f"  {k:>14}: {v:9.1f} {unit}")


if __name__ == "__main__":
    main()
