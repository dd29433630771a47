"""RTF benchmark — the driver runs this on real TPU hardware.

Measures the flagship operating point from BASELINE.md: F5TTS_v1_Base DiT +
Vocos, NFE=16 (EPSS + sway), fused-CFG Euler loop, bfloat16, single chip.
RTF = wall-clock / generated audio seconds (reference
runtime/triton_trtllm/benchmark.py:454-457).  Baseline to beat: 0.0402
(offline TRT-LLM on L20).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_RTF = 0.0402  # L20 offline TRT-LLM, NFE=16 (reference README.md:131-138)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from f5_tts_tpu.infer.engine import EngineOptions, InferenceEngine
    from f5_tts_tpu.models import dit, vocos
    from f5_tts_tpu.models.configs import MODEL_CONFIGS

    model_cfg = MODEL_CONFIGS["F5TTS_v1_Base"]
    on_tpu = any(d.platform != "cpu" for d in jax.devices())
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    print(f"devices: {jax.devices()}, dtype: {dtype.__name__}", file=sys.stderr)

    params = dit.init(jax.random.PRNGKey(0), model_cfg.arch)
    voc_params = vocos.init(jax.random.PRNGKey(1))
    engine = InferenceEngine(
        params, model_cfg, vocoder_params=voc_params, dtype=dtype,
        options=EngineOptions(nfe_step=16),
    )

    # operating point: 3 s reference prompt, ~7.9 s generated (1024-frame bucket)
    hop = model_cfg.mel.hop_length
    sr = model_cfg.mel.target_sample_rate
    rng = np.random.default_rng(0)
    if on_tpu:
        ref_frames, duration, n_iter = 282, 1023, 10
    else:  # CPU smoke fallback so the bench never wedges without a TPU
        ref_frames, duration, n_iter = 64, 255, 2
    ref_mel = rng.standard_normal((ref_frames, model_cfg.mel.n_mel_channels)).astype(np.float32)
    text_ids = rng.integers(0, 2545, size=min(180, duration // 2)).astype(np.int32)

    def run(seed):
        mels, wavs, gen_frames = engine.generate_batch(
            [ref_mel], [text_ids], [duration], seeds=[seed], fetch_mel=False
        )
        return wavs[0]

    # warmup/compile
    t0 = time.perf_counter()
    wav = run(0)
    compile_s = time.perf_counter() - t0
    print(f"compile+first run: {compile_s:.1f}s, wav {len(wav)/sr:.2f}s", file=sys.stderr)
    audio_s = len(wav) / sr

    # serial (single-stream latency) RTF
    t0 = time.perf_counter()
    for i in range(n_iter):
        wav = run(i + 1)
    serial_wall = (time.perf_counter() - t0) / n_iter
    print(f"serial: {serial_wall*1000:.1f} ms/utt -> RTF {serial_wall/audio_s:.4f}", file=sys.stderr)

    # concurrency-2 pipelined RTF — matches the reference's headline config
    # (client-server concurrency 2, reference README.md:131-138): dispatch of
    # utterance i+1 overlaps the host fetch of utterance i.
    from concurrent.futures import ThreadPoolExecutor

    n_iter = 12 if on_tpu else 2
    with ThreadPoolExecutor(max_workers=2) as ex:
        t0 = time.perf_counter()
        results = list(ex.map(run, range(100, 100 + n_iter)))
        pipelined_wall = (time.perf_counter() - t0) / n_iter
    total_audio = sum(len(w) for w in results) / sr
    rtf = (pipelined_wall * n_iter) / total_audio
    print(f"concurrency-2: {pipelined_wall*1000:.1f} ms/utt -> RTF {rtf:.4f}", file=sys.stderr)

    print(json.dumps({
        "metric": "rtf_nfe16_vocos_conc2",
        "value": round(rtf, 5),
        "unit": "wall_s_per_audio_s",
        "vs_baseline": round(BASELINE_RTF / rtf, 3),
    }))


if __name__ == "__main__":
    main()
