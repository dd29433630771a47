"""RTF benchmark — the driver runs this on real TPU hardware.

Measures the flagship operating point from BASELINE.md: F5TTS_v1_Base DiT +
Vocos, NFE=16 (EPSS + sway), fused-CFG Euler loop, bfloat16, single chip.
RTF = wall-clock / generated audio seconds (reference
runtime/triton_trtllm/benchmark.py:454-457).  Baseline to beat: 0.0402
(offline TRT-LLM on L20).

Prints ONE json line.  Primary fields {"metric", "value", "unit",
"vs_baseline"} are the conc-2 RTF; extra fields surface the numbers the
round-3 verdict asked for (reference client_grpc.py:292-303,432-440
methodology): 26-prompt serving latency p50/mean, streaming TTFB, cold-start
compile time, and MFU on the single stated basis (f5_tts_tpu/utils/flops.py:
2*m*n*k matmuls + attention QK^T/PV, fused-CFG counted as executed;
v5e bf16 peak 197 TFLOP/s).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_RTF = 0.0402  # L20 offline TRT-LLM, NFE=16 (reference README.md:131-138)
BASELINE_LATENCY_MS = 253.0  # reference avg latency, client_grpc concurrency 1
BASELINE_TTFB_MS = 253.0  # reference has no streaming TTFB; its full-utterance avg


def main():
    import jax
    import jax.numpy as jnp

    from f5_tts_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    from f5_tts_tpu.infer.engine import EngineOptions, InferenceEngine
    from f5_tts_tpu.models import dit, vocos
    from f5_tts_tpu.models.configs import MODEL_CONFIGS
    from f5_tts_tpu.utils.flops import V5E_BF16_PEAK_FLOPS, sampling_flops

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
    serial_rtf = serial_wall / audio_s
    print(f"serial: {serial_wall*1000:.1f} ms/utt -> RTF {serial_rtf:.4f}", file=sys.stderr)

    # concurrency-2 pipelined RTF — matches the reference's headline config
    # (client-server concurrency 2, reference README.md:131-138): dispatch of
    # utterance i+1 overlaps the host fetch of utterance i.
    from concurrent.futures import ThreadPoolExecutor

    n_conc = 12 if on_tpu else 2
    with ThreadPoolExecutor(max_workers=2) as ex:
        t0 = time.perf_counter()
        results = list(ex.map(run, range(100, 100 + n_conc)))
        pipelined_wall = (time.perf_counter() - t0) / n_conc
    total_audio = sum(len(w) for w in results) / sr
    rtf = (pipelined_wall * n_conc) / total_audio
    print(f"concurrency-2: {pipelined_wall*1000:.1f} ms/utt -> RTF {rtf:.4f}", file=sys.stderr)

    # MFU on the repo-wide basis (utils/flops.py module doc): executed model
    # FLOPs of one engine call (NFE x fused-CFG backbone + vocoder at the
    # padded bucket) over the pipelined per-utterance wall.
    bucket = 1024 if on_tpu else 256
    utt_flops = sampling_flops(model_cfg, nfe=16, n_frames=bucket, batch=1)
    tflops = utt_flops / pipelined_wall / 1e12
    mfu_pct = 100.0 * utt_flops / pipelined_wall / V5E_BF16_PEAK_FLOPS
    print(f"MFU (conc-2 e2e): {tflops:.1f} TFLOP/s = {mfu_pct:.1f}% of v5e bf16 peak",
          file=sys.stderr)

    # 26-prompt mixed-duration serving latency at batch 1 (the verdict-#1
    # operating point; reference client_grpc.py latency percentile report).
    # Secondary sections are guarded: a failure here must not cost the driver
    # the primary RTF json line.
    import traceback

    p50_ms = mean_ms = serve_rtf = None
    try:
        from f5_tts_tpu.infer.serve import BatchServer, Request, rtf_report

        n_prompts = 26 if on_tpu else 4
        prng = np.random.default_rng(0)
        reqs = []
        for i in range(n_prompts):
            ref = prng.standard_normal((int(prng.integers(200, 300)), model_cfg.mel.n_mel_channels)).astype(np.float32)
            text = prng.integers(0, 2545, size=int(prng.integers(80, 200))).astype(np.int32)
            dur = int(prng.integers(500, 1020)) if on_tpu else int(prng.integers(150, 250))
            reqs.append(Request(ref_mel=ref, text_ids=text, duration=dur, seed=i))
        srv = BatchServer(engine, mesh=None, batch_size=1)
        srv.run(reqs, overlap=1)  # warm every (bucket, crop) this set hits
        t0 = time.perf_counter()
        wavs, lats = srv.run(reqs, overlap=2)
        serve_wall = time.perf_counter() - t0
        rep = rtf_report(wavs, lats, sr)
        p50_ms, mean_ms = rep["latency_ms_p50"], rep["latency_ms_mean"]
        serve_rtf = serve_wall / rep["total_audio_s"]
        print(f"serving {n_prompts}-prompt b1: p50 {p50_ms:.0f} ms, "
              f"p99 {rep['latency_ms_p99']:.0f} ms, mean {mean_ms:.0f} ms, "
              f"wall RTF {serve_rtf:.4f}", file=sys.stderr)
    except Exception:
        traceback.print_exc()
        print("serving-latency section failed; continuing", file=sys.stderr)

    # the same prompt set through the DYNAMIC BATCHER (infer/batcher.py, the
    # Triton dynamic-batching equivalent) under concurrent mixed-length
    # clients — the reference measures this operating point with
    # client_grpc.py concurrent tasks (:292-303) and reports the latency
    # percentile ladder (:432-440).
    batched = None
    try:
        from concurrent.futures import ThreadPoolExecutor

        from f5_tts_tpu.infer.batcher import DynamicBatcher

        batcher = DynamicBatcher(engine, max_batch=2, queue_delay_ms=4.0)
        # warm the b=2 graph of every bucket this set hits (b=1 graphs are
        # warm from the section above): two same-bucket submits inside one
        # queue window group into a padded batch-2 engine call
        from f5_tts_tpu.infer.engine import pick_bucket

        warm_ref = prng.standard_normal((64, model_cfg.mel.n_mel_channels)).astype(np.float32)
        for bucket in sorted({pick_bucket(r.duration, engine.buckets) for r in reqs}):
            futs = [batcher.submit(reqs[0].text_ids, bucket - 1, seed=i, ref_mel=warm_ref)
                    for i in range(2)]
            for f in futs:
                f.result()

        n_clients = 4
        req_lat: list[float] = []
        req_audio: list[float] = []

        def client(idx):
            # each client walks its own mixed-length slice, sequentially —
            # cross-client concurrency is what the batcher merges
            for i in range(idx, len(reqs), n_clients):
                r = reqs[i]
                t1 = time.perf_counter()
                wav, gen_frames, _ = batcher.generate(
                    r.text_ids, r.duration, seed=r.seed, ref_mel=r.ref_mel)
                req_lat.append(time.perf_counter() - t1)
                req_audio.append(len(wav) / sr)

        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=n_clients) as ex:
            list(ex.map(client, range(n_clients)))
        bat_wall = time.perf_counter() - t0
        stats = batcher.stats()
        batcher.close()
        rep_b = rtf_report([np.zeros(int(a * sr), np.float32) for a in req_audio],
                           req_lat, sr)
        batched = {
            "batched_serving_rtf": round(bat_wall / max(sum(req_audio), 1e-9), 5),
            "latency_p90_ms": round(rep_b["latency_ms_p90"], 1),
            "latency_p95_ms": round(rep_b["latency_ms_p95"], 1),
            "latency_p99_ms": round(rep_b["latency_ms_p99"], 1),
            "batched_latency_p50_ms": round(rep_b["latency_ms_p50"], 1),
            "batcher_avg_batch_size": round(stats["avg_batch_size"], 2),
            "batcher_queue_ms_avg": round(stats["queue_ms_avg"], 1),
        }
        print(f"batched serving ({n_clients} clients, max_batch 2): "
              f"RTF {batched['batched_serving_rtf']:.4f}, "
              f"p50 {batched['batched_latency_p50_ms']:.0f} / "
              f"p99 {batched['latency_p99_ms']:.0f} ms, "
              f"avg batch {batched['batcher_avg_batch_size']:.2f}", file=sys.stderr)
    except Exception:
        traceback.print_exc()
        print("batched-serving section failed; continuing", file=sys.stderr)

    # streaming TTFB through the real chunked pipeline (socket-server path)
    ttfb_ms = None
    try:
        from f5_tts_tpu.infer import pipeline as P
        from f5_tts_tpu.text.chunk import chunk_text
        from f5_tts_tpu.text.tokenizer import get_tokenizer

        vocab, _ = get_tokenizer(None, model_cfg.tokenizer)
        t_ax = np.arange(int(3.0 * sr)) / sr
        ref_wav = (0.1 * np.sin(2 * np.pi * 220.0 * t_ax)).astype(np.float32)
        ref_text = "Some call me nature, others call me mother nature."
        gen_text = (
            "The quick brown fox jumps over the lazy dog while the morning sun "
            "rises slowly over the quiet valley, and the river keeps rolling "
            "toward the distant sea as birds begin to sing in the old oak trees."
        )
        # first package shrunk for TTFB, like the socket server
        # (socket_server.py generate_stream: hard word-boundary split to
        # max_chars//4 so a long clause can't promote the first chunk's bucket)
        first = chunk_text(gen_text, max_chars=135)
        batches = chunk_text(first[0], max_chars=135 // 4, hard_max=True) + first[1:]

        def ttfb_once():
            gen = P.infer_batch_process(
                engine, (ref_wav, sr), ref_text, batches, vocab,
                tokenizer=model_cfg.tokenizer, streaming=True, chunk_size=2048,
            )
            t0 = time.perf_counter()
            next(iter(gen))
            dt = time.perf_counter() - t0
            gen.close()
            return dt

        ttfb_once()  # warm the first-chunk bucket graph
        ttfb_ms = float(np.median([ttfb_once() for _ in range(3)]) * 1000)
        print(f"streaming TTFB: {ttfb_ms:.0f} ms", file=sys.stderr)
    except Exception:
        traceback.print_exc()
        print("streaming-TTFB section failed; continuing", file=sys.stderr)

    out = {
        "metric": "rtf_nfe16_vocos_conc2",
        "value": round(rtf, 5),
        "unit": "wall_s_per_audio_s",
        "vs_baseline": round(BASELINE_RTF / rtf, 3),
        "serial_rtf": round(serial_rtf, 5),
        "cold_start_s": round(compile_s, 1),
        "model_tflops_per_s": round(tflops, 1),
        "mfu_pct": round(mfu_pct, 1),
    }
    if p50_ms is not None:
        out.update({
            "latency_p50_ms": round(p50_ms, 1),
            "latency_mean_ms": round(mean_ms, 1),
            "latency_vs_baseline": round(BASELINE_LATENCY_MS / mean_ms, 3),
            "serving_rtf_b1": round(serve_rtf, 5),
        })
    if batched is not None:
        out.update(batched)
    if ttfb_ms is not None:
        out["ttfb_ms"] = round(ttfb_ms, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
