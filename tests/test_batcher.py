"""Online dynamic batcher: concurrent requests share device batches
(reference Triton dynamic_batching, config.pbtxt:15-20) and results are
identical to unbatched engine calls (batch-size-invariant seeding)."""

import threading
import time

import jax
import numpy as np
import pytest

from f5_tts_tpu.infer.batcher import BatchedEngine, DynamicBatcher, _batch_size_ladder
from f5_tts_tpu.infer.engine import EngineOptions, InferenceEngine
from f5_tts_tpu.models import vocos as V
from tests.test_pipeline import tiny_model


def _engine(nfe=2):
    cfg, params, _, _ = tiny_model()
    return InferenceEngine(
        params, cfg, vocoder_params=V.init(jax.random.PRNGKey(1), V.VocosConfig()),
        options=EngineOptions(nfe_step=nfe),
    )


def _reqs(n, d=100, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        ref = rng.standard_normal((40 + int(rng.integers(0, 30)), d)).astype(np.float32)
        text = rng.integers(0, 200, size=20 + int(rng.integers(0, 20))).astype(np.int32)
        out.append((ref, text, int(rng.integers(120, 250)), i))
    return out


def test_batch_size_ladder():
    assert _batch_size_ladder(4) == (1, 2, 4)
    assert _batch_size_ladder(6) == (1, 2, 4, 6)
    assert _batch_size_ladder(1) == (1,)


def test_concurrent_requests_share_batches_and_match_unbatched():
    eng = _engine()
    reqs = _reqs(6)
    # ground truth: one direct engine call per request
    want = []
    for ref, text, dur, seed in reqs:
        _, wavs, _ = eng.generate_batch([ref], [text], [dur], seeds=[seed], fetch_mel=False)
        want.append(wavs[0])

    batcher = DynamicBatcher(eng, max_batch=4, queue_delay_ms=200.0)
    try:
        got = [None] * len(reqs)

        def client(i):
            ref, text, dur, seed = reqs[i]
            wav, gf, _ = batcher.generate(text, dur, seed=seed, ref_mel=ref)
            got[i] = wav

        threads = [threading.Thread(target=client, args=(i,)) for i in range(len(reqs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        stats = batcher.stats()
    finally:
        batcher.close()

    assert stats["requests"] == 6
    # the 200 ms window must have merged concurrent clients into shared batches
    assert stats["batches"] < 6, stats
    assert stats["avg_batch_size"] > 1.0, stats
    for a, b in zip(got, want):
        assert a is not None
        np.testing.assert_allclose(a, b, atol=2e-4)


def test_zero_delay_still_serves():
    eng = _engine()
    batcher = DynamicBatcher(eng, max_batch=4, queue_delay_ms=0.0)
    try:
        ref, text, dur, seed = _reqs(1)[0]
        wav, gf, mel = batcher.generate(text, dur, seed=seed, ref_mel=ref, fetch_mel=True)
        assert len(wav) > 0 and np.isfinite(wav).all()
        assert mel is not None and mel.ndim == 2
    finally:
        batcher.close()


def test_error_paths():
    eng = _engine()
    batcher = DynamicBatcher(eng, max_batch=2, queue_delay_ms=50.0)
    try:
        # out-of-range duration raises synchronously at submit (never in the
        # scheduler thread)
        with pytest.raises(ValueError):
            batcher.submit(np.zeros((5,), np.int32), duration=10**9, seed=0,
                           ref_mel=np.zeros((8, 100), np.float32))
        # an engine failure inside a group fans out to callers and the
        # scheduler survives: mel with a mismatched feature dim blows up in
        # generate_batch's packing
        fut = batcher.submit(np.zeros((5,), np.int32), duration=100, seed=0,
                             ref_mel=np.zeros((8, 7), np.float32))
        with pytest.raises(Exception):
            fut.result(timeout=120)
        ref, text, dur, seed = _reqs(1)[0]
        wav, _, _ = batcher.generate(text, dur, seed=seed, ref_mel=ref)
        assert len(wav) > 0
    finally:
        batcher.close()


def test_submit_validates_ref_args():
    eng = _engine()
    batcher = DynamicBatcher(eng, max_batch=2, queue_delay_ms=0.0)
    try:
        with pytest.raises(ValueError):
            batcher.submit(np.zeros(3, np.int32), 100, ref_mel=None, ref_wav=None)
        with pytest.raises(ValueError):
            batcher.submit(np.zeros(3, np.int32), 100,
                           ref_mel=np.zeros((4, 100), np.float32),
                           ref_wav=np.zeros(100, np.float32))
    finally:
        batcher.close()


def test_batched_engine_forwards_attribute_writes():
    """Writes through the facade must hit the real engine (api.infer sets
    engine.options; BatchServer installs parallel_hooks) — a shadow attribute
    on the facade would silently split the two."""
    import dataclasses

    eng = _engine()
    batcher = DynamicBatcher(eng, max_batch=2, queue_delay_ms=0.0)
    try:
        beng = BatchedEngine(batcher)
        beng.options = dataclasses.replace(eng.options, nfe_step=7)
        assert eng.options.nfe_step == 7  # reached the real engine
        assert beng.options.nfe_step == 7  # and reads see the same object
        assert "options" not in vars(beng)  # no shadow on the facade
    finally:
        batcher.close()


def test_generate_batch_from_wavs_matches_per_row():
    """Per-row-ref fused path == per-request single-ref fused calls."""
    eng = _engine()
    sr = eng.model_cfg.mel.target_sample_rate
    rng = np.random.default_rng(3)
    wavs_ref = [0.3 * rng.standard_normal(int(sr * s)).astype(np.float32) for s in (0.5, 0.8)]
    texts = [rng.integers(0, 200, size=25).astype(np.int32) for _ in range(2)]
    durs = [150, 200]
    _, got, gf = eng.generate_batch_from_wavs(wavs_ref, texts, durs, seeds=[1, 2], fetch_mel=False)
    for i in range(2):
        _, want, _ = eng.generate_batch_from_wav(wavs_ref[i], [texts[i]], [durs[i]],
                                                 seeds=[i + 1], fetch_mel=False)
        np.testing.assert_allclose(got[i], want[0], atol=3e-4)


def test_batched_engine_facade_through_pipeline():
    """BatchedEngine drops into the shared pipeline unchanged and gives the
    same audio as the raw engine."""
    from f5_tts_tpu.infer import pipeline as P

    eng = _engine()
    sr = eng.model_cfg.mel.target_sample_rate
    t = np.arange(int(sr * 0.7)) / sr
    ref_wav = (0.2 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    vocab = {c: i for i, c in enumerate(" abcdefghijklmnopqrstuvwxyz.")}
    opts = P.PipelineOptions(seed=11)

    want, sr1, _ = P.infer_batch_process(
        eng, (ref_wav, sr), "hello there. ", ["general kenobi."], vocab,
        tokenizer="char", opts=opts)

    batcher = DynamicBatcher(eng, max_batch=4, queue_delay_ms=10.0)
    try:
        beng = BatchedEngine(batcher)
        assert beng.model_cfg is eng.model_cfg  # attribute delegation
        got, sr2, _ = P.infer_batch_process(
            beng, (ref_wav, sr), "hello there. ", ["general kenobi."], vocab,
            tokenizer="char", opts=opts)
    finally:
        batcher.close()
    assert sr1 == sr2
    np.testing.assert_allclose(got, want, atol=3e-4)
