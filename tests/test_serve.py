"""Batch serving tests: DP-sharded batches over an 8-device CPU mesh."""

import numpy as np
import jax

from f5_tts_tpu.infer.engine import EngineOptions, InferenceEngine
from f5_tts_tpu.infer.serve import BatchServer, Request, rtf_report
from f5_tts_tpu.models import vocos as V
from f5_tts_tpu.parallel.mesh import make_mesh
from tests.test_pipeline import tiny_model


def _requests(n, d=100, seed=0):
    rng = np.random.default_rng(seed)
    reqs = []
    for i in range(n):
        ref = rng.standard_normal((40 + int(rng.integers(0, 30)), d)).astype(np.float32)
        text = rng.integers(0, 200, size=20 + int(rng.integers(0, 20))).astype(np.int32)
        reqs.append(Request(ref_mel=ref, text_ids=text, duration=int(rng.integers(120, 250)), seed=i))
    return reqs


def test_batch_server_unsharded():
    cfg, params, _, _ = tiny_model()
    eng = InferenceEngine(params, cfg, vocoder_params=V.init(jax.random.PRNGKey(1), V.VocosConfig()),
                          options=EngineOptions(nfe_step=2))
    srv = BatchServer(eng, mesh=None, batch_size=4)
    reqs = _requests(6)
    wavs, lats = srv.run(reqs)
    assert len(wavs) == 6
    for w, r in zip(wavs, reqs):
        assert len(w) > 0 and np.isfinite(w).all()
    rep = rtf_report(wavs, lats)
    assert rep["rtf"] > 0 and rep["latency_ms_p99"] >= rep["latency_ms_p50"]


def test_batch_server_sharded_mesh():
    cfg, params, _, _ = tiny_model()
    eng = InferenceEngine(params, cfg, vocoder_params=V.init(jax.random.PRNGKey(1), V.VocosConfig()),
                          options=EngineOptions(nfe_step=2))
    mesh = make_mesh(data=8, model=1)
    srv = BatchServer(eng, mesh=mesh, batch_size=8)
    reqs = _requests(10)
    wavs, lats = srv.run(reqs)
    assert len(wavs) == 10
    for w in wavs:
        assert np.isfinite(w).all()

    # sharded result == unsharded result for same seeds
    eng2 = InferenceEngine(params, cfg, vocoder_params=V.init(jax.random.PRNGKey(1), V.VocosConfig()),
                           options=EngineOptions(nfe_step=2))
    srv2 = BatchServer(eng2, mesh=None, batch_size=8)
    wavs2, _ = srv2.run(reqs)
    for a, b in zip(wavs, wavs2):
        np.testing.assert_allclose(a, b, atol=2e-4)
