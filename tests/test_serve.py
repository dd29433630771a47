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

    # overlapped batches under a mesh (thread-local mesh context entered per
    # worker) give the same results as serial execution
    wavs3, _ = srv.run(reqs, overlap=2)
    for a, b in zip(wavs3, wavs):
        np.testing.assert_allclose(a, b, atol=2e-6)


def test_http_server_roundtrip(tmp_path):
    import threading
    import time as _time

    from http.server import ThreadingHTTPServer

    from f5_tts_tpu.audio.io import save_wav
    from f5_tts_tpu.infer.api import F5TTS
    from f5_tts_tpu.infer import http_server as H
    from f5_tts_tpu.audio.preprocess import preprocess_ref_audio_text

    sr = 24000
    t = np.arange(int(sr * 1.2)) / sr
    ref_path = str(tmp_path / "ref.wav")
    save_wav(ref_path, 0.2 * np.sin(2 * np.pi * 220 * t), sr)

    tts = F5TTS(model="F5TTS_Tiny", init_random=True, nfe_step=2, device="cpu")
    ref, text = preprocess_ref_audio_text(ref_path, "a simple tone reference.")
    handler = H.make_handler(tts, ref, text, threading.Lock())
    server = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    port = server.server_address[1]
    th = threading.Thread(target=server.serve_forever, daemon=True)
    th.start()
    _time.sleep(0.2)
    try:
        wav, out_sr = H.request_tts("make me some audio via http.", "127.0.0.1", port, seed=5)
        assert out_sr == sr and len(wav) > 1000 and np.isfinite(wav).all()
    finally:
        server.shutdown()


def test_duplicate_test_sampler_path():
    import jax.numpy as jnp

    from f5_tts_tpu.models import cfm as C
    from tests.test_dit import SMALL, make_params

    cfg = SMALL
    params = make_params(cfg)
    rng = np.random.default_rng(9)
    b, n = 1, 48
    cond = rng.standard_normal((b, n, cfg.mel_dim)).astype(np.float32)
    text = rng.integers(0, cfg.text_num_embeds, (b, 8)).astype(np.int32)
    out = C.sample(params, cfg, jnp.asarray(cond), jnp.asarray(text),
                   jnp.asarray(np.array([40], np.int32)),
                   jnp.asarray(rng.standard_normal((b, n, cfg.mel_dim)).astype(np.float32)),
                   lens=jnp.asarray(np.array([10], np.int32)),
                   opts=C.SampleOptions(steps=3, t_start=0.1, use_epss=False),
                   duplicate_test=True, backend="sdpa")
    assert np.isfinite(np.asarray(out)).all()


def test_runtime_benchmark_tiny():
    from f5_tts_tpu.runtime import benchmark as RB

    rep = RB.main([
        "--model", "F5TTS_Tiny", "--backend-type", "sdpa", "--dtype", "fp32",
        "--nfe", "2", "--num-prompts", "3", "--batch-size", "2",
    ])
    assert rep["rtf"] > 0 and rep["total_audio_s"] > 0
    assert rep["backend"] == "sdpa"


def test_tensor_parallel_inference_matches_replicated():
    """DiT inference with Megatron-style TP param sharding over a model-axis
    mesh must match the unsharded result (XLA inserts the all-reduces)."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from f5_tts_tpu.models import dit as D
    from f5_tts_tpu.models.configs import DiTConfig
    from f5_tts_tpu.parallel.mesh import dit_param_specs, make_mesh, shard_params

    cfg = DiTConfig(dim=64, depth=2, heads=4, dim_head=16, ff_mult=2, mel_dim=10,
                    text_num_embeds=40, text_dim=24, conv_layers=1, max_pos=128)
    params = D.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(3)
    b, n = 2, 32
    x = jnp.asarray(rng.standard_normal((b, n, cfg.mel_dim)).astype(np.float32))
    cond = jnp.asarray(rng.standard_normal((b, n, cfg.mel_dim)).astype(np.float32))
    text = jnp.asarray(rng.integers(0, 40, (b, 8)).astype(np.int32))
    time_ = jnp.asarray(np.array([0.3, 0.8], np.float32))

    want = np.asarray(D.forward_with_text(params, cfg, x, cond, text, time_, backend="sdpa"))

    mesh = make_mesh(data=2, model=4)
    specs = dit_param_specs(params)
    sharded = shard_params(params, mesh, specs)
    data_sh = NamedSharding(mesh, P("data"))
    xb = jax.device_put(x, data_sh)
    cb = jax.device_put(cond, data_sh)
    tb = jax.device_put(text, data_sh)
    tt = jax.device_put(time_, data_sh)
    with mesh:
        got = np.asarray(
            jax.jit(lambda p, a, c, t, ti: D.forward_with_text(p, cfg, a, c, t, ti, backend="sdpa"))(
                sharded, xb, cb, tb, tt
            )
        )
    np.testing.assert_allclose(got, want, atol=5e-5)


def test_batch_server_sequence_parallel_matches_plain():
    """Context-parallel serving (frame axis sharded over the 'seq' mesh axis)
    must reproduce the plain server's waveforms."""
    from f5_tts_tpu.models import vocos as V2
    from f5_tts_tpu.parallel.mesh import make_train_mesh
    from tests.test_pipeline import tiny_model as _tiny

    cfg, params, _, _ = _tiny()
    voc = V2.init(jax.random.PRNGKey(1), V2.VocosConfig())
    reqs = _requests(4)

    eng_plain = InferenceEngine(params, cfg, vocoder_params=voc, options=EngineOptions(nfe_step=2))
    wav_plain, _ = BatchServer(eng_plain, mesh=None, batch_size=2).run(reqs, overlap=1)

    mesh = make_train_mesh(data=2, model=1, seq=4)
    eng_sp = InferenceEngine(params, cfg, vocoder_params=voc, options=EngineOptions(nfe_step=2))
    srv = BatchServer(eng_sp, mesh=mesh, batch_size=2, sequence_parallel=True)
    assert eng_sp.parallel_hooks[1] is not None
    wav_sp, _ = srv.run(reqs, overlap=1)
    for a, b in zip(wav_plain, wav_sp):
        np.testing.assert_allclose(a, b, atol=3e-4)


def test_tensor_parallel_unett_and_mmdit_match_replicated():
    """backbone_param_specs generalizes TP beyond DiT: UNetT (scan-stacked
    'first'/'second' halves) and MMDiT (dual-stream *_c projections, ff_x/ff_c)
    sharded over the model axis must match unsharded numerics."""
    import jax.numpy as jnp

    from f5_tts_tpu.models import mmdit as M
    from f5_tts_tpu.models import unett as U
    from f5_tts_tpu.models.configs import MMDiTConfig, UNetTConfig
    from f5_tts_tpu.parallel.mesh import backbone_param_specs, make_mesh, shard_params

    rng = np.random.default_rng(3)
    b, n = 2, 32
    mesh = make_mesh(data=1, model=4)

    ucfg = UNetTConfig(dim=64, depth=4, heads=4, dim_head=16, ff_mult=2, mel_dim=10,
                       text_num_embeds=40, text_dim=24, max_pos=128)
    uparams = U.init(jax.random.PRNGKey(0), ucfg)
    x = jnp.asarray(rng.standard_normal((b, n, ucfg.mel_dim)).astype(np.float32))
    cond = jnp.asarray(rng.standard_normal((b, n, ucfg.mel_dim)).astype(np.float32))
    text = jnp.asarray(rng.integers(0, 40, (b, 8)).astype(np.int32))
    time_ = jnp.asarray(np.array([0.3, 0.8], np.float32))
    want = np.asarray(U.forward_with_text(uparams, ucfg, x, cond, text, time_, backend="sdpa"))
    usharded = shard_params(uparams, mesh, backbone_param_specs(uparams))
    with mesh:
        got = np.asarray(jax.jit(
            lambda p: U.forward_with_text(p, ucfg, x, cond, text, time_, backend="sdpa"))(usharded))
    np.testing.assert_allclose(got, want, atol=5e-5)

    mcfg = MMDiTConfig(dim=64, depth=2, heads=4, dim_head=16, ff_mult=2, mel_dim=10,
                       text_num_embeds=40)
    mparams = M.init(jax.random.PRNGKey(0), mcfg)
    xm = jnp.asarray(rng.standard_normal((b, n, mcfg.mel_dim)).astype(np.float32))
    cm = jnp.asarray(rng.standard_normal((b, n, mcfg.mel_dim)).astype(np.float32))
    want_m = np.asarray(M.forward_with_text(mparams, mcfg, xm, cm, text, time_, backend="sdpa"))
    msharded = shard_params(mparams, mesh, backbone_param_specs(mparams))
    with mesh:
        got_m = np.asarray(jax.jit(
            lambda p: M.forward_with_text(p, mcfg, xm, cm, text, time_, backend="sdpa"))(msharded))
    np.testing.assert_allclose(got_m, want_m, atol=5e-5)


def test_batch_server_tensor_parallel_matches_replicated():
    """dp x tp BatchServer (Megatron weight sharding) vs plain server."""
    from f5_tts_tpu.models import vocos as V2
    from f5_tts_tpu.parallel.mesh import make_mesh
    from tests.test_pipeline import tiny_model as _tiny

    cfg, params, _, _ = _tiny()
    voc = V2.init(jax.random.PRNGKey(1), V2.VocosConfig())
    reqs = _requests(4)

    eng_plain = InferenceEngine(params, cfg, vocoder_params=voc, options=EngineOptions(nfe_step=2))
    wav_plain, _ = BatchServer(eng_plain, mesh=None, batch_size=2).run(reqs, overlap=1)

    mesh = make_mesh(data=2, model=4)
    eng_tp = InferenceEngine(params, cfg, vocoder_params=voc,
                             options=EngineOptions(nfe_step=2), fuse_qkv=False)
    srv = BatchServer(eng_tp, mesh=mesh, batch_size=2, tensor_parallel=True)
    wav_tp, _ = srv.run(reqs, overlap=1)
    for a, b in zip(wav_plain, wav_tp):
        np.testing.assert_allclose(a, b, atol=3e-4)
