"""Edge cases and module health checks."""

import importlib
import pkgutil

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import f5_tts_tpu


def test_import_every_module():
    """Every module imports cleanly (no circulars, no hard deps on optional
    packages at import time)."""
    skipped = {"f5_tts_tpu.infer.gradio_app", "f5_tts_tpu.train.finetune_gradio"}
    failures = []
    for mod in pkgutil.walk_packages(f5_tts_tpu.__path__, prefix="f5_tts_tpu."):
        name = mod.name
        try:
            importlib.import_module(name)
        except Exception as e:  # noqa: BLE001
            failures.append((name, repr(e)))
    assert not failures, failures


def test_chunk_text_edge_cases():
    from f5_tts_tpu.text.chunk import chunk_text

    assert chunk_text("") == []
    assert chunk_text("   ") == []
    assert chunk_text("x") == ["x"]
    # single sentence longer than budget still emitted
    long_sentence = "word " * 100
    chunks = chunk_text(long_sentence.strip() + ".", max_chars=30)
    assert len(chunks) >= 1
    # CJK punctuation splitting
    zh = "你好。世界。再见。"
    assert len(chunk_text(zh, max_chars=9)) >= 2


def test_pipeline_empty_and_short_text(tmp_path):
    from f5_tts_tpu.infer.engine import EngineOptions, InferenceEngine
    from f5_tts_tpu.infer.pipeline import PipelineOptions, infer_process
    from f5_tts_tpu.models import dit as D
    from f5_tts_tpu.models import vocos as V
    from f5_tts_tpu.models.configs import MODEL_CONFIGS, with_vocab_size
    from f5_tts_tpu.text.tokenizer import get_tokenizer

    vocab, size = get_tokenizer(None, "char")
    cfg = with_vocab_size(MODEL_CONFIGS["F5TTS_Tiny"], size)
    params = D.init(jax.random.PRNGKey(0), cfg.arch)
    eng = InferenceEngine(params, cfg, vocoder_params=V.init(jax.random.PRNGKey(1), V.VocosConfig()),
                          options=EngineOptions(nfe_step=2))
    sr = 24000
    ref = (0.2 * np.sin(2 * np.pi * 200 * np.arange(sr) / sr)).astype(np.float32)

    # empty gen text -> graceful None
    wav, out_sr, spec = infer_process(eng, (ref, sr), "a ref.", "", vocab, "char",
                                      opts=PipelineOptions(seed=0), show_info=lambda *a: None)
    assert wav is None

    # ultra-short gen text (<10 bytes) -> slow-speed path, still works
    wav, out_sr, spec = infer_process(eng, (ref, sr), "a ref.", "hi.", vocab, "char",
                                      opts=PipelineOptions(seed=0), show_info=lambda *a: None)
    assert wav is not None and len(wav) > 0


def test_v0_config_sampler_path():
    """Legacy F5TTS_Base options (pe_attn_head=1, no text pad masking) through
    the full sampler."""
    from f5_tts_tpu.models import cfm as C
    from f5_tts_tpu.models import dit as D
    from f5_tts_tpu.models.configs import DiTConfig

    cfg = DiTConfig(dim=64, depth=2, heads=4, dim_head=16, ff_mult=2, mel_dim=10,
                    text_num_embeds=40, text_dim=24, conv_layers=2, max_pos=128,
                    text_mask_padding=False, pe_attn_head=1)
    params = D.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    out = C.sample(params, cfg,
                   jnp.asarray(rng.standard_normal((1, 48, 10)).astype(np.float32)),
                   jnp.asarray(rng.integers(0, 40, (1, 8)).astype(np.int32)),
                   jnp.asarray(np.array([40], np.int32)),
                   jnp.asarray(rng.standard_normal((1, 48, 10)).astype(np.float32)),
                   lens=jnp.asarray(np.array([10], np.int32)),
                   opts=C.SampleOptions(steps=2), backend="sdpa")
    assert np.isfinite(np.asarray(out)).all()


def test_socket_server_concurrent_clients(tmp_path):
    import threading
    import time

    from f5_tts_tpu.audio.io import save_wav
    from f5_tts_tpu.infer.api import F5TTS
    from f5_tts_tpu.infer.socket_client import listen_to_f5tts
    from f5_tts_tpu.infer.socket_server import TTSStreamingProcessor, start_server

    sr = 24000
    ref_path = str(tmp_path / "r.wav")
    save_wav(ref_path, 0.2 * np.sin(2 * np.pi * 220 * np.arange(int(sr * 1.1)) / sr), sr)
    tts = F5TTS(model="F5TTS_Tiny", init_random=True, nfe_step=2, device="cpu")
    proc = TTSStreamingProcessor(tts, ref_path, "a simple tone.")
    port = 29533
    threading.Thread(target=start_server, args=("127.0.0.1", port, proc), daemon=True).start()
    time.sleep(0.5)

    results = {}

    def client(i):
        results[i] = listen_to_f5tts(f"client number {i} says hello.", "127.0.0.1", port)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert len(results) == 3
    for wav in results.values():
        assert len(wav) > 500 and np.isfinite(wav).all()


def test_phase_timer_report(tmp_path):
    import time

    from f5_tts_tpu.utils.profiling import PhaseTimer

    pt = PhaseTimer()
    with pt.phase("dit"):
        time.sleep(0.01)
    with pt.phase("vocoder"):
        time.sleep(0.005)
    with pt.phase("dit"):
        time.sleep(0.01)
    rep = pt.report()
    assert rep["dit"]["count"] == 2 and rep["vocoder"]["count"] == 1
    assert rep["dit"]["total_s"] >= 0.02
    path = str(tmp_path / "phases.json")
    pt.dump(path)
    import json

    assert "dit" in json.load(open(path))


def test_distributed_helpers_single_host():
    from f5_tts_tpu.parallel.distributed import init_distributed, process_batch_slice

    info = init_distributed()
    assert info["process_count"] >= 1 and info["global_devices"] >= 1
    start, size = process_batch_slice(16)
    assert start == 0 and size == 16 // info["process_count"]


def test_seed_everything():
    import random

    from f5_tts_tpu.utils.seed import seed_everything

    seed_everything(42)
    a = (random.random(), np.random.rand())
    seed_everything(42)
    b = (random.random(), np.random.rand())
    assert a == b


def test_text_longer_than_frames_is_curtailed():
    """text_embedding curtails tokens beyond the mel frame count
    (reference dit.py:95: 'curtail if character tokens are more than mel')."""
    from f5_tts_tpu.models import dit as D
    from tests.test_dit import SMALL, make_params

    params = make_params(SMALL)
    rng = np.random.default_rng(1)
    n, nt = 16, 40  # more tokens than frames
    text = rng.integers(0, SMALL.text_num_embeds, (1, nt)).astype(np.int32)
    te = D.text_embedding(params, SMALL, jnp.asarray(text), n)
    assert te.shape == (1, n, SMALL.text_dim)
    assert np.isfinite(np.asarray(te)).all()


def test_generate_batch_duration_not_exceeding_ref():
    """duration <= ref length: sampler clamps to ref+1 and the engine returns
    an (almost) empty generated wave without crashing."""
    from f5_tts_tpu.infer.engine import EngineOptions, InferenceEngine
    from f5_tts_tpu.models import vocos as V
    from tests.test_pipeline import tiny_model

    cfg, params, _, _ = tiny_model()
    eng = InferenceEngine(params, cfg, vocoder_params=V.init(jax.random.PRNGKey(1), V.VocosConfig()),
                          options=EngineOptions(nfe_step=2))
    rng = np.random.default_rng(2)
    ref = rng.standard_normal((100, 100)).astype(np.float32)
    txt = np.arange(10, dtype=np.int32)
    mels, wavs, gf = eng.generate_batch([ref], [txt], [50], seeds=[0])  # duration < ref len
    assert gf[0] >= 1  # clamped to lens+1
    assert np.isfinite(wavs[0]).all()


def test_sample_edit_mask_keeps_unmasked_regions_exact():
    from f5_tts_tpu.models import cfm as C
    from tests.test_dit import SMALL, make_params

    params = make_params(SMALL)
    rng = np.random.default_rng(3)
    b, n = 1, 48
    cond = rng.standard_normal((b, n, SMALL.mel_dim)).astype(np.float32)
    text = rng.integers(0, SMALL.text_num_embeds, (b, 8)).astype(np.int32)
    lens = np.array([40], np.int32)
    edit_mask = np.ones((b, n), bool)
    edit_mask[0, 10:20] = False  # regenerate frames 10..20
    out = np.asarray(C.sample(params, SMALL, jnp.asarray(cond), jnp.asarray(text),
                              jnp.asarray(np.array([44], np.int32)),
                              jnp.asarray(rng.standard_normal((b, n, SMALL.mel_dim)).astype(np.float32)),
                              lens=jnp.asarray(lens),
                              opts=C.SampleOptions(steps=2),
                              edit_mask=jnp.asarray(edit_mask), backend="sdpa"))
    # kept regions are the original cond verbatim
    np.testing.assert_array_equal(out[0, :10], cond[0, :10])
    np.testing.assert_array_equal(out[0, 20:40], cond[0, 20:40])
    # regenerated span differs
    assert np.abs(out[0, 10:20] - cond[0, 10:20]).mean() > 1e-3
