"""End-to-end pipeline tests on a small random model (CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

import jax

from f5_tts_tpu.infer.engine import EngineOptions, InferenceEngine, pick_bucket
from f5_tts_tpu.infer.pipeline import (
    PipelineOptions,
    cross_fade_stitch,
    estimate_durations,
    infer_process,
)
from f5_tts_tpu.models import dit as D
from f5_tts_tpu.models import vocos as V
from f5_tts_tpu.models.configs import DiTConfig, MelConfig, ModelConfig
from f5_tts_tpu.ops.mel import log_mel_spectrogram
from f5_tts_tpu.text.chunk import chunk_text
from f5_tts_tpu.text.tokenizer import get_tokenizer, tokens_to_ids


def tiny_model():
    arch = DiTConfig(dim=64, depth=2, heads=4, dim_head=16, ff_mult=2, mel_dim=100,
                     text_num_embeds=2545, text_dim=32, conv_layers=1, max_pos=8192)
    cfg = ModelConfig(name="tiny", arch=arch, mel=MelConfig(), tokenizer="char")
    params = D.init(jax.random.PRNGKey(0), arch)
    voc_cfg = V.VocosConfig(input_channels=100, dim=64, intermediate_dim=128, num_layers=2)
    voc = V.init(jax.random.PRNGKey(1), voc_cfg)
    return cfg, params, voc, voc_cfg


def test_pick_bucket():
    assert pick_bucket(100) == 256
    assert pick_bucket(256) == 256
    assert pick_bucket(257) == 512
    with pytest.raises(ValueError):
        pick_bucket(10**6)


def test_chunk_text_respects_byte_budget():
    text = "Hello world. This is a test. " * 10
    chunks = chunk_text(text, max_chars=40)
    assert len(chunks) > 1
    for c in chunks:
        assert len(c.encode("utf-8")) <= 60  # budget + one sentence slack
    assert "".join(chunks).replace(" ", "") == text.replace(" ", "")


def test_chunk_text_hard_max_bounds_every_chunk():
    # one 101-byte clause: the punctuation splitter must keep it whole by
    # default (reference utils_infer.py:73-102 behavior)...
    clause = ("The quick brown fox jumps over the lazy dog while the morning "
              "sun rises slowly over the quiet valley,")
    text = clause + " and the river keeps rolling toward the distant sea."
    soft = chunk_text(text, max_chars=34)
    assert len(soft[0].encode("utf-8")) > 34
    # ...and hard_max must word-boundary split it under the bound
    hard = chunk_text(text, max_chars=34, hard_max=True)
    assert all(len(c.encode("utf-8")) <= 34 for c in hard)
    assert "".join(hard).replace(" ", "") == text.replace(" ", "")
    # no mid-word cuts: every piece ends at a word boundary
    for c in hard:
        assert not c.endswith("-") and c == c.strip()
    # CJK run with no spaces: falls back to codepoint-boundary split,
    # never cutting inside a utf-8 sequence
    zh = "今天天气真好我们一起去公园散步吧然后再去吃饭"
    hard_zh = chunk_text(zh, max_chars=9, hard_max=True)
    assert all(len(c.encode("utf-8")) <= 9 for c in hard_zh)
    assert "".join(hard_zh) == zh


def test_engine_ref_upload_device_cache():
    """Streaming chunks share one ref wav; the int16 upload must be
    device-cached (keyed by exact bytes) instead of re-crossing the host link
    per chunk (TTFB: DEVELOPMENT.md axon-tunnel budget)."""
    cfg, params, voc, voc_cfg = tiny_model()
    eng = InferenceEngine(params, cfg, vocoder_params=voc, vocoder_cfg=voc_cfg,
                          options=EngineOptions(nfe_step=2))
    sr = 24000
    wav = (0.2 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)).astype(np.float32)
    txt = np.arange(8, dtype=np.int32)
    _, wavs_a, _ = eng.generate_batch_from_wav(wav, [txt], [220], seeds=[3])
    assert len(eng._ref_dev_cache) == 1
    cached = next(iter(eng._ref_dev_cache.values()))
    _, wavs_b, _ = eng.generate_batch_from_wav(wav, [txt], [220], seeds=[3])
    assert next(iter(eng._ref_dev_cache.values())) is cached  # reused, no re-upload
    np.testing.assert_array_equal(wavs_a[0], wavs_b[0])
    # a different ref must key a DIFFERENT entry holding different bytes
    # (output-sensitivity can't be asserted here: fresh-init AdaLN gates are
    # zero, making generations ref-independent — DEVELOPMENT.md gotcha)
    wav2 = (0.2 * np.sin(2 * np.pi * 330 * np.arange(sr) / sr)).astype(np.float32)
    eng.generate_batch_from_wav(wav2, [txt], [220], seeds=[3])
    assert len(eng._ref_dev_cache) == 2
    e1, e2 = eng._ref_dev_cache.values()
    assert not np.array_equal(np.asarray(e1), np.asarray(e2))
    # parity: cached-upload result == fresh-engine result
    eng2 = InferenceEngine(params, cfg, vocoder_params=voc, vocoder_cfg=voc_cfg,
                           options=EngineOptions(nfe_step=2))
    _, wavs_f, _ = eng2.generate_batch_from_wav(wav, [txt], [220], seeds=[3])
    np.testing.assert_array_equal(wavs_a[0], wavs_f[0])


def test_estimate_durations_matches_reference_formula():
    # ref: 500 frames, 20-byte text; gen 40 bytes, speed 1 -> 500 + 500/20*40
    d = estimate_durations(500, "a" * 20, ["b" * 40], 1.0, None, 24000, 256)
    assert d == [500 + 1000]
    # short text (<10 bytes) gets speed 0.3 (utils_infer.py:479-480)
    d = estimate_durations(500, "a" * 20, ["b" * 5], 1.0, None, 24000, 256)
    assert d == [500 + int(500 / 20 * 5 / 0.3)]
    # fix_duration wins
    d = estimate_durations(500, "a" * 20, ["x" * 30], 1.0, 8.0, 24000, 256)
    assert d == [int(8.0 * 24000 / 256)]


def test_cross_fade_stitch():
    a = np.ones(1000, np.float32)
    b = np.ones(1000, np.float32) * 3.0
    out = cross_fade_stitch([a, b], cross_fade_duration=0.01, sample_rate=24000)
    cf = 240
    assert len(out) == 2000 - cf
    assert out[0] == 1.0 and out[-1] == 3.0
    # no fade -> plain concat
    out2 = cross_fade_stitch([a, b], 0.0, 24000)
    assert len(out2) == 2000


def test_engine_ref_mel_matches_direct():
    cfg, params, voc, voc_cfg = tiny_model()
    eng = InferenceEngine(params, cfg, vocoder_params=None)
    rng = np.random.default_rng(3)
    wav = (0.3 * rng.standard_normal(24000 * 2 + 133)).astype(np.float32)
    got = eng.ref_mel(wav)
    want = np.asarray(log_mel_spectrogram(jnp.asarray(wav[None]), cfg.mel))[0]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_engine_batch_invariance_and_determinism():
    cfg, params, voc, voc_cfg = tiny_model()
    eng = InferenceEngine(params, cfg, vocoder_params=None, options=EngineOptions(nfe_step=4))
    d = cfg.mel.n_mel_channels
    rng = np.random.default_rng(4)
    ref = rng.standard_normal((50, d)).astype(np.float32)
    t1 = np.arange(20, dtype=np.int32)
    t2 = np.arange(30, dtype=np.int32) % 10
    mels2, _, _ = eng.generate_batch([ref, ref], [t1, t2], [150, 180], seeds=[7, 8])
    mels1, _, _ = eng.generate_batch([ref], [t1], [150], seeds=[7])
    np.testing.assert_allclose(mels1[0], mels2[0], atol=1e-4)
    # determinism: same seed -> identical output
    mels1b, _, _ = eng.generate_batch([ref], [t1], [150], seeds=[7])
    np.testing.assert_array_equal(mels1[0], mels1b[0])


def test_infer_process_end_to_end():
    cfg, params, voc, voc_cfg = tiny_model()

    # patch the tiny vocos config through decode by matching input_channels=100
    eng = InferenceEngine(params, cfg, vocoder_params=voc, options=EngineOptions(nfe_step=2))
    # monkeypatch decode config via closure: engine uses default VocosConfig;
    # tiny voc has dim 64 but default expects 512 -> use full-size vocos instead
    voc_full = V.init(jax.random.PRNGKey(2), V.VocosConfig())
    eng.vocoder_params = voc_full

    vocab, size = get_tokenizer(None, "char")
    rng = np.random.default_rng(5)
    sr = 24000
    ref_wav = (0.2 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)).astype(np.float32)
    wav, out_sr, spec = infer_process(
        eng, (ref_wav, sr), "hello there.", "general kenobi, you are bold.",
        vocab, tokenizer="char", opts=PipelineOptions(seed=3), show_info=lambda *a, **k: None,
    )
    assert out_sr == sr
    assert wav is not None and wav.ndim == 1 and len(wav) > 1000
    assert np.isfinite(wav).all()
    assert spec is not None and spec.shape[0] == 100


def test_streaming_yields_per_chunk_and_matches_batched():
    """streaming=True must yield audio per chunk (first chunk alone — TTFB is
    one chunk, not the whole utterance) and, thanks to per-sample seeding,
    concatenate to exactly the non-streaming result at cross_fade 0
    (reference streams chunk-by-chunk, utils_infer.py:528-538)."""
    from f5_tts_tpu.infer.pipeline import infer_batch_process

    cfg, params, voc, voc_cfg = tiny_model()
    eng = InferenceEngine(params, cfg, vocoder_params=V.init(jax.random.PRNGKey(2), V.VocosConfig()),
                          options=EngineOptions(nfe_step=2))
    vocab, _ = get_tokenizer(None, "char")
    sr = 24000
    ref_wav = (0.2 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)).astype(np.float32)
    chunks_txt = ["first sentence here.", "and a second one.", "then a third."]
    opts = PipelineOptions(seed=7, cross_fade_duration=0.0)

    want, _, _ = infer_batch_process(
        eng, (ref_wav, sr), "a tone. ", chunks_txt, vocab, tokenizer="char", opts=opts)

    pieces = list(infer_batch_process(
        eng, (ref_wav, sr), "a tone. ", chunks_txt, vocab, tokenizer="char",
        opts=opts, streaming=True, chunk_size=2048))
    got = np.concatenate([p for p, _sr in pieces])
    assert all(s == sr for _p, s in pieces)
    assert len(pieces) > 3  # chunked into <=2048-sample packets
    np.testing.assert_allclose(got, want, atol=3e-4)


def test_tokenizer_vocab_and_ids():
    vocab, size = get_tokenizer(None, "pinyin")
    assert size == 2545 and vocab[" "] == 0
    ids = tokens_to_ids([["h", "e", "l"], ["x"]], vocab)
    assert ids.shape == (2, 3)
    assert ids[1, 1] == -1  # padding
    byte_ids = tokens_to_ids(["ab"], None)
    assert byte_ids.tolist() == [[97, 98]]


def test_speech_edit(tmp_path):
    from f5_tts_tpu.audio.io import save_wav
    from f5_tts_tpu.infer.speech_edit import edit_speech
    from f5_tts_tpu.models import vocos as V
    from f5_tts_tpu.text.tokenizer import get_tokenizer

    cfg, params, _, _ = tiny_model()
    eng = InferenceEngine(params, cfg, vocoder_params=V.init(jax.random.PRNGKey(9), V.VocosConfig()),
                          options=EngineOptions(nfe_step=2))
    sr = 24000
    t = np.arange(sr * 2) / sr
    wav = (0.2 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    path = str(tmp_path / "edit_src.wav")
    save_wav(path, wav, sr)
    vocab, _ = get_tokenizer(None, "char")
    out, out_sr = edit_speech(
        eng, vocab, "char", path,
        original_text="a tone that goes on.",
        target_text="a tone that stops now.",
        parts_to_edit=[(0.5, 1.0)],
        seed=1,
    )
    assert out_sr == sr and len(out) > 1000 and np.isfinite(out).all()


def test_infer_process_bigvgan_long_text():
    """BASELINE config 4: bigvgan vocoder backend + long chunked text."""
    import dataclasses

    from f5_tts_tpu.models import bigvgan as BV

    arch = DiTConfig(dim=64, depth=2, heads=4, dim_head=16, ff_mult=2, mel_dim=100,
                     text_num_embeds=2545, text_dim=32, conv_layers=1, max_pos=8192)
    cfg = ModelConfig(name="tiny_bv", arch=arch,
                      mel=MelConfig(mel_spec_type="bigvgan"), tokenizer="char")
    params = D.init(jax.random.PRNGKey(0), arch)
    bv_cfg = BV.BigVGANConfig(
        num_mels=100, upsample_rates=(8, 8, 2, 2), upsample_kernel_sizes=(16, 16, 4, 4),
        upsample_initial_channel=32, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
    )
    voc = BV.init(jax.random.PRNGKey(1), bv_cfg)
    eng = InferenceEngine(params, cfg, vocoder_params=voc,
                          options=EngineOptions(nfe_step=2), vocoder_cfg=bv_cfg)
    vocab, _ = get_tokenizer(None, "char")
    sr = 24000
    ref = (0.2 * np.sin(2 * np.pi * 220 * np.arange(sr) / sr)).astype(np.float32)
    long_text = "this is sentence one. " * 12
    wav, out_sr, spec = infer_process(
        eng, (ref, sr), "a tone reference.", long_text, vocab, "char",
        opts=PipelineOptions(seed=5), show_info=lambda *a, **k: None,
    )
    assert wav is not None and len(wav) > 24000 and np.isfinite(wav).all()


def test_fused_wav_path_mel_matches_ref_mel():
    """The fused-from-wav graph's in-graph mel (int16 wav round trip) matches
    engine.ref_mel within quantization tolerance: compare generated mels from
    both entry points with identical seeds."""
    cfg, params, _, _ = tiny_model()
    eng = InferenceEngine(params, cfg, vocoder_params=None, options=EngineOptions(nfe_step=2))
    rng = np.random.default_rng(12)
    sr = 24000
    wav = (0.3 * rng.standard_normal(sr)).astype(np.float32)
    ref_frames = len(wav) // 256
    txt = np.arange(24, dtype=np.int32)
    mels_a, _, _ = eng.generate_batch_from_wav(wav, [txt], [300], seeds=[9], decode=False)
    ref_mel = eng.ref_mel(wav)[:ref_frames]
    mels_b, _, _ = eng.generate_batch([ref_mel], [txt], [300], seeds=[9], decode=False)
    assert np.abs(mels_a - mels_b).mean() < 1e-3
