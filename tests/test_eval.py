"""Eval harness tests: WER math, testset parsing, batch synthesis driver."""

import os

import numpy as np
import pytest

from f5_tts_tpu.eval.metrics import edit_distance, word_error_rate
from f5_tts_tpu.eval.testsets import get_librispeech_test_clean_metainfo, get_seedtts_testset_metainfo


def test_edit_distance():
    assert edit_distance(list("kitten"), list("sitting")) == 3
    assert edit_distance([], list("ab")) == 2
    assert edit_distance(list("abc"), list("abc")) == 0


def test_word_error_rate():
    assert word_error_rate("the cat sat", "the cat sat") == 0.0
    assert word_error_rate("the cat sat", "the cat") == pytest.approx(1 / 3)
    # punctuation stripped, case-insensitive
    assert word_error_rate("Hello, world!", "hello world") == 0.0
    # zh: per-character
    assert word_error_rate("你好世界", "你好地球", lang="zh") == 0.5


def test_seedtts_metalst_parsing(tmp_path):
    meta = tmp_path / "meta.lst"
    meta.write_text("utt1|prompt text|wavs/p1.wav|generate this text\n", encoding="utf-8")
    info = get_seedtts_testset_metainfo(str(meta))
    assert len(info) == 1
    utt, ptext, pwav, gtext, gwav = info[0]
    assert utt == "utt1" and ptext == "prompt text"
    assert pwav.endswith("wavs/p1.wav") and os.path.isabs(pwav) or pwav.startswith(str(tmp_path))


def test_librispeech_metalst_parsing(tmp_path):
    meta = tmp_path / "ls.lst"
    meta.write_text("1-2-0001\t3.0\tref words here.\t3-4-0002\t4.0\tgen words here.\n")
    info = get_librispeech_test_clean_metainfo(str(meta), "/ls/test-clean")
    utt, rtext, rwav, gtext, gwav = info[0]
    assert utt == "3-4-0002"
    assert rwav == "/ls/test-clean/1/2/1-2-0001.flac"
    assert gtext.startswith(" ")


def test_eval_infer_batch_driver(tmp_path, monkeypatch):
    """Full driver on a synthetic seedtts metalist with the tiny random model."""
    from f5_tts_tpu.audio.io import save_wav
    from f5_tts_tpu.eval import eval_infer_batch

    sr = 24000
    wavdir = tmp_path / "data" / "seedtts_testset" / "en"
    wavdir.mkdir(parents=True)
    t = np.arange(sr) / sr
    for i in range(3):
        save_wav(str(wavdir / f"p{i}.wav"), 0.2 * np.sin(2 * np.pi * (200 + 50 * i) * t), sr)
    meta = wavdir / "meta.lst"
    meta.write_text(
        "".join(f"utt{i}|a prompt sentence.|p{i}.wav|some generated target text {i}.\n" for i in range(3)),
        encoding="utf-8",
    )
    out_dir = eval_infer_batch.main([
        "-t", "seedtts_test_en", "-n", "F5TTS_Tiny", "--init_random",
        "-nfe", "2", "-s", "7",
        "--metalst_root", str(tmp_path / "data"),
        "--results_root", str(tmp_path / "results"),
        "--batch_size", "2",
    ])
    wavs = [f for f in os.listdir(out_dir) if f.endswith(".wav")]
    assert len(wavs) == 3
    assert os.path.isfile(os.path.join(out_dir, "rtf.txt"))


def _save_tone(path, freq=220.0, seconds=0.4, sr=24000):
    from f5_tts_tpu.audio.io import save_wav

    t = np.arange(int(sr * seconds)) / sr
    save_wav(str(path), (0.2 * np.sin(2 * np.pi * freq * t)).astype(np.float32), sr)
    return str(path)


def test_run_wer_en_adapter_happy_path(tmp_path, monkeypatch):
    """run_wer's faster-whisper path end to end against a fake WhisperModel at
    the import seam (reference utils_eval.py:306-374): model construction args,
    per-file transcribe contract (segments, info), normalization + aggregation."""
    import sys
    import types

    from f5_tts_tpu.eval import metrics

    calls = {}

    class FakeWhisperModel:
        def __init__(self, model_dir, device="cpu"):
            calls["model_dir"] = model_dir

        def transcribe(self, wav_path, beam_size=5, language="en"):
            calls.setdefault("paths", []).append(wav_path)
            seg = types.SimpleNamespace(text=" Hello world." if "a.wav" in wav_path else " goodbye now")
            return [seg], {"language": language}

    fake = types.ModuleType("faster_whisper")
    fake.WhisperModel = FakeWhisperModel
    monkeypatch.setitem(sys.modules, "faster_whisper", fake)

    wav_a = _save_tone(tmp_path / "a.wav")
    wav_b = _save_tone(tmp_path / "b.wav", freq=300.0)
    results = metrics.run_wer(
        [("utt_a", wav_a, "hello world"), ("utt_b", wav_b, "goodbye friend")],
        lang="en", ckpt_dir=str(tmp_path / "ckpts"),
    )
    assert calls["model_dir"].endswith("Systran/faster-whisper-large-v3")
    assert [r["wer"] for r in results] == [0.0, pytest.approx(0.5)]
    assert results[0]["hypo"].strip() == "Hello world."


def test_run_wer_zh_adapter_happy_path(tmp_path, monkeypatch):
    """run_wer's funasr paraformer path with a fake AutoModel: generate()
    result-shape contract ([{'text': ...}]) and per-character zh WER."""
    import sys
    import types

    from f5_tts_tpu.eval import metrics

    class FakeAutoModel:
        def __init__(self, model, disable_update=True):
            assert model.endswith("paraformer-zh")

        def generate(self, input, batch_size_s=300, disable_pbar=True):
            return [{"text": "你好地球"}]

    fake = types.ModuleType("funasr")
    fake.AutoModel = FakeAutoModel
    monkeypatch.setitem(sys.modules, "funasr", fake)

    wav = _save_tone(tmp_path / "z.wav")
    results = metrics.run_wer([("utt", wav, "你好世界")], lang="zh")
    assert results[0]["wer"] == pytest.approx(0.5)


def test_run_sim_adapter_happy_path(tmp_path, monkeypatch):
    """run_sim end to end with a fake s3prl WavLM upstream and a real (fresh)
    ECAPA checkpoint file: ckpt load, 16kHz resample, embedding, cosine sim
    (reference utils_eval.py:380-426)."""
    import sys
    import types

    import torch

    class FakeUpstream(torch.nn.Module):
        def __init__(self, name):
            super().__init__()
            assert name == "wavlm_large"

        def forward(self, wav, lens):
            b, t = wav.shape
            frames = max(4, t // 2048)
            # deterministic wav-dependent features so sim(gen,gen)=1 > sim(gen,other)
            base = wav[:, : frames * 2048].reshape(b, frames, -1).mean(-1, keepdim=True)
            feats = base * torch.linspace(0.5, 1.5, 1024)
            return [feats], None

    s3prl = types.ModuleType("s3prl")
    s3prl_nn = types.ModuleType("s3prl.nn")
    s3prl_nn.S3PRLUpstream = FakeUpstream
    s3prl.nn = s3prl_nn
    monkeypatch.setitem(sys.modules, "s3prl", s3prl)
    monkeypatch.setitem(sys.modules, "s3prl.nn", s3prl_nn)

    from f5_tts_tpu.eval import metrics
    from f5_tts_tpu.eval.ecapa_tdnn import ECAPA_TDNN

    ckpt = tmp_path / "wavlm_ecapa.pt"
    torch.save({"model": ECAPA_TDNN(feat_dim=1024, channels=512, emb_dim=256).state_dict()},
               str(ckpt))

    gen = _save_tone(tmp_path / "gen.wav", freq=220.0, seconds=0.6)
    prompt = _save_tone(tmp_path / "prompt.wav", freq=330.0, seconds=0.5)
    results = metrics.run_sim(
        [("same", gen, gen), ("diff", gen, prompt)], ckpt_path=str(ckpt))
    assert results[0]["sim"] == pytest.approx(1.0, abs=1e-5)
    assert -1.0 <= results[1]["sim"] <= 1.0


def test_run_utmos_adapter_happy_path(tmp_path, monkeypatch):
    """run_utmos with a fake torch.hub predictor: directory glob, wav load,
    (wav tensor, sr) call contract, per-file score aggregation (reference
    eval_utmos.py)."""
    import torch

    from f5_tts_tpu.eval import metrics

    def fake_hub_load(repo, name, trust_repo=True):
        assert name == "utmos22_strong"

        def predictor(wav, sr):
            assert wav.ndim == 2 and sr == 24000
            return torch.tensor([3.5 + 0.1 * float(wav.abs().mean())])

        return predictor

    monkeypatch.setattr(torch.hub, "load", fake_hub_load)
    _save_tone(tmp_path / "u1.wav")
    _save_tone(tmp_path / "u2.wav", freq=300.0)
    results = metrics.run_utmos(str(tmp_path))
    assert len(results) == 2
    assert all(3.0 < r["utmos"] < 4.0 for r in results)
    assert results[0]["wav"].endswith("u1.wav")


def test_ecapa_tdnn_forward_features():
    import torch

    from f5_tts_tpu.eval.ecapa_tdnn import ECAPA_TDNN

    model = ECAPA_TDNN(feat_dim=24, channels=64, emb_dim=32)
    model.eval()
    feats = torch.randn(2, 50, 24)
    with torch.no_grad():
        emb = model(feats)
    assert emb.shape == (2, 32)
    assert torch.isfinite(emb).all()
