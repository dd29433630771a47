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
