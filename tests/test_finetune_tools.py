"""Finetune toolkit: slicer, transcription pipeline, settings persistence,
checkpoint pruning, embedding expansion, monitor, log tail
(reference train/finetune_gradio.py:77-1365)."""

import json
import os

import numpy as np
import pytest

from f5_tts_tpu.train import finetune_gradio as FG


def _tone(sr, seconds, freq=220.0, amp=0.3):
    t = np.arange(int(sr * seconds)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_slicer_splits_on_silence():
    sr = 24000
    wav = np.concatenate([_tone(sr, 2.5), np.zeros(sr, np.float32), _tone(sr, 2.5, 330.0)])
    segs = FG.Slicer(sr).slice(wav)
    assert len(segs) == 2, [len(s) / sr for s in segs]
    for s in segs:
        assert len(s) >= sr * 2  # both bursts survive mostly intact
        assert np.abs(s).max() > 0.2


def test_slicer_keeps_continuous_audio_whole():
    sr = 24000
    wav = _tone(sr, 5.0)
    segs = FG.Slicer(sr).slice(wav)
    assert len(segs) == 1 and len(segs[0]) == len(wav)


def test_slicer_all_silence_and_validation():
    sr = 24000
    assert len(FG.Slicer(sr).slice(np.zeros(sr * 3, np.float32))) == 1
    with pytest.raises(ValueError):
        FG.Slicer(sr, min_length=100, min_interval=300)


def test_transcribe_all_pipeline(tmp_path, monkeypatch):
    from f5_tts_tpu.audio.io import save_wav

    sr = 24000
    audio_dir = tmp_path / "raw"
    audio_dir.mkdir()
    wav = np.concatenate([_tone(sr, 2.2), np.zeros(sr, np.float32), _tone(sr, 2.2, 330.0)])
    save_wav(str(audio_dir / "take1.wav"), wav, sr)
    save_wav(str(audio_dir / "take2.wav"), _tone(sr, 3.0, 440.0), sr)

    monkeypatch.chdir(tmp_path)
    proj = FG.create_data_project("myvoice", "pinyin")
    assert proj == "myvoice_pinyin"
    assert proj in FG.get_list_projects()

    calls = []

    def fake_asr(seg, seg_sr):
        calls.append(len(seg) / seg_sr)
        return f"utterance number {len(calls)}."

    summary = FG.transcribe_all(proj, str(audio_dir), transcribe_fn=fake_asr)
    assert "3 segments" in summary, summary  # 2 slices + 1 whole file
    meta = tmp_path / "data" / proj / "metadata.csv"
    lines = meta.read_text(encoding="utf-8-sig").strip().splitlines()
    assert lines[0] == "audio_file|text"
    assert len(lines) == 4
    for ln in lines[1:]:
        rel, text = ln.split("|")
        assert (tmp_path / "data" / proj / rel).exists()
        assert text.startswith("utterance")

    # random sample comes from the metadata
    text, path = FG.get_random_sample_transcribe(proj, seed=0)
    assert text.startswith("utterance") and os.path.isfile(path)

    # vocab check on the generated metadata: ascii text -> nothing missing
    missing = FG.vocab_check(str(meta))
    assert missing == [], missing


def test_settings_roundtrip_with_defaults(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    path = FG.save_settings("proj_pinyin", {"learning_rate": 3e-5, "epochs": 7})
    assert os.path.isfile(path)
    got = FG.load_settings("proj_pinyin")
    assert got["learning_rate"] == 3e-5 and got["epochs"] == 7
    assert got["exp_name"] == "F5TTS_v1_Base"  # default merged in
    # unknown project -> pure defaults
    assert FG.load_settings("nope_pinyin") == FG.DEFAULT_SETTINGS


def test_prune_checkpoint_and_expand_embeddings(tmp_path):
    import torch

    from f5_tts_tpu.models import dit as D
    from f5_tts_tpu.utils.ckpt import dit_params_to_state, load_torch_state
    from tests.test_dit import SMALL

    import jax

    raw = dit_params_to_state(D.init(jax.random.PRNGKey(0), SMALL), SMALL)
    ema = dit_params_to_state(D.init(jax.random.PRNGKey(1), SMALL), SMALL)
    ckpt = str(tmp_path / "model_100.pt")
    torch.save({
        "model_state_dict": {k: torch.from_numpy(np.asarray(v)) for k, v in raw.items()},
        "ema_model_state_dict": {f"ema_model.{k}": torch.from_numpy(np.asarray(v))
                                 for k, v in ema.items()},
        "optimizer_state_dict": {"dummy": torch.zeros(1000)},
        "update": 100,
    }, ckpt)

    out = str(tmp_path / "pruned.safetensors")
    msg = FG.prune_checkpoint(ckpt, out, save_ema=True)
    assert "pruned" in msg and os.path.isfile(out)
    # pruned file round-trips through the standard loader to the EMA weights
    state = load_torch_state(out, use_ema=True)
    np.testing.assert_allclose(
        state["text_embed.text_embed.weight"], ema["text_embed.text_embed.weight"])
    assert not any("optimizer" in k for k in state)

    # vocab expansion adds rows
    out2 = str(tmp_path / "expanded.safetensors")
    new_size = FG.expand_model_embeddings(out, out2, num_new_tokens=42)
    assert new_size == ema["text_embed.text_embed.weight"].shape[0] + 42
    state2 = load_torch_state(out2, use_ema=True)
    assert state2["text_embed.text_embed.weight"].shape[0] == new_size


def test_monitor_and_log_tail(tmp_path, monkeypatch):
    stats = FG.get_combined_stats()
    assert "CPU" in stats and "RAM" in stats
    monkeypatch.chdir(tmp_path)
    os.makedirs("ckpts/voice", exist_ok=True)
    with open("ckpts/voice/train_log.jsonl", "w") as f:
        for i in range(30):
            f.write(json.dumps({"update": i, "loss": 1.0 / (i + 1)}) + "\n")
    tail = FG.tail_train_log("voice_pinyin", n=5)
    assert tail.count("\n") == 5 and '"update": 29' in tail
    assert FG.tail_train_log("missing_pinyin") == "(no training log yet)"


def test_stop_training_without_process():
    assert "no training process" in FG.stop_training()


def test_calculate_train_scaling():
    small = FG.calculate_train(0.5)
    big = FG.calculate_train(20.0)
    assert big["updates_per_epoch"] > small["updates_per_epoch"]
    assert big["num_warmup_updates"] >= small["num_warmup_updates"]
