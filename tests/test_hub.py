"""HF-Hub auto-resolution tests (reference api.py:65-81, infer_cli.py:274-296).

Network is never touched: a fake local HF cache (the real
``models--org--repo/snapshots/<rev>/`` layout) is populated on disk and
resolution runs with HF_HUB_OFFLINE=1.
"""

import os

import numpy as np
import pytest

from f5_tts_tpu.utils import hub


def _fake_cache(tmp_path, repo_id: str, files: dict[str, bytes]) -> str:
    """Build a real-layout HF cache with one revision of one repo."""
    cache = tmp_path / "hf_cache"
    repo_dir = cache / ("models--" + repo_id.replace("/", "--"))
    rev = "0123456789abcdef0123456789abcdef01234567"
    (repo_dir / "refs").mkdir(parents=True, exist_ok=True)
    (repo_dir / "refs" / "main").write_text(rev)
    snap = repo_dir / "snapshots" / rev
    for name, data in files.items():
        p = snap / name
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(data)
    return str(cache)


def test_model_hub_spec_reference_mapping():
    """Exact name/step/type overrides of reference api.py:65-77."""
    assert hub.model_hub_spec("F5TTS_v1_Base") == (
        "SWivid/F5-TTS", "F5TTS_v1_Base/model_1250000.safetensors")
    assert hub.model_hub_spec("F5TTS_Base", "vocos") == (
        "SWivid/F5-TTS", "F5TTS_Base/model_1200000.safetensors")
    assert hub.model_hub_spec("F5TTS_Base", "bigvgan") == (
        "SWivid/F5-TTS", "F5TTS_Base_bigvgan/model_1250000.pt")
    assert hub.model_hub_spec("E2TTS_Base") == (
        "SWivid/E2-TTS", "E2TTS_Base/model_1200000.safetensors")


def test_parse_hf_uri():
    assert hub.parse_hf_uri("hf://SWivid/F5-TTS/F5TTS_v1_Base/model_1250000.safetensors") == (
        "SWivid/F5-TTS", "F5TTS_v1_Base/model_1250000.safetensors")
    with pytest.raises(ValueError):
        hub.parse_hf_uri("hf://only-org")


def test_resolve_from_local_cache_offline(tmp_path, monkeypatch):
    monkeypatch.setenv("HF_HUB_OFFLINE", "1")
    cache = _fake_cache(tmp_path, "SWivid/F5-TTS",
                        {"F5TTS_v1_Base/model_1250000.safetensors": b"fake"})
    got = hub.resolve_checkpoint("F5TTS_v1_Base", hf_cache_dir=cache)
    assert got and got.endswith("model_1250000.safetensors")
    assert open(got, "rb").read() == b"fake"
    # a miss resolves to None (caller raises its own actionable error)
    assert hub.resolve_checkpoint("E2TTS_Base", hf_cache_dir=cache) is None


def test_resolve_vocoder_from_cache(tmp_path, monkeypatch):
    monkeypatch.setenv("HF_HUB_OFFLINE", "1")
    cache = _fake_cache(tmp_path, "charactr/vocos-mel-24khz",
                        {"pytorch_model.bin": b"voc"})
    got = hub.resolve_vocoder("vocos", hf_cache_dir=cache)
    assert got and got.endswith("pytorch_model.bin")
    assert hub.resolve_vocoder("bigvgan", hf_cache_dir=cache) is None
    assert hub.resolve_vocoder("encodec", hf_cache_dir=cache) is None


def test_resolve_whisper_env_and_cache(tmp_path, monkeypatch):
    monkeypatch.setenv("HF_HUB_OFFLINE", "1")
    monkeypatch.delenv("F5_TTS_TPU_WHISPER", raising=False)
    # env var wins
    monkeypatch.setenv("F5_TTS_TPU_WHISPER", str(tmp_path / "snap"))
    assert hub.resolve_whisper() == str(tmp_path / "snap")
    monkeypatch.delenv("F5_TTS_TPU_WHISPER")
    # cache snapshot
    cache = _fake_cache(tmp_path, hub.WHISPER_REPO, {"config.json": b"{}"})
    got = hub.resolve_whisper(hf_cache_dir=cache)
    assert got and os.path.isfile(os.path.join(got, "config.json"))
    # nothing resolvable -> None (and whisper_available False)
    from f5_tts_tpu.audio.asr import whisper_available

    assert hub.resolve_whisper(hf_cache_dir=str(tmp_path / "empty")) is None
    assert not whisper_available(None) or os.environ.get("F5_TTS_TPU_WHISPER")


def test_api_resolves_hf_uri_checkpoint(tmp_path, monkeypatch):
    """F5TTS(ckpt_file="hf://...") loads a tiny release straight from the
    local cache — the reference's cached_path flow (infer_cli.py:292-293)."""
    monkeypatch.setenv("HF_HUB_OFFLINE", "1")
    import torch

    from f5_tts_tpu.models.configs import from_yaml_dict, with_vocab_size
    from f5_tts_tpu.text.tokenizer import get_tokenizer
    from f5_tts_tpu.utils import ckpt as CK
    from tests.test_dit import SMALL, make_params

    arch = {k: getattr(SMALL, k) for k in
            ("dim", "depth", "heads", "dim_head", "ff_mult", "mel_dim",
             "text_dim", "conv_layers", "max_pos")}
    # replicate the ctor's config derivation (bundled pinyin vocab size)
    _, vs = get_tokenizer(None, "pinyin")
    cfg = with_vocab_size(
        from_yaml_dict({"name": "tiny", "backbone": "DiT", "arch": dict(arch)}), vs
    ).arch
    params = make_params(cfg, seed=3)
    state = CK.dit_params_to_state(params, cfg, prefix="transformer.")
    sd = {("ema_model." + k): torch.from_numpy(np.array(v)) for k, v in state.items()}
    local = tmp_path / "model_tiny.pt"
    torch.save({"ema_model_state_dict": sd}, str(local))
    cache = _fake_cache(tmp_path, "someone/tiny-f5",
                        {"model_tiny.pt": open(local, "rb").read()})

    from f5_tts_tpu.infer.api import F5TTS

    with pytest.warns(UserWarning):  # no vocoder weights in the fake release
        tts = F5TTS(model="tiny", model_cfg=arch, ckpt_file="hf://someone/tiny-f5/model_tiny.pt",
                    hf_cache_dir=cache, device="cpu")
    assert tts.model_cfg.arch.dim == cfg.dim


def test_api_missing_checkpoint_message(monkeypatch, tmp_path):
    monkeypatch.setenv("HF_HUB_OFFLINE", "1")
    monkeypatch.setenv("HF_HOME", str(tmp_path / "nohome"))  # empty default cache
    from f5_tts_tpu.infer.api import F5TTS

    with pytest.raises(ValueError, match="SWivid/F5-TTS"):
        F5TTS(model="F5TTS_v1_Base", device="cpu")
