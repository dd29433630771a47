"""Unit tests for the gradio-free UI logic (f5_tts_tpu/infer/gradio_logic.py).

Behavior spec: reference src/f5_tts/infer/infer_gradio.py —
parse_speechtypes_text (:349-380), speech-type collection (:617-631),
validation (:707-731), seed handling (:146-152), custom-model persistence
(:978-1010), lru-cached infer (:131).
"""

import json

import numpy as np

from f5_tts_tpu.infer import gradio_logic as L


class TestParseSpeechtypesText:
    def test_plain_markers(self):
        text = "{Regular} Hello there. {Angry} Why me?! {Whisper} go away"
        segs = L.parse_speechtypes_text(text)
        assert [s["name"] for s in segs] == ["Regular", "Angry", "Whisper"]
        assert segs[0]["text"] == "Hello there."
        assert all(s["seed"] == -1 and s["speed"] == 1.0 for s in segs)

    def test_default_type_is_regular(self):
        segs = L.parse_speechtypes_text("no marker at all")
        assert segs == [{"name": "Regular", "seed": -1, "speed": 1.0, "text": "no marker at all"}]

    def test_json_markers_with_seed_and_speed(self):
        marker = json.dumps({"name": "Speaker1_Happy", "seed": 42, "speed": 0.8})
        segs = L.parse_speechtypes_text(f"{marker} Hi! {{Sad}} bye")
        assert segs[0] == {"name": "Speaker1_Happy", "seed": 42, "speed": 0.8, "text": "Hi!"}
        assert segs[1]["name"] == "Sad" and segs[1]["seed"] == -1

    def test_type_carries_forward_across_lines(self):
        segs = L.parse_speechtypes_text("{Shouting} FIRST\nSECOND {Calm} third")
        # text between markers belongs to the preceding type
        assert segs[0]["name"] == "Shouting"
        assert "SECOND" in segs[0]["text"]
        assert segs[1] == {"name": "Calm", "seed": -1, "speed": 1.0, "text": "third"}

    def test_empty_text(self):
        assert L.parse_speechtypes_text("") == []
        assert L.parse_speechtypes_text("{Angry}") == []


class TestSpeechTypeCollection:
    def test_placeholders_preserve_row_order(self):
        d = L.collect_speech_types(
            ["Regular", "", "Sad"], ["a.wav", "", "c.wav"], ["ra", "", "rc"])
        assert list(d) == ["Regular", "@1@", "Sad"]
        assert d["Sad"] == {"audio": "c.wav", "ref_text": "rc"}
        assert d["@1@"] == {"audio": "", "ref_text": ""}

    def test_name_without_audio_is_placeholder(self):
        d = L.collect_speech_types(["X"], [None], [""])
        assert list(d) == ["@0@"]

    def test_missing_speech_types(self):
        text = "{Regular} a {Angry} b {Whisper} c"
        assert L.missing_speech_types(text, "Regular", "Angry") == {"Whisper"}
        assert L.missing_speech_types(text, "Regular", "Angry", "Whisper") == set()
        # empty names don't count as available
        assert L.missing_speech_types("{X} hi", "", "") == {"X"}


class TestSeed:
    def test_in_range_passthrough(self):
        assert L.normalize_seed(123) == 123
        assert L.normalize_seed(0) == 0
        assert L.normalize_seed(L.MAX_SEED) == L.MAX_SEED

    def test_out_of_range_redraws(self):
        rng = np.random.RandomState(0)
        s = L.normalize_seed(-1, rng=rng)
        assert 0 <= s <= L.MAX_SEED
        s2 = L.normalize_seed(2**31, rng=rng)
        assert 0 <= s2 <= L.MAX_SEED

    def test_randomize_flag(self):
        rng = np.random.RandomState(0)
        assert L.normalize_seed(5, randomize=True, rng=rng) != 5 or True  # drawn, not 5-pinned
        drawn = {L.normalize_seed(5, randomize=True, rng=rng) for _ in range(4)}
        assert len(drawn) > 1


class TestPersistence:
    def test_roundtrip(self, tmp_path):
        p = str(tmp_path / "last_used.txt")
        L.save_last_used_custom("/ckpt.pt", "/vocab.txt", '{"dim": 1024}', p)
        assert L.load_last_used_custom(p) == ("/ckpt.pt", "/vocab.txt", '{"dim": 1024}')

    def test_missing_file_gives_defaults(self, tmp_path):
        got = L.load_last_used_custom(str(tmp_path / "nope.txt"))
        assert got == L.DEFAULT_CUSTOM_MODEL_CFG
        assert json.loads(got[2])["dim"] == 1024

    def test_short_file_padded(self, tmp_path):
        p = tmp_path / "short.txt"
        p.write_text("/only_ckpt.pt\n")
        assert L.load_last_used_custom(str(p)) == ("/only_ckpt.pt", "", "")


class TestInferCache:
    def test_hit_miss_and_eviction(self):
        cache = L.InferCache(maxsize=2)
        calls = []

        def compute(v):
            return lambda: calls.append(v) or v

        assert cache.get_or_compute(("a",), compute(1)) == 1
        assert cache.get_or_compute(("a",), compute(99)) == 1  # cached
        assert cache.hits == 1 and cache.misses == 1
        cache.get_or_compute(("b",), compute(2))
        cache.get_or_compute(("c",), compute(3))  # evicts LRU ("a")
        assert cache.get_or_compute(("a",), compute(4)) == 4
        assert calls == [1, 2, 3, 4]


class TestConversation:
    def test_add_user_skips_empty(self):
        assert L.conversation_add_user([], "  ") == []
        conv = L.conversation_add_user([], "hi")
        assert conv == [{"role": "user", "content": "hi"}]

    def test_last_assistant_reply(self):
        conv = [{"role": "user", "content": "hi"}]
        assert L.last_assistant_reply(conv) is None
        conv.append({"role": "assistant", "content": "hello!"})
        assert L.last_assistant_reply(conv) == "hello!"
        # gradio "messages" content-block form
        conv.append({"role": "assistant", "content": [{"type": "text", "text": "block"}]})
        assert L.last_assistant_reply(conv) == "block"


def test_gradio_app_import_without_gradio():
    """The app module imports fine; build_app raises a clear error sans gradio."""
    import pytest

    from f5_tts_tpu.infer import gradio_app

    try:
        import gradio  # noqa: F401

        pytest.skip("gradio installed; build path exercised elsewhere")
    except ImportError:
        pass
    with pytest.raises(RuntimeError, match="gradio is not installed"):
        gradio_app.build_app()


def test_custom_model_cfg_builds_arch():
    """F5TTS(model_cfg=dict) overrides the architecture (custom-model path)."""
    from f5_tts_tpu.infer.api import F5TTS

    cfg = dict(dim=64, depth=2, heads=4, ff_mult=2, text_dim=32,
               text_mask_padding=True, conv_layers=1)
    tts = F5TTS(model="custom_tiny", model_cfg=cfg, init_random=True)
    assert tts.model_cfg.arch.dim == 64
    assert tts.model_cfg.arch.depth == 2
