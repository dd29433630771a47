"""Native C++ segmenter parity vs python jieba.cut(HMM=False) (the
rjieba-equivalent mode used by the reference tokenizer)."""

import pytest

from f5_tts_tpu.text import segmenter

jieba = pytest.importorskip("jieba")

SENTENCES = [
    "我爱北京天安门",
    "这是一个测试句子。Python3.12在运行。",
    "hello world 123",
    "混合mixed文本text与数字42以及标点，符号！",
    "中华人民共和国成立了",
    "研究生命的起源",
    "工信处女干事每月经过下属科室都要亲口交代24口交换机等技术性器件的安装工作",
    "  空格   与\t制表符\n换行",
    "",
    "AT&T是一家公司",
]


@pytest.mark.skipif(not segmenter.native_available(), reason="native build unavailable")
@pytest.mark.parametrize("text", SENTENCES)
def test_native_matches_jieba_no_hmm(text):
    want = list(jieba.cut(text, HMM=False))
    got = segmenter.cut(text)
    assert got == want


def test_fallback_path_works():
    # even without native lib the cut() API returns a token list
    out = segmenter.cut("简单测试 simple test")
    assert isinstance(out, list) and len(out) >= 2
