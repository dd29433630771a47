"""pydub-equivalent silence utilities (audio/silence.py) unit tests."""

import numpy as np

from f5_tts_tpu.audio.silence import (
    detect_leading_silence,
    detect_silence,
    remove_silence_edges,
    split_on_silence,
)

SR = 24000


def speech_like(seconds, freq=220.0, amp=0.3):
    t = np.arange(int(SR * seconds)) / SR
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_detect_leading_silence():
    wav = np.concatenate([np.zeros(SR // 2, np.float32), speech_like(1.0)])
    lead = detect_leading_silence(wav, SR, silence_threshold=-42.0)
    assert abs(lead - SR // 2) < SR // 50  # within 20 ms
    # all-silence input: trims to (near) the end
    assert detect_leading_silence(np.zeros(SR, np.float32), SR) >= SR - 240


def test_detect_silence_ranges():
    wav = np.concatenate([speech_like(1.0), np.zeros(int(SR * 1.5), np.float32), speech_like(1.0)])
    ranges = detect_silence(wav, SR, min_silence_len=1000, silence_thresh=-50)
    assert len(ranges) == 1
    s, e = ranges[0]
    assert 900 <= s <= 1100 and 2300 <= e <= 2600  # ms, around the gap


def test_split_on_silence_two_chunks():
    wav = np.concatenate([speech_like(1.0), np.zeros(int(SR * 1.5), np.float32), speech_like(0.8)])
    chunks = split_on_silence(wav, SR, min_silence_len=1000, silence_thresh=-50, keep_silence=100)
    assert len(chunks) == 2
    assert abs(len(chunks[0]) / SR - 1.2) < 0.15  # 1.0 s + 2x100 ms keep
    assert abs(len(chunks[1]) / SR - 1.0) < 0.15


def test_split_on_silence_no_silence():
    wav = speech_like(2.0)
    chunks = split_on_silence(wav, SR, min_silence_len=1000, silence_thresh=-50)
    assert len(chunks) == 1 and len(chunks[0]) == len(wav)


def test_remove_silence_edges():
    wav = np.concatenate([
        np.zeros(SR // 4, np.float32), speech_like(1.0), np.zeros(SR // 3, np.float32)
    ])
    out = remove_silence_edges(wav, SR)
    assert abs(len(out) / SR - 1.0) < 0.05
