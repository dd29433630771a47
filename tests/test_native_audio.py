"""Native C++ audio loader parity vs the scipy path."""

import numpy as np
import pytest

from f5_tts_tpu.audio import native_loader
from f5_tts_tpu.audio.io import load_wav, resample, save_wav

pytestmark = pytest.mark.skipif(not native_loader.native_available(),
                                reason="native audioio build unavailable")


@pytest.fixture()
def wav_files(tmp_path):
    paths = []
    rng = np.random.default_rng(0)
    for i, sr in enumerate([24000, 16000, 44100]):
        t = np.arange(int(sr * 1.3)) / sr
        wav = (0.3 * np.sin(2 * np.pi * (220 + 40 * i) * t)).astype(np.float32)
        p = str(tmp_path / f"w{i}.wav")
        save_wav(p, wav, sr)
        paths.append(p)
    return paths


def test_native_wav_read_matches_scipy(wav_files):
    for p in wav_files:
        got = native_loader.load_wav_mono(p)
        assert got is not None
        wav_n, sr_n = got
        wav_s, sr_s = load_wav(p)
        assert sr_n == sr_s
        assert len(wav_n) == len(wav_s)
        np.testing.assert_allclose(wav_n, wav_s, atol=1e-4)


def test_native_batch_load_with_resample(wav_files):
    out, lens = native_loader.load_batch(wav_files, target_sr=24000, max_seconds=5.0)
    assert out.shape[0] == 3 and (lens > 0).all()
    for i, p in enumerate(wav_files):
        wav_s, sr = load_wav(p)
        ref = resample(wav_s, sr, 24000)
        got = out[i, : lens[i]]
        assert abs(len(got) - len(ref)) <= 2
        m = min(len(got), len(ref))
        # interior parity (resampler families differ slightly at edges)
        lo, hi = 200, m - 200
        err = np.abs(got[lo:hi] - ref[lo:hi]).mean()
        assert err < 5e-3, err


def test_native_batch_marks_bad_files(tmp_path, wav_files):
    bad = str(tmp_path / "not_a_wav.wav")
    open(bad, "w").write("junk")
    out, lens = native_loader.load_batch(wav_files + [bad], target_sr=24000, max_seconds=2.0)
    assert lens[-1] == -1
    assert (lens[:-1] > 0).all()
