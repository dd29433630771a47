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


def test_native_cache_invalidates_on_overwrite(tmp_path):
    """Regression (advisor round 4): the per-thread decode cache was keyed on
    path only, so overwriting a file returned the stale previous decode.  Now
    keyed on (path, size, mtime) — a rewrite at the same path must re-decode,
    and a rewrite to garbage must be rejected, not served from cache."""
    p = str(tmp_path / "same_path.wav")
    sr = 24000
    t = np.arange(sr) / sr
    save_wav(p, (0.3 * np.sin(2 * np.pi * 220 * t)).astype(np.float32), sr)
    first = native_loader.load_wav_mono(p)
    assert first is not None and len(first[0]) == sr
    # Same length but different content (size unchanged -> mtime must differ).
    import time
    time.sleep(0.02)
    save_wav(p, (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32), sr)
    second = native_loader.load_wav_mono(p)
    assert second is not None
    assert not np.allclose(first[0], second[0]), "stale cached decode returned"
    # Overwrite with garbage: must reject, not return the cached decode.
    time.sleep(0.02)
    with open(p, "wb") as f:
        f.write(b"\x00" * 100)
    assert native_loader.load_wav_mono(p) is None


def test_native_batch_marks_bad_files(tmp_path, wav_files):
    bad = str(tmp_path / "not_a_wav.wav")
    open(bad, "w").write("junk")
    out, lens = native_loader.load_batch(wav_files + [bad], target_sr=24000, max_seconds=2.0)
    assert lens[-1] == -1
    assert (lens[:-1] > 0).all()


# ---------------------------------------------------------------------------
# mp3 / flac decode (native/mp3dec.cpp, native/flacdec.cpp)
# ---------------------------------------------------------------------------

from tests.oracles import codec_oracle
from tests.oracles.flac_encoder import encode_flac

_codec = pytest.mark.skipif(not codec_oracle.available(),
                            reason="system lame/mpg123 oracles unavailable")


def _tone(rate, seconds=1.2, stereo=False, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(rate * seconds)) / rate
    sig = 0.4 * np.sin(2 * np.pi * 313 * t) + 0.15 * np.sin(2 * np.pi * 1789 * t)
    sig = (sig + 0.08 * rng.standard_normal(len(t))).astype(np.float32)  # noise -> short blocks
    if stereo:
        return np.stack([sig, 0.8 * np.roll(sig, 64)], axis=1)
    return sig


@_codec
@pytest.mark.parametrize("rate,stereo,vbr", [
    (24000, False, False),   # the Emilia corpus operating point (MPEG-2 mono)
    (24000, True, True),
    (44100, True, False),    # MPEG-1 joint stereo
    (44100, False, True),
    (16000, False, False),
    (8000, False, False),    # MPEG-2.5 with its odd band tables
])
def test_mp3_decode_matches_mpg123(tmp_path, rate, stereo, vbr):
    pcm = _tone(rate, stereo=stereo)
    mp3 = codec_oracle.lame_encode_mp3(pcm, rate, bitrate=64 if rate <= 24000 else 128, vbr=vbr)
    p = str(tmp_path / "t.mp3")
    open(p, "wb").write(mp3)
    got = native_loader.load_wav_mono(p)
    assert got is not None
    wav, sr = got
    assert sr == rate
    ref, rsr = codec_oracle.mpg123_decode(p)
    ref = ref.mean(axis=1)
    assert rsr == rate
    m = min(len(wav), len(ref))
    assert abs(len(wav) - len(ref)) <= 1152  # at most one trailing frame
    assert np.abs(wav[:m] - ref[:m]).mean() < 1e-5


@_codec
def test_mp3_real_world_assets():
    import os
    for path in [
        "/opt/venv/lib/python3.12/site-packages/pygame/examples/data/house_lo.mp3",
        "/usr/lib/google-cloud-sdk/platform/gsutil/gslib/tests/test_data/test.mp3",
    ]:
        if not os.path.exists(path):
            continue
        got = native_loader.load_wav_mono(path)
        assert got is not None
        wav, sr = got
        ref, rsr = codec_oracle.mpg123_decode(path)
        ref = ref.mean(axis=1)
        assert sr == rsr
        m = min(len(wav), len(ref))
        assert m > sr  # at least a second decoded
        assert np.abs(wav[:m] - ref[:m]).mean() < 1e-5


@pytest.mark.parametrize("mode,sub,bps", [
    ("independent", "verbatim", 16),
    ("mid-side", "fixed-2", 16),
    ("left-side", "fixed-4", 24),
    ("right-side", "fixed-1", 12),
    ("independent", "constant", 16),
])
def test_flac_roundtrip_exact(tmp_path, mode, sub, bps):
    rng = np.random.default_rng(1)
    n, nch = 5000, (1 if mode == "independent" and sub == "verbatim" else 2)
    amp = (1 << (bps - 1)) - 2
    if sub == "constant":
        x = np.full((n, nch), 7, np.int64)
    else:
        t = np.arange(n)
        base = (amp * 0.4 * np.sin(2 * np.pi * t / 50)).astype(np.int64)
        x = np.stack([(base + rng.integers(-amp // 50, amp // 50, n)).clip(-amp, amp)
                      for _ in range(nch)], axis=1)
    data = encode_flac(x, 24000, bps=bps, block_size=1024, channel_mode=mode, subframe=sub)
    p = str(tmp_path / "t.flac")
    open(p, "wb").write(data)
    got = native_loader.load_wav_mono(p)
    assert got is not None
    wav, sr = got
    assert sr == 24000 and len(wav) == n
    want = (x.astype(np.float64).mean(axis=1) / (1 << (bps - 1))).astype(np.float32)
    np.testing.assert_array_equal(wav, want)


def test_flac_reference_assets_vs_sdl():
    import glob
    import os
    flacs = glob.glob("/root/reference/src/f5_tts/infer/examples/multi/*.flac")
    if not flacs:
        pytest.skip("reference flac assets not present")
    pytest.importorskip("pygame")
    for path in flacs:
        got = native_loader.load_wav_mono(path)
        assert got is not None
        wav, sr = got
        ref = codec_oracle.sdl_decode(path, sr, 1)
        m = min(len(wav), len(ref))
        assert abs(len(wav) - len(ref)) <= 1
        # lossless: identical int16-derived floats
        np.testing.assert_array_equal(wav[:m], ref[:m])


@_codec
def test_load_wav_dispatches_compressed(tmp_path):
    pcm = _tone(24000)
    mp3 = codec_oracle.lame_encode_mp3(pcm, 24000, bitrate=64)
    p_mp3 = str(tmp_path / "x.mp3")
    open(p_mp3, "wb").write(mp3)
    wav, sr = load_wav(p_mp3)  # io.load_wav content dispatch
    assert sr == 24000 and len(wav) > 24000

    ints = np.clip(pcm * 32767, -32768, 32767).astype(np.int64)
    p_flac = str(tmp_path / "x.flac")
    open(p_flac, "wb").write(encode_flac(ints, 24000, bps=16, subframe="fixed-2"))
    wav2, sr2 = load_wav(p_flac)
    assert sr2 == 24000 and len(wav2) == len(ints)
    # int16 truncation + 1/32768 scale: within 2 LSB of the float source
    np.testing.assert_allclose(wav2, pcm, atol=2.0 / 32768)


@_codec
def test_mixed_format_batch_load(tmp_path, wav_files):
    """wav + mp3 + flac in ONE threaded batch, resampled to 24 kHz."""
    pcm = _tone(44100, seconds=1.0)
    p_mp3 = str(tmp_path / "m.mp3")
    open(p_mp3, "wb").write(codec_oracle.lame_encode_mp3(pcm, 44100, bitrate=128))
    ints = np.clip(_tone(24000, seconds=1.0) * 32767, -32768, 32767).astype(np.int64)
    p_flac = str(tmp_path / "f.flac")
    open(p_flac, "wb").write(encode_flac(ints, 24000, bps=16))
    paths = wav_files + [p_mp3, p_flac]
    out, lens = native_loader.load_batch(paths, target_sr=24000, max_seconds=5.0)
    assert (lens > 0).all(), lens
    # flac at native rate: exact content
    np.testing.assert_allclose(out[-1, :lens[-1]],
                               ints.astype(np.float32) / 32768.0, atol=1e-6)
    # mp3 at 44.1k -> 24k: compare against oracle decode + scipy resample
    ref, _ = codec_oracle.mpg123_decode(p_mp3)
    ref24 = resample(ref.mean(axis=1), 44100, 24000)
    got = out[-2, :lens[-2]]
    m = min(len(got), len(ref24))
    assert np.abs(got[200:m - 200] - ref24[200:m - 200]).mean() < 5e-3


def test_decoder_fuzz_no_crash():
    """Corrupt bytes (truncation / bit flips / bursts / garbage) must be
    rejected or decoded to finite samples — never crash the decoder.  The
    harness runs in a CHILD process so a segfault fails this test instead of
    killing pytest (tests/fuzz_native_decoders.py; the loader ingests the
    training corpus unsupervised)."""
    import os
    import subprocess
    import sys

    script = os.path.join(os.path.dirname(__file__), "fuzz_native_decoders.py")
    r = subprocess.run([sys.executable, script, "0", "80"],
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, f"fuzz child died rc={r.returncode}\n{r.stdout}\n{r.stderr}"
    assert "PASS" in r.stdout or "SKIP" in r.stdout, r.stdout
