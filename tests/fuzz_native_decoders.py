"""Fuzz harness for the native audio decoders (child process).

Feeds truncations, single-bit flips, burst corruption, and magic-prefixed
random bytes for each container (wav / flac / mp3 when the lame oracle is
present) through ``native_loader.load_wav_mono``.  The decoders ingest the
training corpus unsupervised, so the robustness contract is: corrupt bytes
may be REJECTED (None) or decoded to finite samples — never a crash or
non-finite output.  A crash (segfault/abort) kills THIS process; the parent
test (tests/test_native_audio.py::test_decoder_fuzz_no_crash) runs it via
subprocess and checks the exit code, so pytest survives a decoder bug.

    python tests/fuzz_native_decoders.py [seed] [flips_per_format]

Reference behavior bar: the reference's loaders sit on torchaudio/pydub
(src/f5_tts/train/datasets/prepare_emilia.py:89-120), which tolerate
corrupt corpus entries by erroring per-file, not by crashing the worker.
"""
from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from f5_tts_tpu.audio import native_loader
from f5_tts_tpu.audio.io import save_wav


def build_seeds(rng, tmp: str) -> dict[str, bytes]:
    from tests.oracles import codec_oracle
    from tests.oracles.flac_encoder import encode_flac

    t = np.arange(int(24000 * 0.8)) / 24000.0
    sig = (0.4 * np.sin(2 * np.pi * 313 * t)
           + 0.05 * rng.standard_normal(len(t))).astype(np.float32)
    wav_p = os.path.join(tmp, "s.wav")
    save_wav(wav_p, sig, 24000)
    with open(wav_p, "rb") as f:
        wav_bytes = f.read()
    seeds = {"wav": wav_bytes,
             "flac": encode_flac((sig * 32767).astype(np.int16)[:, None], 24000)}
    if codec_oracle.available():
        seeds["mp3"] = codec_oracle.lame_encode_mp3(sig, 24000)
    return seeds


def main() -> None:
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    n_flips = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    rng = np.random.default_rng(seed)
    if not native_loader.native_available():
        print("SKIP native build unavailable")
        return
    with tempfile.TemporaryDirectory() as tmp:
        seeds = build_seeds(rng, tmp)
        stats = {"cases": 0, "ok": 0, "rejected": 0}

        # Unique path per case: the native layer keeps a per-thread decode
        # cache (keyed on path+size+mtime since the round-4 advisor finding);
        # a reused path made earlier fuzz runs hit the cache instead of the
        # decoders. Unique names guarantee every case reaches the decoder.
        def run(data: bytes) -> None:
            p = os.path.join(tmp, f"fuzz_{stats['cases']}.bin")
            with open(p, "wb") as f:
                f.write(data)
            r = native_loader.load_wav_mono(p)
            stats["cases"] += 1
            os.unlink(p)
            if r is None:
                stats["rejected"] += 1
                return
            wav, _sr = r
            assert len(wav) == 0 or np.isfinite(wav).all(), \
                "non-finite samples from corrupt input"
            stats["ok"] += 1

        for blob in seeds.values():
            n = len(blob)
            arr = np.frombuffer(blob, np.uint8).copy()
            # truncations: fine grid near the header, coarse grid over the body
            for cut in sorted(set(list(range(0, min(n, 128)))
                                  + list(range(0, n, max(1, n // 100))))):
                run(blob[:cut])
            for _ in range(n_flips):  # single-bit flips
                a2 = arr.copy()
                a2[int(rng.integers(0, n))] ^= 1 << int(rng.integers(0, 8))
                run(a2.tobytes())
            for _ in range(n_flips // 4):  # burst corruption
                m = int(rng.integers(16, 257))
                i = int(rng.integers(0, max(1, n - m)))
                a2 = arr.copy()
                a2[i:i + m] = rng.integers(0, 256, m, np.uint8)
                run(a2.tobytes())
            for _ in range(n_flips // 4):  # magic-prefixed random garbage
                run(blob[:4]
                    + rng.integers(0, 256, int(rng.integers(0, 4096)),
                                   np.uint8).tobytes())
        for _ in range(n_flips // 2):  # pure random blobs
            run(rng.integers(0, 256, int(rng.integers(0, 2048)),
                             np.uint8).tobytes())

    print(f"PASS cases={stats['cases']} decoded_ok={stats['ok']} "
          f"rejected={stats['rejected']}")


if __name__ == "__main__":
    main()
