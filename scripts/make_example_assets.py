"""Generate the bundled example reference clips under examples/assets/.

The reference ships real recorded prompts (infer/examples/basic/basic_ref_en.wav,
infer/examples/multi/*.flac) so `f5-tts_infer-cli` runs with zero user setup.
This environment has no recorded speech, so the bundled assets are
deterministic synthetic *speech-like* clips: a pitch-contoured harmonic
source shaped by two moving formant resonances with a syllabic amplitude
envelope — enough structure for the ref-audio preprocessing path (silence
clipping, RMS, mel) and demo runs with --init_random weights.  The two
multi-voice clips are written as FLAC through the repo's spec-fresh encoder
(tests/oracles/flac_encoder.py) so the demo exercises native/flacdec.cpp on
the inference path.

Run from the repo root:  python scripts/make_example_assets.py
The outputs are checked in; re-running must be byte-identical (fixed seed).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SR = 24000


def _speech_like(seconds: float, f0: float, formants, seed: int, syllable_hz: float = 3.2):
    """Deterministic voiced-speech-ish clip: harmonic stack with a pitch
    contour, two formant band emphases, syllabic AM, soft onset/offset."""
    rng = np.random.default_rng(seed)
    n = int(SR * seconds)
    t = np.arange(n) / SR
    # pitch contour: slow wander + declination, like a spoken phrase
    contour = f0 * (1.0 + 0.06 * np.sin(2 * np.pi * 0.7 * t + rng.uniform(0, 6)) - 0.05 * t / seconds)
    phase = 2 * np.pi * np.cumsum(contour) / SR
    src = np.zeros(n)
    for k in range(1, 13):  # harmonic stack, 1/k rolloff
        src += np.sin(k * phase + rng.uniform(0, 6)) / k
    # two formant emphases: ring the source at moving center frequencies
    out = 0.25 * src
    for fc, bw, gain in formants:
        fc_t = fc * (1.0 + 0.08 * np.sin(2 * np.pi * 0.9 * t + rng.uniform(0, 6)))
        out += gain * np.sin(np.cumsum(2 * np.pi * fc_t / SR)) * np.abs(src) / 3.0
        del bw
    # syllabic rhythm + a word gap in the middle, soft edges
    am = 0.55 + 0.45 * np.clip(np.sin(2 * np.pi * syllable_hz * t + rng.uniform(0, 6)), -0.2, 1.0)
    gap = np.ones(n)
    g0 = int(n * 0.48)
    gap[g0 : g0 + int(0.08 * SR)] = 0.05
    edge = np.minimum(1.0, np.minimum(t / 0.04, (seconds - t) / 0.06))
    wav = out * am * gap * np.clip(edge, 0.0, 1.0)
    wav = wav + 0.002 * rng.standard_normal(n)  # breath-noise floor
    return (0.28 * wav / np.max(np.abs(wav))).astype(np.float32)


def main():
    from f5_tts_tpu.audio.io import save_wav
    from tests.oracles.flac_encoder import encode_flac

    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "examples", "assets")
    os.makedirs(out_dir, exist_ok=True)

    basic = _speech_like(2.4, f0=150.0, formants=[(550, 80, 0.35), (1650, 120, 0.18)], seed=11)
    save_wav(os.path.join(out_dir, "basic_ref_en.wav"), basic, SR)

    main_v = _speech_like(2.1, f0=125.0, formants=[(500, 80, 0.35), (1500, 120, 0.2)], seed=23)
    town_v = _speech_like(1.9, f0=205.0, formants=[(720, 90, 0.3), (2100, 140, 0.22)],
                          seed=37, syllable_hz=4.1)
    for name, wav in [("main.flac", main_v), ("town.flac", town_v)]:
        pcm = np.clip(wav * 32767.0, -32768, 32767).astype(np.int16)[:, None]
        blob = encode_flac(pcm, SR, bps=16)
        with open(os.path.join(out_dir, name), "wb") as f:
            f.write(blob)
        print(f"wrote {name}: {len(blob)} bytes, {len(pcm)/SR:.2f}s")
    print(f"wrote basic_ref_en.wav: {basic.nbytes // 2} pcm bytes, {len(basic)/SR:.2f}s")


if __name__ == "__main__":
    main()
