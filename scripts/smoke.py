"""One-command smoke test: synthesizes audio end-to-end with a tiny random
model on whatever device is available (CPU works).  Verifies the full chain:
text -> tokenize -> CFM ODE -> vocoder -> wav file.

    python scripts/smoke.py [out.wav]
"""

import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    out_path = sys.argv[1] if len(sys.argv) > 1 else "smoke_out.wav"
    import jax

    from f5_tts_tpu.audio.io import save_wav
    from f5_tts_tpu.infer.api import F5TTS

    print(f"devices: {jax.devices()}")
    sr = 24000
    t = np.arange(int(sr * 1.5)) / sr
    ref = (0.2 * np.sin(2 * np.pi * 220 * t) * (0.6 + 0.4 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)
    ref_path = "/tmp/smoke_ref.wav"
    save_wav(ref_path, ref, sr)

    tts = F5TTS(model="F5TTS_Tiny", init_random=True, nfe_step=4, device="cpu")
    wav, out_sr, spec = tts.infer(
        ref_path, "a simple reference tone.",
        "the quick brown fox jumps over the lazy dog.",
        seed=0, file_wave=out_path, show_info=print,
    )
    assert wav is not None and np.isfinite(wav).all()
    print(f"ok: {out_path} ({len(wav)/out_sr:.2f}s @ {out_sr} Hz, "
          f"mel {spec.shape[0]}x{spec.shape[1]}, seed {tts.seed})")


if __name__ == "__main__":
    main()
