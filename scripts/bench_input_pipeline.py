"""Training input-pipeline throughput: can the host feed the chip?

(Round-2 verdict weak #4: the producer was never measured on real audio.)
Generates a synthetic on-disk WAV dataset, then measures the host-side
producer rate (decode + resample + collate) in mel-frames/s for:

  mel-path  per-item python decode + numpy log-mel (classic collate_batch)
  wav-path  native C++ threaded batch decode + pad only; mel moves into the
            train graph (Trainer(mel_in_graph=True), collate_wav_batch)
  mp3-path  same wav-path producer over an mp3 copy of the dataset (the
            Emilia pretraining format, 64 kbps 24 kHz mono) — decode by
            native/mp3dec.cpp
  flac-path same over a flac copy (native/flacdec.cpp)

Compare against the device consumption rate (~38.4k frames/s/chip,
scripts/bench_train.py).  Reference counterpart: torch DataLoader workers
(model/dataset.py:142-161 + Accelerate).

Usage: python scripts/bench_input_pipeline.py [n_files] [out_dir]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/f5_synth_wavs"
    # --train pins durations near one bucket so the step compiles ONCE (each
    # distinct (b, frames) shape costs a full remote compile on the tunnel)
    dur_lo, dur_hi = (9.6, 10.7) if "--train" in sys.argv else (3.0, 15.0)


    from f5_tts_tpu.audio.io import save_wav
    from f5_tts_tpu.ops.mel import MelConfig
    from f5_tts_tpu.train.dataset import (
        CustomDataset, DynamicBatchSampler, collate_batch, collate_wav_batch,
    )

    sr = 24_000
    mel_cfg = MelConfig()
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    rows = []
    t0 = time.perf_counter()
    for i in range(n_files):
        dur = float(rng.uniform(dur_lo, dur_hi))
        path = os.path.join(out_dir, f"utt_{i}.wav")
        if not os.path.isfile(path):
            wav = (np.sin(2 * np.pi * 220 * np.arange(int(dur * sr)) / sr)
                   * 0.3 + rng.standard_normal(int(dur * sr)) * 0.05).astype(np.float32)
            save_wav(path, wav, sr)
        rows.append({"audio_path": path, "text": "synthetic utterance " * 3, "duration": dur})
    print(f"dataset: {n_files} files, {sum(r['duration'] for r in rows):.0f} s audio "
          f"(gen {time.perf_counter()-t0:.1f}s)")

    ds = CustomDataset(rows, durations=[r["duration"] for r in rows], mel_cfg=mel_cfg)
    sampler = DynamicBatchSampler(ds, frames_threshold=38_400, max_samples=64, random_seed=0)
    batches = list(sampler)
    print(f"{len(batches)} batches")

    def frames_of(batch):
        return sum(int(np.ceil(ds.get_frame_len(i))) for i in batch)

    # mp3 + flac copies of the same dataset (Emilia's corpus format is mp3:
    # reference prepare_emilia_v2.py:35); encoded via the test oracles
    compressed = []
    try:
        from tests.oracles import codec_oracle
        from tests.oracles.flac_encoder import encode_flac
        from f5_tts_tpu.audio.io import load_wav

        for fmt in ("mp3", "flac"):
            fmt_rows = []
            for r in rows:
                path = r["audio_path"].replace(".wav", f".{fmt}")
                if not os.path.isfile(path):
                    wav, wsr = load_wav(r["audio_path"])
                    if fmt == "mp3":
                        blob = codec_oracle.lame_encode_mp3(wav, wsr, bitrate=64)
                    else:
                        ints = np.clip(wav * 32767, -32768, 32767).astype(np.int64)
                        blob = encode_flac(ints, wsr, bps=16, subframe="fixed-2")
                    open(path, "wb").write(blob)
                fmt_rows.append({**r, "audio_path": path})
            ds_c = CustomDataset(fmt_rows, durations=[r["duration"] for r in fmt_rows],
                                 mel_cfg=mel_cfg)
            compressed.append((fmt, ds_c))
    except Exception as e:  # oracles unavailable: wav rows still run
        print(f"(skipping mp3/flac rows: {e})")

    for name, fn in (
        ("wav-path (C++ batch decode + pad)",
         lambda b: collate_wav_batch(ds.wav_batch(b), None, "byte", mel_cfg)),
        *((f"{fmt}-path (C++ batch decode + pad)",
           lambda b, d=ds_c: collate_wav_batch(d.wav_batch(b), None, "byte", mel_cfg))
          for fmt, ds_c in compressed),
        ("mel-path (python decode + numpy mel)",
         lambda b: collate_batch([ds[i] for i in b], None, "byte")),
    ):
        fn(batches[0])  # warm (native lib build, imports)
        t0 = time.perf_counter()
        total_frames = 0
        for b in batches:
            out = fn(b)
            total_frames += int(out["lens"].sum())
        dt = time.perf_counter() - t0
        print(f"{name}: {total_frames/dt:,.0f} frames/s host feed "
              f"({dt:.2f}s for {total_frames} frames)")
    print("device consumption reference: ~38,400 frames/s/chip (bench_train.py)")

    if "--train" in sys.argv:
        train_e2e(rows, mel_cfg)


def train_e2e(rows, mel_cfg):
    """End-to-end: the REAL F5TTS_v1_Base Trainer with mel_in_graph=True
    consuming the on-disk wav dataset — proves no device stalls at the
    full-chip rate (verdict #4 done-criterion)."""
    import dataclasses
    import tempfile

    import jax

    from f5_tts_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    from f5_tts_tpu.models import dit
    from f5_tts_tpu.models.configs import MODEL_CONFIGS
    from f5_tts_tpu.train.dataset import CustomDataset
    from f5_tts_tpu.train.step import OptimConfig
    from f5_tts_tpu.train.trainer import Trainer

    model_cfg = MODEL_CONFIGS["F5TTS_v1_Base"]
    model_cfg = dataclasses.replace(
        model_cfg, arch=dataclasses.replace(model_cfg.arch, checkpoint_activations=True),
        tokenizer="byte",
    )
    ds = CustomDataset(rows, durations=[r["duration"] for r in rows], mel_cfg=mel_cfg)
    with tempfile.TemporaryDirectory() as ck:
        tr = Trainer(
            model_cfg, None, OptimConfig(mixed_precision=True, num_warmup_updates=10,
                                         total_updates=10_000),
            ckpt_dir=ck, batch_size_per_device=8192, max_samples=8,
            save_per_updates=100_000, last_per_updates=100_000, seed=0,
            mel_in_graph=True,
        )
        # the end-of-train checkpoint would fetch ~GBs of params through the
        # 10 MB/s tunnel — not what this bench measures
        tr.save_checkpoint = lambda *a, **k: None
        t0 = time.perf_counter()
        tr.train(dit.init(jax.random.PRNGKey(0), model_cfg.arch), ds, epochs=1, resume=False)
        print(f"epoch 1 (compiles): {time.perf_counter()-t0:.1f}s")
    # pass 2 in a fresh trainer: every graph is jit-cached in-process, so the
    # wall now spans ONLY producer + steps — stalls show up directly
    import math

    with tempfile.TemporaryDirectory() as ck2:
        tr2 = Trainer(
            model_cfg, None, OptimConfig(mixed_precision=True, num_warmup_updates=10,
                                         total_updates=10_000),
            ckpt_dir=ck2, batch_size_per_device=8192, max_samples=8,
            save_per_updates=100_000, last_per_updates=100_000, seed=0,
            mel_in_graph=True,
        )
        tr2.save_checkpoint = lambda *a, **k: None
        t0 = time.perf_counter()
        tr2.train(dit.init(jax.random.PRNGKey(0), model_cfg.arch), ds, epochs=1, resume=False)
        wall = time.perf_counter() - t0
    real_frames = sum(math.ceil(ds.get_frame_len(i)) for i in range(len(ds)))
    print(f"steady-state epoch: {wall:.1f}s for {real_frames} real frames -> "
          f"{real_frames/wall:,.0f} frames/s/chip end-to-end "
          f"(synthetic-tensor bench_train reference: ~38,400)")


if __name__ == "__main__":
    main()
