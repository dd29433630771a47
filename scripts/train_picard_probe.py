"""Train a REAL F5TTS_v1_Base on a synthetic tone language, then A/B the
time-parallel Picard sampler on the TRAINED weights.

Round-3 verdict #3: the Picard A/B had only ever run on random weights, whose
velocity field is not smooth in t — sweeps pin at the worst-case bound
(= NFE) and the 5th parallelism axis stays an unproven claim.  This script
produces the missing evidence end-to-end on the chip:

1. Generates a learnable dataset: each utterance is a sequence of pure tones
   keyed by its text characters ('a'..'j' -> log-spaced frequencies), so the
   CFM has real conditional structure to learn.
2. Trains F5TTS_v1_Base (bf16, remat, mel-in-graph input pipeline) for
   --epochs epochs with the production Trainer.
3. Verifies the model actually learned: generates NEW utterances from held-out
   text and checks the dominant mel bin per character against the expected
   tone (reported as tone_accuracy).
4. A/Bs sequential vs Picard sampling on in-distribution prompts over a tol
   sweep: measured sweeps, evals/step, single-chip RTF, mel MAE, and the
   multi-chip latency projection (per-chip serial evals ~= sweeps when the
   window spreads over the `data` mesh axis).

    python scripts/train_picard_probe.py --epochs 24 [--skip-train /tmp/...]

Outputs one JSON line per tol plus a summary; params are saved to --out so
the A/B can be re-run without re-training.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TONES = "abcdefghij"
SR = 24_000
CHAR_SECONDS = 0.35


def tone_freq(idx: int) -> float:
    return 220.0 * 2.0 ** (idx / 5.0)  # 220 Hz .. ~770 Hz, log-spaced


def synth_utterance(text: str, rng) -> np.ndarray:
    segs = []
    phase = 0.0
    n_seg = int(CHAR_SECONDS * SR)
    for ch in text:
        f = tone_freq(TONES.index(ch))
        t = np.arange(n_seg) / SR
        seg = 0.42 * np.sin(phase + 2 * np.pi * f * t)
        env = np.minimum(1.0, np.minimum(np.arange(n_seg), n_seg - np.arange(n_seg)) / (0.02 * SR))
        segs.append(seg * env)
        phase += 2 * np.pi * f * n_seg / SR
    wav = np.concatenate(segs)
    return (wav + 0.003 * rng.standard_normal(len(wav))).astype(np.float32)


def make_dataset(out_dir: str, n_files: int, rng):
    from f5_tts_tpu.audio.io import save_wav

    os.makedirs(out_dir, exist_ok=True)
    rows = []
    for i in range(n_files):
        n_chars = int(rng.integers(14, 27))
        text = "".join(TONES[j] for j in rng.integers(0, len(TONES), n_chars))
        path = os.path.join(out_dir, f"tone_{i}.wav")
        if not os.path.isfile(path):
            save_wav(path, synth_utterance(text, rng), SR)
        rows.append({"audio_path": path, "text": text,
                     "duration": n_chars * CHAR_SECONDS})
    return rows


def dominant_tone(mel_seg: np.ndarray, mel_filter_freqs: np.ndarray) -> int:
    """Map a mel segment's peak bin to the nearest tone index."""
    prof = mel_seg.mean(axis=0)
    peak_bin = int(np.argmax(prof))
    f = mel_filter_freqs[peak_bin]
    return int(np.argmin([abs(f - tone_freq(i)) for i in range(len(TONES))]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=96)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--files", type=int, default=192)
    ap.add_argument("--nfe", type=int, default=16)
    ap.add_argument("--window", type=int, default=8)
    ap.add_argument("--out", default="/tmp/picard_probe_params.npz")
    ap.add_argument("--tols", default="3e-2,1e-2,1e-3",
                    help="comma list; each tol is a separate XLA compile")
    ap.add_argument("--tol-main", type=float, default=1e-3, dest="tol_main",
                    help="tol for the engine wall-clock A/B (cached graph)")
    ap.add_argument("--skip-train", default=None,
                    help="path to previously saved params (skips training)")
    ap.add_argument("--init-params", default=None,
                    help="path to previously saved params to CONTINUE training "
                    "from (fresh optimizer/LR schedule) — probe-scale curriculum "
                    "without re-paying earlier updates")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tiny", action="store_true", help="tiny arch smoke (CPU CI)")
    ap.add_argument("--dim", type=int, default=0,
                    help="override arch width (0 = Base). A dim-256/depth-8 "
                    "model CONVERGES on the tone language in ~3k updates, "
                    "completing the evidence chain (Base at probe-scale "
                    "updates descends the loss but stays illegible)")
    ap.add_argument("--depth", type=int, default=0)
    ap.add_argument("--heads", type=int, default=0)
    ap.add_argument("--avg-upsample", action="store_true", dest="avg_upsample",
                    help="use text_embedding_average_upsampling (the v2/"
                    "ZipVoice text layout): char k's embedding spreads over "
                    "its OWN frames instead of sitting at frame k, making "
                    "the text->tone map local. The reference v1 layout needs "
                    "long-range attention alignment, which famously emerges "
                    "only after very long training — at probe scale its tone "
                    "accuracy stays at chance (~0.1) even with a cleanly "
                    "descending loss, while this mode becomes legible in a "
                    "few hundred updates, completing the end-to-end "
                    "train->sample->eval evidence on a real learned model")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from f5_tts_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    import dataclasses

    import jax.numpy as jnp

    from f5_tts_tpu.infer.engine import EngineOptions, InferenceEngine
    from f5_tts_tpu.models import cfm, dit, vocos
    from f5_tts_tpu.models.configs import MODEL_CONFIGS
    from f5_tts_tpu.ops import mel as mel_ops
    from f5_tts_tpu.train.dataset import CustomDataset
    from f5_tts_tpu.train.step import OptimConfig
    from f5_tts_tpu.train.trainer import Trainer

    on_tpu = any(d.platform != "cpu" for d in jax.devices())
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    model_cfg = MODEL_CONFIGS["F5TTS_v1_Base"]
    model_cfg = dataclasses.replace(model_cfg, tokenizer="byte")
    if args.tiny:
        model_cfg = dataclasses.replace(
            model_cfg, arch=dataclasses.replace(
                model_cfg.arch, dim=64, depth=2, heads=2, dim_head=32, text_dim=32,
                conv_layers=1))
    elif args.dim:
        heads = args.heads or max(2, args.dim // 64)
        model_cfg = dataclasses.replace(
            model_cfg, arch=dataclasses.replace(
                model_cfg.arch, dim=args.dim, depth=args.depth or 8, heads=heads,
                dim_head=args.dim // heads))
    if args.avg_upsample:
        model_cfg = dataclasses.replace(
            model_cfg, arch=dataclasses.replace(
                model_cfg.arch, text_embedding_average_upsampling=True))
    arch_remat = dataclasses.replace(model_cfg.arch, checkpoint_activations=True)

    rng = np.random.default_rng(0)
    rows = make_dataset("/tmp/picard_tone_ds", args.files if not args.tiny else 8, rng)
    mel_cfg = model_cfg.mel
    ds = CustomDataset(rows, durations=[r["duration"] for r in rows], mel_cfg=mel_cfg)

    if args.skip_train:
        blob = np.load(args.skip_train, allow_pickle=True)
        tree_def = blob["__tree__"].item()
        leaves = [blob[f"leaf_{i}"] for i in range(len(blob.files) - 1)]
        gen_params = jax.tree.unflatten(tree_def, leaves)
        print(f"loaded params from {args.skip_train}", file=sys.stderr)
    else:
        import shutil

        train_cfg = dataclasses.replace(model_cfg, arch=arch_remat)
        total_updates = max(args.epochs * 16, 200)
        ck = "/tmp/picard_probe_ck"
        shutil.rmtree(ck, ignore_errors=True)
        tr = Trainer(
            train_cfg, None,
            OptimConfig(mixed_precision=on_tpu, learning_rate=args.lr,
                        num_warmup_updates=100, total_updates=total_updates),
            ckpt_dir=ck, batch_size_per_device=8192 if not args.tiny else 2048,
            max_samples=16, save_per_updates=1_000_000,
            last_per_updates=1_000_000, seed=0, mel_in_graph=True,
        )
        tr.save_checkpoint = lambda *a, **k: None
        t0 = time.perf_counter()
        if args.init_params:
            blob = np.load(args.init_params, allow_pickle=True)
            tree_def = blob["__tree__"].item()
            leaves = [blob[f"leaf_{i}"] for i in range(len(blob.files) - 1)]
            params0 = jax.tree.unflatten(tree_def, leaves)
            print(f"continuing from {args.init_params}", file=sys.stderr)
        else:
            params0 = dit.init(jax.random.PRNGKey(0), train_cfg.arch)
        # generate from the final ONLINE params: at probe-scale update counts
        # the production EMA (decay .9999, every 10 steps after 100) is still
        # ~98% of the barely-trained step-110 snapshot — measured 0.09 tone
        # accuracy from EMA vs the online weights, with the same 2.1->0.4 loss
        gen_params, _, update = tr.train(params0, ds, epochs=args.epochs, resume=False)
        print(f"trained {update} updates in {time.perf_counter()-t0:.0f}s",
              file=sys.stderr)
        # loss trend from the trainer's JSONL log — the probe's evidence that
        # the CFM actually descended, independent of the tone-accuracy eval
        try:
            lines = [json.loads(x) for x in open(tr.log_file)]
            head = np.mean([x["loss"] for x in lines[:20]])
            tail = np.mean([x["loss"] for x in lines[-20:]])
            print(f"loss trend: first20 {head:.4f} -> last20 {tail:.4f}", file=sys.stderr)
        except OSError:
            pass
        leaves, tree_def = jax.tree.flatten(jax.tree.map(np.asarray, gen_params))
        np.savez(args.out, __tree__=np.array(tree_def, dtype=object),
                 **{f"leaf_{i}": l for i, l in enumerate(leaves)})
        print(f"params saved to {args.out}", file=sys.stderr)

    # raw cfm.sample calls below run params at the compute dtype (the engines
    # cast internally; f32 params x bf16 activations would promote the ODE
    # carry — see cfm.py ode_step's compute_dtype cast)
    gen_params = jax.tree.map(
        lambda a: a.astype(dtype) if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a,
        gen_params)

    voc = vocos.init(jax.random.PRNGKey(1))

    # ---- did it learn? generate from held-out text, check tones
    probe_rng = np.random.default_rng(1234)
    ref_text = "".join(TONES[j] for j in probe_rng.integers(0, len(TONES), 6))
    gen_text = "".join(TONES[j] for j in probe_rng.integers(0, len(TONES), 22))
    ref_wav = synth_utterance(ref_text, probe_rng)
    ref_mel = mel_ops.log_mel_np(ref_wav, mel_cfg)[0]
    frames_per_char = CHAR_SECONDS * SR / mel_cfg.hop_length
    duration = int(round((len(ref_text) + len(gen_text)) * frames_per_char))
    text_ids = np.frombuffer((ref_text + gen_text).encode(), np.uint8).astype(np.int32)

    eng_seq = InferenceEngine(gen_params, model_cfg, vocoder_params=voc, dtype=dtype,
                              options=EngineOptions(nfe_step=args.nfe))
    mels, _, _ = eng_seq.generate_batch([ref_mel], [text_ids], [duration], seeds=[0])
    gen_mel = np.asarray(mels[0][len(ref_mel):], np.float32)
    fb = mel_ops._fbank_for(mel_cfg)  # noqa: SLF001 — [n_freqs, n_mels]
    fft_freqs = np.linspace(0, mel_cfg.target_sample_rate / 2, mel_cfg.n_fft // 2 + 1)
    freqs = fft_freqs[np.argmax(fb, axis=0)]
    decoded = []
    for k in range(len(gen_text)):
        lo = int(k * frames_per_char)
        hi = int((k + 1) * frames_per_char)
        seg = gen_mel[lo + 2:hi - 2]
        decoded.append(TONES[dominant_tone(seg, freqs)] if len(seg) else "?")
    hits = sum(d == ch for d, ch in zip(decoded, gen_text))
    tone_acc = hits / len(gen_text)
    # character error rate through the eval subsystem's native edit-distance
    # core (eval/metrics.py) — the same WER path the reference's utils_eval
    # uses, fed by the tone decoder instead of an external ASR model
    from f5_tts_tpu.eval.metrics import word_error_rate

    tone_cer = word_error_rate(gen_text, "".join(decoded), lang="zh")
    print(f"tone_accuracy (held-out text, NFE {args.nfe}): {tone_acc:.2f}; "
          f"decoded '{''.join(decoded)}' vs '{gen_text}' -> CER {tone_cer:.2f}",
          file=sys.stderr)

    # ---- A/B: sequential vs picard over a tol sweep
    seq_mel = mels[0]
    t0 = time.perf_counter()
    iters = 4 if on_tpu else 1
    for i in range(iters):
        eng_seq.generate_batch([ref_mel], [text_ids], [duration], seeds=[0], fetch_mel=False)
    seq_wall = (time.perf_counter() - t0) / iters

    # Engine-level wall A/B at the main tol only (each tol bakes into the
    # graph, so every extra tol is a full remote XLA compile through the
    # tunnel — at tol 1e-3 / NFE 16 / w8 / bucket 1024 both graphs are
    # already in the persistent cache from scripts/picard_ab.py).
    eng_p = InferenceEngine(gen_params, model_cfg, vocoder_params=voc, dtype=dtype,
                            options=EngineOptions(nfe_step=args.nfe,
                                                  time_parallel_window=args.window,
                                                  picard_tol=args.tol_main))
    mels_p, _, _ = eng_p.generate_batch([ref_mel], [text_ids], [duration], seeds=[0])
    t0 = time.perf_counter()
    for i in range(iters):
        eng_p.generate_batch([ref_mel], [text_ids], [duration], seeds=[0], fetch_mel=False)
    pic_wall = (time.perf_counter() - t0) / iters
    wall_mae = float(np.abs(np.asarray(mels_p[0]) - np.asarray(seq_mel)).mean())

    from f5_tts_tpu.infer.engine import pick_bucket

    bucket = pick_bucket(duration)
    cond = np.zeros((1, bucket, mel_cfg.n_mel_channels), np.float32)
    cond[0, :len(ref_mel)] = ref_mel
    tids = np.full((1, bucket), -1, np.int32)
    tids[0, :len(text_ids)] = text_ids
    noise = jax.random.normal(jax.random.PRNGKey(7), cond.shape, jnp.float32)

    def raw_sample(tol_or_none):
        opts = cfm.SampleOptions(
            steps=args.nfe,
            time_parallel_window=args.window if tol_or_none is not None else 0,
            picard_tol=tol_or_none if tol_or_none is not None else 1e-3)
        return cfm.sample(
            gen_params, model_cfg.arch, jnp.asarray(cond, dtype), jnp.asarray(tids),
            jnp.asarray([duration]), noise.astype(dtype),
            lens=jnp.asarray([len(ref_mel)]),
            opts=opts, backend="auto" if on_tpu else "sdpa", return_info=True)

    seq_raw, _ = raw_sample(None)
    reports = []
    for tol in [float(t) for t in args.tols.split(",")]:
        pic_raw, info = raw_sample(tol)
        sweeps = int(info["sweeps"])
        mae = float(np.abs(np.asarray(pic_raw, np.float32) -
                           np.asarray(seq_raw, np.float32)).mean())
        rep = {
            "tol": tol,
            "sweeps": sweeps,
            "nfe": args.nfe,
            "evals_per_step": round(sweeps * min(args.window, args.nfe) / args.nfe, 2),
            "mel_mae_vs_sequential": round(mae, 5),
            # W chips integrate the window concurrently: per-chip serial model
            # evals ~= sweeps (+ vocoder); sequential does NFE serial evals.
            "projected_multichip_eval_ratio": round(args.nfe / max(sweeps, 1), 2),
        }
        if tol == args.tol_main:
            rep["rtf_sequential"] = round(seq_wall / (duration * mel_cfg.hop_length / SR), 5)
            rep["rtf_picard_1chip"] = round(pic_wall / (duration * mel_cfg.hop_length / SR), 5)
            rep["engine_mel_mae"] = round(wall_mae, 5)
        reports.append(rep)
        print(json.dumps(rep))

    print(json.dumps({
        "metric": "picard_trained_probe",
        "tone_accuracy": round(tone_acc, 3),
        "tone_cer": round(tone_cer, 3),
        "window": args.window,
        "best_sweeps": min(r["sweeps"] for r in reports),
        "sequential_worst_case": args.nfe,
    }))


if __name__ == "__main__":
    main()
