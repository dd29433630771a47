"""Train a model IN THIS FRAMEWORK until it demonstrably speaks (probe scale).

Round-4 verdict: no model trained in this trainer had ever produced
text-ORDER-faithful output — probe-scale runs on the 10-tone corpus learned
text presence but generation followed the noise seed (DEVELOPMENT.md round-4
probe notes).  This script closes that with a corpus DESIGNED for learnable
alignment at probe scale (the round-5 verdict #2 recipe):

- 8-char vocab ('a'..'h' -> log-spaced pure tones, 220..1750 Hz), iid random
  sequences so the unconditional marginal carries no order information;
- short utterances (4-10 chars, 1.3-3.2 s) with EXACTLY 0.32 s per char
  (= 30 mel frames at hop 256: char k occupies frames [30k, 30k+30));
- duration proportional to char count, `text_embedding_average_upsampling`
  (char k's embedding spreads over its own frames -> the text->tone map is
  LOCAL, no long-range attention alignment needed);
- a SMALL DiT (default dim 128 / depth 4, ~4M params) that cannot descend
  the loss by memorizing the corpus and must read the conditioning.

Training uses the production Trainer (bf16 on TPU, mel-in-graph input
pipeline, orbax exact-resume between eval segments).  Every --eval-every
updates, held-out texts are sampled through the production `cfm.sample`
(NFE Euler, sway, fused CFG) and decoded back to characters by dominant mel
bin; CER comes from the eval subsystem's native edit-distance core
(eval/metrics.word_error_rate, the same WER path the reference feeds from an
external ASR, utils_eval.py:306-374).  Training stops when held-out
CER < --target-cer or --max-updates is reached.  The final eval synthesizes
through the FULL serving engine (bucketed fused graph + vocoder,
infer/engine.py) and reports engine-path CER, plus an order-sensitivity
diagnostic (velocity MSE for correct vs shuffled text at low t).

    python scripts/train_speak_probe.py                       # full probe
    python scripts/train_speak_probe.py --skip-train p.npz    # eval only
    python scripts/train_speak_probe.py --tiny --cpu          # CI smoke

Reference bar: the released checkpoints condition on text
(reference src/f5_tts/api.py:65-81); this is the probe-scale analog this
environment allows (no released weights, zero egress).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TONES = "abcdefgh"
SR = 24_000
CHAR_SECONDS = 0.32  # = 30 mel frames exactly (hop 256): no drift vs avg-upsample
FRAMES_PER_CHAR = 30


def tone_freq(idx: int) -> float:
    return 220.0 * 2.0 ** (idx * 3.0 / 7.0)  # 220 .. 1751 Hz, log-spaced


def synth_utterance(text: str, rng) -> np.ndarray:
    segs = []
    phase = 0.0
    n_seg = int(CHAR_SECONDS * SR)
    for ch in text:
        f = tone_freq(TONES.index(ch))
        t = np.arange(n_seg) / SR
        seg = 0.42 * np.sin(phase + 2 * np.pi * f * t)
        env = np.minimum(1.0, np.minimum(np.arange(n_seg), n_seg - np.arange(n_seg)) / (0.015 * SR))
        segs.append(seg * env)
        phase += 2 * np.pi * f * n_seg / SR
    wav = np.concatenate(segs)
    return (wav + 0.003 * rng.standard_normal(len(wav))).astype(np.float32)


def make_dataset(out_dir: str, n_files: int, rng, lo=4, hi=10):
    from f5_tts_tpu.audio.io import save_wav

    os.makedirs(out_dir, exist_ok=True)
    rows = []
    for i in range(n_files):
        n_chars = int(rng.integers(lo, hi + 1))
        text = "".join(TONES[j] for j in rng.integers(0, len(TONES), n_chars))
        path = os.path.join(out_dir, f"tone_{i}.wav")
        if not os.path.isfile(path):
            save_wav(path, synth_utterance(text, rng), SR)
        rows.append({"audio_path": path, "text": text,
                     "duration": n_chars * CHAR_SECONDS})
    return rows


def decode_tones(gen_mel: np.ndarray, n_chars: int, freqs: np.ndarray) -> str:
    """Per-char dominant mel bin -> nearest tone char.  gen_mel [frames, d]."""
    out = []
    for k in range(n_chars):
        seg = gen_mel[k * FRAMES_PER_CHAR + 4:(k + 1) * FRAMES_PER_CHAR - 4]
        if not len(seg):
            out.append("?")
            continue
        f = freqs[int(np.argmax(seg.mean(axis=0)))]
        out.append(TONES[int(np.argmin([abs(f - tone_freq(i)) for i in range(len(TONES))]))])
    return "".join(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--files", type=int, default=1024)
    ap.add_argument("--batch-frames", type=int, default=8192)
    ap.add_argument("--nfe", type=int, default=16)
    ap.add_argument("--cfg", type=float, default=2.0)
    ap.add_argument("--max-updates", type=int, default=20_000)
    ap.add_argument("--total-updates", type=int, default=None,
                    help="LR decay horizon (default: --max-updates); pin it to "
                    "compare runs with different stopping points fairly")
    ap.add_argument("--eval-every", type=int, default=1_000)
    ap.add_argument("--target-cer", type=float, default=0.05)
    ap.add_argument("--n-eval", type=int, default=24, help="held-out utterances")
    ap.add_argument("--out", default="/tmp/speak_probe_params.npz")
    ap.add_argument("--ckpt-dir", default="/tmp/speak_probe_ck")
    ap.add_argument("--skip-train", default=None,
                    help="saved params path: skip training, run evals only")
    ap.add_argument("--fresh", action="store_true",
                    help="wipe --ckpt-dir instead of resuming it")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tiny", action="store_true", help="CI smoke: tiny arch, few updates")
    ap.add_argument("--seed", type=int, default=0,
                    help="trainer seed (data order + per-step randomness stream); "
                    "the order-alignment 'click' update varies strongly by stream")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from f5_tts_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp

    from f5_tts_tpu.eval.metrics import word_error_rate
    from f5_tts_tpu.infer.engine import EngineOptions, InferenceEngine, pick_bucket
    from f5_tts_tpu.models import cfm, dit, vocos
    from f5_tts_tpu.models.configs import MODEL_CONFIGS
    from f5_tts_tpu.ops import mel as mel_ops
    from f5_tts_tpu.train.dataset import CustomDataset
    from f5_tts_tpu.train.step import OptimConfig
    from f5_tts_tpu.train.trainer import Trainer

    on_tpu = any(d.platform != "cpu" for d in jax.devices())
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    if args.tiny:
        args.dim, args.depth, args.heads = 64, 2, 2
        args.files, args.max_updates, args.eval_every = 12, 4, 4
        args.n_eval, args.nfe = 2, 2

    model_cfg = MODEL_CONFIGS["F5TTS_v1_Base"]
    model_cfg = dataclasses.replace(
        model_cfg, tokenizer="byte",
        arch=dataclasses.replace(
            model_cfg.arch, dim=args.dim, depth=args.depth, heads=args.heads,
            dim_head=args.dim // args.heads, text_dim=min(args.dim, 64),
            text_num_embeds=256, conv_layers=2,
            text_embedding_average_upsampling=True,
            # no remat: a dim-128 model's activations are nowhere near HBM
            # limits, and saving them all is the fastest probe configuration
            checkpoint_activations=False))
    arch = model_cfg.arch
    mel_cfg = model_cfg.mel
    backend = "train_auto" if on_tpu else "sdpa"

    rng = np.random.default_rng(0)
    rows = make_dataset("/tmp/speak_tone_ds", args.files, rng)
    ds = CustomDataset(rows, durations=[r["duration"] for r in rows], mel_cfg=mel_cfg)

    # ---- held-out eval set: ref prompt (4 chars) + gen text, one bucket
    eval_rng = np.random.default_rng(4242)
    bucket = 512 if not args.tiny else 256
    evals = []
    for _ in range(args.n_eval):
        ref_text = "".join(TONES[j] for j in eval_rng.integers(0, len(TONES), 4))
        n_gen = int(eval_rng.integers(6, 11)) if not args.tiny else 3
        gen_text = "".join(TONES[j] for j in eval_rng.integers(0, len(TONES), n_gen))
        ref_wav = synth_utterance(ref_text, eval_rng)
        ref_mel = mel_ops.log_mel_np(ref_wav, mel_cfg)[0]
        evals.append({"ref_text": ref_text, "gen_text": gen_text,
                      "ref_mel": ref_mel, "ref_len": len(ref_mel),
                      "duration": (len(ref_text) + len(gen_text)) * FRAMES_PER_CHAR})
    b_eval = len(evals)
    d = mel_cfg.n_mel_channels
    cond = np.zeros((b_eval, bucket, d), np.float32)
    tids = np.full((b_eval, bucket), -1, np.int32)
    durs = np.zeros((b_eval,), np.int32)
    rlens = np.zeros((b_eval,), np.int32)
    for i, e in enumerate(evals):
        cond[i, :e["ref_len"]] = e["ref_mel"]
        ids = np.frombuffer((e["ref_text"] + e["gen_text"]).encode(), np.uint8)
        tids[i, :len(ids)] = ids
        durs[i] = e["duration"]
        rlens[i] = e["ref_len"]
    noise = np.asarray(np.random.default_rng(7).standard_normal((b_eval, bucket, d)),
                       np.float32)

    fb = mel_ops._fbank_for(mel_cfg)  # noqa: SLF001 — [n_freqs, n_mels]
    fft_freqs = np.linspace(0, mel_cfg.target_sample_rate / 2, mel_cfg.n_fft // 2 + 1)
    bin_freqs = fft_freqs[np.argmax(fb, axis=0)]

    import functools

    @functools.partial(jax.jit, static_argnames=("cfg_strength",))
    def sample_fn(params, cfg_strength=args.cfg):
        opts = cfm.SampleOptions(steps=args.nfe, cfg_strength=cfg_strength)
        return cfm.sample(
            params, arch, jnp.asarray(cond, dtype), jnp.asarray(tids),
            jnp.asarray(durs), jnp.asarray(noise, dtype),
            lens=jnp.asarray(rlens), opts=opts,
            backend="auto" if on_tpu else "sdpa")

    def eval_cer(params, cfg_strength=args.cfg):
        """Mean held-out CER through production cfm.sample (the serving
        sampler; the engine wraps this same fn into the fused graph)."""
        params = jax.tree.map(
            lambda a: a.astype(dtype)
            if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a, params)
        out = np.asarray(sample_fn(params, cfg_strength=cfg_strength), np.float32)
        cers, accs, pairs = [], [], []
        for i, e in enumerate(evals):
            gen_mel = out[i, e["ref_len"]:e["duration"]]
            hyp = decode_tones(gen_mel, len(e["gen_text"]), bin_freqs)
            cers.append(word_error_rate(e["gen_text"], hyp, lang="zh"))
            accs.append(np.mean([a == b for a, b in zip(hyp, e["gen_text"])]))
            pairs.append((e["gen_text"], hyp))
        return float(np.mean(cers)), float(np.mean(accs)), pairs

    def save_params(params, path):
        leaves, tree_def = jax.tree.flatten(jax.tree.map(np.asarray, params))
        np.savez(path, __tree__=np.array(tree_def, dtype=object),
                 **{f"leaf_{i}": leaf for i, leaf in enumerate(leaves)})

    def load_params(path):
        blob = np.load(path, allow_pickle=True)
        tree_def = blob["__tree__"].item()
        return jax.tree.unflatten(tree_def, [blob[f"leaf_{i}"]
                                             for i in range(len(blob.files) - 1)])

    curve = []
    if args.skip_train:
        params = load_params(args.skip_train)
        print(f"loaded params from {args.skip_train}", file=sys.stderr)
        update = -1
    else:
        import math
        import shutil
        import signal

        if args.fresh:
            shutil.rmtree(args.ckpt_dir, ignore_errors=True)

        # CER evals run INSIDE the training loop via the trainer's
        # log_samples hook (3-arg form receives the ONLINE params — the EMA
        # at probe update counts is still the init snapshot).  Early stop
        # rides the production SIGTERM preemption path: the hook signals the
        # process, the in-flight step finishes, a durable model_last is
        # written, and train() returns cleanly.  (A segment-per-eval loop
        # with orbax re-resume also works but trips a tunnel-env device_put
        # flake on in-process restore-after-training; the hook design keeps
        # ONE train() call and no mid-run restores.)
        t_start = time.perf_counter()
        t_seg = [t_start]

        def eval_hook(ema_params, update, params):
            cer, acc, pairs = eval_cer(params)
            now = time.perf_counter()
            rec = {"update": int(update), "cer": round(cer, 4),
                   "tone_acc": round(acc, 4),
                   "wall_s": round(now - t_start, 1),
                   "seg_s": round(now - t_seg[0], 1)}
            t_seg[0] = now
            curve.append(rec)
            print(json.dumps(rec), flush=True)
            print(f"  e.g. '{pairs[0][0]}' -> '{pairs[0][1]}' | "
                  f"'{pairs[1][0]}' -> '{pairs[1][1]}'", file=sys.stderr)
            save_params(params, args.out)
            if cer < args.target_cer:
                print(f"target CER {args.target_cer} reached at update {update}; "
                      "stopping via the preemption path", file=sys.stderr)
                os.kill(os.getpid(), signal.SIGTERM)

        tr = Trainer(
            model_cfg, None,
            OptimConfig(mixed_precision=on_tpu, learning_rate=args.lr,
                        num_warmup_updates=min(500, args.max_updates // 4),
                        total_updates=args.total_updates or args.max_updates),
            ckpt_dir=args.ckpt_dir, batch_size_per_device=args.batch_frames,
            max_samples=64, save_per_updates=args.eval_every,
            keep_last_n_checkpoints=1, last_per_updates=10**9,
            seed=args.seed, mel_in_graph=True, log_samples_fn=eval_hook,
        )
        from f5_tts_tpu.train.dataset import DynamicBatchSampler

        per_epoch = len(DynamicBatchSampler(ds, frames_threshold=args.batch_frames,
                                            max_samples=64, random_seed=0))
        epochs = math.ceil(args.max_updates / per_epoch)
        print(f"{per_epoch} updates/epoch; eval every {args.eval_every} updates; "
              f"up to {epochs} epochs", file=sys.stderr)
        params0 = dit.init(jax.random.PRNGKey(0), arch)
        params, _, update = tr.train(params0, ds, epochs=epochs,
                                     resume=not args.fresh)
        if not curve or curve[-1]["update"] != int(update):
            cer, acc, _ = eval_cer(params)
            curve.append({"update": int(update), "cer": round(cer, 4),
                          "tone_acc": round(acc, 4),
                          "wall_s": round(time.perf_counter() - t_start, 1)})
            print(json.dumps(curve[-1]), flush=True)
            save_params(params, args.out)
        print(f"params saved to {args.out}", file=sys.stderr)

    if args.skip_train:
        cer, acc, pairs = eval_cer(params)
        curve.append({"update": -1, "cer": round(cer, 4), "tone_acc": round(acc, 4)})
        print(json.dumps(curve[-1]))

    # ---- order-sensitivity diagnostic: velocity MSE at low t for correct vs
    # shuffled text.  A model that reads char ORDER must produce different
    # velocities when the same bag of chars is permuted (round 4's failure
    # mode was exactly this MSE pinned at ~0).
    params_c = jax.tree.map(
        lambda a: a.astype(dtype)
        if jnp.issubdtype(jnp.asarray(a).dtype, jnp.floating) else a, params)
    tids_shuf = tids.copy()
    shuf_rng = np.random.default_rng(99)
    for i, e in enumerate(evals):
        n_ids = len(e["ref_text"]) + len(e["gen_text"])
        perm = shuf_rng.permutation(n_ids)
        tids_shuf[i, :n_ids] = tids[i, :n_ids][perm]

    @jax.jit
    def vel_at(params, ids, t):
        bb_mask = np.arange(bucket)[None, :] < durs[:, None]
        x_t = jnp.asarray(noise, dtype)  # t~0: input ~ pure noise
        te = dit.text_embedding(params, arch, jnp.asarray(ids), bucket,
                                lens=jnp.asarray(durs))
        step_cond = jnp.where((np.arange(bucket)[None, :] < rlens[:, None])[..., None],
                              jnp.asarray(cond, dtype), 0.0)
        v = dit.forward(params, arch, x_t, step_cond, te.astype(dtype),
                        jnp.full((b_eval,), t, dtype), mask=jnp.asarray(bb_mask),
                        backend="auto" if on_tpu else "sdpa")
        return v

    v_ok = np.asarray(vel_at(params_c, tids, 0.05), np.float32)
    v_sh = np.asarray(vel_at(params_c, tids_shuf, 0.05), np.float32)
    order_mse = float(np.mean((v_ok - v_sh) ** 2))
    print(f"order sensitivity @t=0.05 (correct vs shuffled text): "
          f"vel MSE {order_mse:.4f}", file=sys.stderr)

    # ---- THE serving path: synthesize through the fused engine graph
    # (bucketed NFE loop + vocoder in one XLA program, infer/engine.py) and
    # re-measure CER on the engine's mel output.
    voc = vocos.init(jax.random.PRNGKey(1))
    eng = InferenceEngine(params_c, model_cfg, vocoder_params=voc, dtype=dtype,
                          options=EngineOptions(nfe_step=args.nfe,
                                                cfg_strength=args.cfg))
    mels, wavs, _ = eng.generate_batch(
        [e["ref_mel"] for e in evals],
        [np.frombuffer((e["ref_text"] + e["gen_text"]).encode(), np.uint8).astype(np.int32)
         for e in evals],
        [e["duration"] for e in evals],
        seeds=list(range(b_eval)), fetch_mel=True)
    cers_e = []
    for i, e in enumerate(evals):
        gen_mel = np.asarray(mels[i][e["ref_len"]:e["duration"]], np.float32)
        hyp = decode_tones(gen_mel, len(e["gen_text"]), bin_freqs)
        cers_e.append(word_error_rate(e["gen_text"], hyp, lang="zh"))
    engine_cer = float(np.mean(cers_e))
    assert all(np.isfinite(np.asarray(w)).all() for w in wavs)
    print(f"engine-path CER (fused graph + vocoder, bucket "
          f"{pick_bucket(int(durs.max()))}): {engine_cer:.4f}", file=sys.stderr)

    print(json.dumps({
        "metric": "speak_probe",
        "cer_curve": curve,
        "final_cer": curve[-1]["cer"] if curve else None,
        "engine_cer": round(engine_cer, 4),
        "order_sensitivity_mse": round(order_mse, 4),
        "nfe": args.nfe, "cfg_strength": args.cfg,
        "arch": {"dim": args.dim, "depth": args.depth, "heads": args.heads},
    }))


if __name__ == "__main__":
    main()
