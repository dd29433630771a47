"""Parity check against RELEASED checkpoints (run when weights are available).

All in-repo parity tests use fresh random weights shared between jax and the
torch oracles; this script closes the remaining gap by running the SAME
comparison with a real released checkpoint loaded into both sides:

  1. the torch state dict is converted to the native pytree (utils/ckpt.py);
  2. one fused-CFG guided-velocity step (the NFE loop body, reference
     backbones/dit.py:337-346) runs in jax and in the freshly-written torch
     oracle (tests/oracles/torch_dit.py) on identical inputs;
  3. a short NFE-4 sample runs through both full samplers with injected noise
     (reference cfm.py:83-229);
  4. optional: Vocos decode parity when --vocoder_local_path is given.

Usage:
  python scripts/parity_vs_released.py --ckpt_file model_1250000.safetensors \
      [--model F5TTS_v1_Base] [--vocab_file vocab.txt] \
      [--vocoder_local_path vocos_pytorch_model.bin] [--seq_len 256]

Exit code 0 iff every MAE is under its threshold (mel-domain gate 1e-2 per
BASELINE.md; fp32 typically lands ~1e-4).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt_file", required=True)
    p.add_argument("--model", default="F5TTS_v1_Base")
    p.add_argument("--model_cfg", default=None,
                   help="JSON arch dict overriding --model (custom checkpoints)")
    p.add_argument("--vocab_file", default="")
    p.add_argument("--vocoder_local_path", default=None)
    p.add_argument("--seq_len", type=int, default=256)
    p.add_argument("--text_len", type=int, default=48)
    p.add_argument("--nfe", type=int, default=4)
    p.add_argument("--use_ema", action="store_true", default=True)
    p.add_argument("--threshold", type=float, default=1e-2)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import torch

    jax.config.update("jax_platforms", "cpu")  # fp32 parity, no tunnel variance
    jax.config.update("jax_default_matmul_precision", "highest")

    from f5_tts_tpu.models import cfm as C
    from f5_tts_tpu.models import dit as D
    from f5_tts_tpu.models.configs import MODEL_CONFIGS, with_vocab_size
    from f5_tts_tpu.text.tokenizer import get_tokenizer
    from f5_tts_tpu.utils import ckpt as ckpt_util
    from tests.oracles import torch_dit as OD
    from tests.test_cfm import torch_sample_oracle

    if args.model_cfg:
        import json

        from f5_tts_tpu.models import configs as configs_mod

        arch_kw = json.loads(args.model_cfg)
        model_cfg = configs_mod.from_yaml_dict(
            {"name": args.model, "backbone": arch_kw.pop("backbone", "DiT"),
             "arch": arch_kw})
    else:
        model_cfg = MODEL_CONFIGS[args.model]
    _, vocab_size = get_tokenizer(args.vocab_file or None, model_cfg.tokenizer)
    model_cfg = with_vocab_size(model_cfg, vocab_size)
    cfg = model_cfg.arch

    print(f"loading {args.ckpt_file} (use_ema={args.use_ema}) ...")
    state = ckpt_util.load_torch_state(args.ckpt_file, use_ema=args.use_ema)
    params = ckpt_util.params_from_state(state, cfg)

    rng = np.random.default_rng(5)
    b, n, nt = 1, args.seq_len, args.text_len
    x = rng.standard_normal((b, n, cfg.mel_dim)).astype(np.float32)
    cond = rng.standard_normal((b, n, cfg.mel_dim)).astype(np.float32)
    text = rng.integers(0, cfg.text_num_embeds, (b, nt)).astype(np.int32)
    time = np.array([0.4], dtype=np.float32)
    lens = np.array([n - 30], dtype=np.int32)
    mask = np.arange(n)[None, :] < lens[:, None]

    failures = []

    # --- 1 step of fused-CFG guided velocity -------------------------------
    te_c = D.text_embedding(params, cfg, jnp.asarray(text), n, lens=jnp.asarray(lens))
    te_u = D.text_embedding(params, cfg, jnp.asarray(text), n, lens=jnp.asarray(lens),
                            drop_text=True)
    pred, null = D.forward_cfg(
        params, cfg, jnp.asarray(x), jnp.asarray(cond), te_c, te_u,
        jnp.asarray(time), mask=jnp.asarray(mask), backend="sdpa")
    v_jax = np.asarray(pred + (pred - null) * 2.0)

    tx, tc = torch.from_numpy(x), torch.from_numpy(cond)
    tt, ttime = torch.from_numpy(text).long(), torch.from_numpy(time)
    tmask, tlens = torch.from_numpy(mask), torch.from_numpy(lens).long()
    with torch.no_grad():
        p_t = OD.forward(params, cfg, tx, tc, tt, ttime, mask=tmask, lens=tlens)
        u_t = OD.forward(params, cfg, tx, torch.zeros_like(tc), tt, ttime,
                         mask=tmask, lens=tlens, drop_audio_cond=True, drop_text=True)
    v_torch = (p_t + (p_t - u_t) * 2.0).numpy()
    mae = np.abs(v_jax - v_torch).mean()
    print(f"CFG ODE-step velocity MAE: {mae:.3e} (threshold {args.threshold})")
    if not mae < args.threshold:
        failures.append(f"ode_step mae {mae:.3e}")

    # --- NFE-k sample ------------------------------------------------------
    noise = rng.standard_normal((b, n, cfg.mel_dim)).astype(np.float32)
    duration = np.array([n - 8], dtype=np.int32)
    cond_s = cond.copy()
    cond_s[0, int(lens[0]):] = 0.0
    opts = C.SampleOptions(steps=args.nfe, cfg_strength=2.0, sway_sampling_coef=-1.0)
    got = np.asarray(C.sample(
        params, cfg, jnp.asarray(cond_s), jnp.asarray(text), jnp.asarray(duration),
        jnp.asarray(noise), lens=jnp.asarray(lens), opts=opts, backend="sdpa"))
    want = torch_sample_oracle(
        params, cfg, torch.from_numpy(cond_s), torch.from_numpy(text).long(),
        torch.from_numpy(duration).long(), torch.from_numpy(noise),
        torch.from_numpy(lens).long(), steps=args.nfe, cfg_strength=2.0, sway=-1.0,
    ).numpy()
    mae_s = np.abs(got - want).mean()
    print(f"NFE-{args.nfe} sampled-mel MAE: {mae_s:.3e} (threshold {args.threshold})")
    if not mae_s < args.threshold:
        failures.append(f"sample mae {mae_s:.3e}")

    # --- Vocoder -----------------------------------------------------------
    if args.vocoder_local_path:
        from f5_tts_tpu.models import vocos as V

        vstate = ckpt_util.load_torch_state(args.vocoder_local_path, use_ema=False)
        vparams = ckpt_util.vocos_params_from_state(vstate)
        mel = got[..., : model_cfg.mel.n_mel_channels].transpose(0, 2, 1)
        wav = np.asarray(V.decode(vparams, jnp.asarray(mel)))
        print(f"vocos decode ok: wav shape {wav.shape}, "
              f"rms {np.sqrt(np.mean(wav ** 2)):.4f} (torch-side vocos not "
              f"vendored; decode parity is covered by tests/test_vocos.py)")

    if failures:
        print("PARITY FAIL:", "; ".join(failures))
        return 1
    print("PARITY OK: released checkpoint matches the torch oracle within "
          f"{args.threshold} mel MAE")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
