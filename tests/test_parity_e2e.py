"""End-to-end parity: full NFE-16 EPSS+sway CFG sampling vs the torch oracle.

BASELINE.md acceptance metric: mel MAE < 1e-2 vs the PyTorch reference.  Noise
is injected (shared) so the comparison isolates model/sampler numerics from
RNG differences, per SURVEY §7.3.
"""

import jax.numpy as jnp
import numpy as np
import torch

from f5_tts_tpu.models import cfm as C
from tests.oracles import torch_dit as OD
from tests.test_cfm import torch_sample_oracle
from tests.test_dit import SMALL, make_params


def test_full_nfe16_mel_mae_under_baseline_threshold():
    cfg = SMALL
    params = make_params(cfg)
    rng = np.random.default_rng(77)
    b, n, nt = 1, 64, 12
    cond = rng.standard_normal((b, n, cfg.mel_dim)).astype(np.float32)
    lens = np.array([16], dtype=np.int32)
    cond[0, 16:] = 0.0
    text = rng.integers(0, cfg.text_num_embeds, (b, nt)).astype(np.int32)
    duration = np.array([60], dtype=np.int32)
    noise = rng.standard_normal((b, n, cfg.mel_dim)).astype(np.float32)

    opts = C.SampleOptions(steps=16, cfg_strength=2.0, sway_sampling_coef=-1.0, use_epss=True)
    got = np.asarray(
        C.sample(params, cfg, jnp.asarray(cond), jnp.asarray(text), jnp.asarray(duration),
                 jnp.asarray(noise), lens=jnp.asarray(lens), opts=opts, backend="sdpa")
    )
    want = torch_sample_oracle(
        params, cfg, torch.from_numpy(cond), torch.from_numpy(text).long(),
        torch.from_numpy(duration).long(), torch.from_numpy(noise),
        torch.from_numpy(lens).long(), steps=16, cfg_strength=2.0, sway=-1.0,
    ).numpy()
    mae = np.abs(got - want).mean()
    assert mae < 1e-2, f"e2e mel MAE {mae} exceeds the 1e-2 BASELINE threshold"
    # fp32 component parity holds much tighter than the acceptance bound
    assert mae < 1e-3, mae


def test_bf16_inference_deviation_bounded():
    """bf16 (the TPU serving dtype) tracks the fp32 sampler within a loose
    envelope on log-mel scale — sanity check that mixed precision doesn't
    destabilize the ODE."""
    from f5_tts_tpu.utils.ckpt import params_astype

    cfg = SMALL
    params = make_params(cfg)
    rng = np.random.default_rng(99)
    b, n = 1, 64
    cond = rng.standard_normal((b, n, cfg.mel_dim)).astype(np.float32)
    lens = np.array([16], np.int32)
    cond[0, 16:] = 0.0
    text = rng.integers(0, cfg.text_num_embeds, (b, 10)).astype(np.int32)
    duration = np.array([56], np.int32)
    noise = rng.standard_normal((b, n, cfg.mel_dim)).astype(np.float32)
    opts = C.SampleOptions(steps=16)

    out32 = np.asarray(C.sample(params, cfg, jnp.asarray(cond), jnp.asarray(text),
                                jnp.asarray(duration), jnp.asarray(noise),
                                lens=jnp.asarray(lens), opts=opts, backend="sdpa"))
    p16 = params_astype(params, jnp.bfloat16)
    out16 = np.asarray(C.sample(p16, cfg, jnp.asarray(cond, jnp.bfloat16), jnp.asarray(text),
                                jnp.asarray(duration), jnp.asarray(noise, jnp.bfloat16),
                                lens=jnp.asarray(lens), opts=opts, backend="sdpa")).astype(np.float32)
    mae = np.abs(out32 - out16).mean()
    assert np.isfinite(out16).all()
    assert mae < 0.15, mae  # bf16 step noise stays well under perceptual scale
