"""Full-size architecture parity vs the torch oracles (slow).

All other parity tests run toy configs; these run the REAL released
geometries — F5TTS_v1_Base DiT (dim 1024, depth 22, heads 16, text_dim 512,
conv_layers 4; reference backbones/dit.py:170-370 + configs/F5TTS_v1_Base.yaml)
and E2TTS_Base UNetT (dim 1024, depth 24, ff_mult 4; unett.py:108-307) — so
scan stacking, the 8192-pos RoPE/abs-pos tables, and full-depth numerics are
exercised at scale.  Acceptance: mel MAE < 1e-2 (BASELINE.md), expected ~1e-4
in fp32.

Run explicitly with: pytest tests/test_parity_fullarch.py -m slow
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from f5_tts_tpu.models import cfm as C
from f5_tts_tpu.models import dit as D
from f5_tts_tpu.models import unett as U
from f5_tts_tpu.models.configs import MODEL_CONFIGS
from tests.oracles import torch_dit as OD
from tests.oracles import torch_unett as OU
from tests.test_cfm import torch_sample_oracle
from tests.test_dit import make_params

pytestmark = pytest.mark.slow

B, N, NT = 1, 256, 48


def _full_dit():
    return MODEL_CONFIGS["F5TTS_v1_Base"].arch


def _inputs(cfg, seed=5, n=N, nt=NT):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((B, n, cfg.mel_dim)).astype(np.float32)
    cond = rng.standard_normal((B, n, cfg.mel_dim)).astype(np.float32)
    text = rng.integers(0, cfg.text_num_embeds, (B, nt)).astype(np.int32)
    time = np.array([0.4], dtype=np.float32)
    mask = np.zeros((B, n), dtype=bool)
    mask[0, : n - 30] = True
    return x, cond, text, time, mask


def test_fullarch_dit_cfg_ode_step():
    """One fused-CFG guided velocity (the ODE step body) at full v1_Base size
    matches two independent torch oracle forwards (reference dit.py:337-346)."""
    cfg = _full_dit()
    params = make_params(cfg)
    x, cond, text, time, mask = _inputs(cfg)
    lens = np.asarray(mask.sum(axis=1), np.int32)

    te_c = D.text_embedding(params, cfg, jnp.asarray(text), N, lens=jnp.asarray(lens))
    te_u = D.text_embedding(params, cfg, jnp.asarray(text), N, lens=jnp.asarray(lens),
                            drop_text=True)
    pred, null = D.forward_cfg(params, cfg, jnp.asarray(x), jnp.asarray(cond),
                               te_c, te_u, jnp.asarray(time),
                               mask=jnp.asarray(mask), backend="sdpa")
    guided = np.asarray(pred + (pred - null) * 2.0)

    tx = torch.from_numpy(x)
    tc = torch.from_numpy(cond)
    tt = torch.from_numpy(text).long()
    ttime = torch.from_numpy(time)
    tmask = torch.from_numpy(mask)
    tlens = torch.from_numpy(lens).long()
    w_pred = OD.forward(params, cfg, tx, tc, tt, ttime, mask=tmask, lens=tlens).numpy()
    w_null = OD.forward(params, cfg, tx, torch.zeros_like(tc), tt, ttime, mask=tmask,
                        lens=tlens, drop_audio_cond=True, drop_text=True).numpy()
    want = w_pred + (w_pred - w_null) * 2.0

    mm = mask[:, :, None]
    mae = np.abs((guided - want) * mm).mean()
    assert mae < 1e-2, f"full-arch CFG step MAE {mae}"
    assert mae < 2e-3, mae  # fp32 tracks far tighter than the acceptance bound


def test_fullarch_dit_nfe4_sample():
    """Short NFE-4 EPSS+sway sample at full v1_Base size vs the torch sampler
    oracle (reference cfm.py:83-229)."""
    cfg = _full_dit()
    params = make_params(cfg)
    rng = np.random.default_rng(21)
    cond = rng.standard_normal((B, N, cfg.mel_dim)).astype(np.float32)
    lens = np.array([64], np.int32)
    cond[0, 64:] = 0.0
    text = rng.integers(0, cfg.text_num_embeds, (B, 40)).astype(np.int32)
    duration = np.array([250], np.int32)
    noise = rng.standard_normal((B, N, cfg.mel_dim)).astype(np.float32)

    opts = C.SampleOptions(steps=4, cfg_strength=2.0, sway_sampling_coef=-1.0, use_epss=True)
    got = np.asarray(
        C.sample(params, cfg, jnp.asarray(cond), jnp.asarray(text), jnp.asarray(duration),
                 jnp.asarray(noise), lens=jnp.asarray(lens), opts=opts, backend="sdpa")
    )
    want = torch_sample_oracle(
        params, cfg, torch.from_numpy(cond), torch.from_numpy(text).long(),
        torch.from_numpy(duration).long(), torch.from_numpy(noise),
        torch.from_numpy(lens).long(), steps=4, cfg_strength=2.0, sway=-1.0,
    ).numpy()
    mae = np.abs(got - want).mean()
    assert mae < 1e-2, f"full-arch NFE-4 mel MAE {mae}"
    assert mae < 2e-3, mae


def test_fullarch_unett_forward():
    """E2TTS_Base UNetT (time-as-token + U-Net skips) at full size matches the
    torch oracle (reference unett.py:108-307)."""
    cfg = MODEL_CONFIGS["E2TTS_Base"].arch
    params = U.init(jax.random.PRNGKey(2), cfg)
    x, cond, text, time, mask = _inputs(dataclasses.replace(cfg), seed=9)
    got = np.asarray(
        U.forward_with_text(params, cfg, jnp.asarray(x), jnp.asarray(cond),
                            jnp.asarray(text), jnp.asarray(time),
                            mask=jnp.asarray(mask), backend="sdpa")
    )
    want = OU.forward(params, cfg, torch.from_numpy(x), torch.from_numpy(cond),
                      torch.from_numpy(text).long(), torch.from_numpy(time),
                      mask=torch.from_numpy(mask)).numpy()
    mm = mask[:, :, None]
    mae = np.abs((got - want) * mm).mean()
    assert mae < 1e-2, f"full-arch UNetT MAE {mae}"
    assert mae < 2e-3, mae
