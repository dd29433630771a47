"""Golden tests: full DiT backbone vs torch oracle (random weights, shared)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from f5_tts_tpu.models import dit as D
from f5_tts_tpu.models.configs import DiTConfig

SMALL = DiTConfig(
    dim=64, depth=3, heads=4, dim_head=16, ff_mult=2, mel_dim=10,
    text_num_embeds=30, text_dim=24, conv_layers=2, max_pos=128,
)


def make_params(cfg, seed=0, randomize_zero_init=True):
    params = D.init(jax.random.PRNGKey(seed), cfg)
    if randomize_zero_init:
        # zero-init AdaLN/proj_out would hide bugs in those layers; randomize
        key = jax.random.PRNGKey(seed + 100)
        from f5_tts_tpu.models import layers as L

        ks = jax.random.split(key, 3)
        params["norm_out"] = L.adaln_final_init(ks[0], cfg.dim, zero=False)
        params["proj_out"] = L.linear_init(ks[1], cfg.dim, cfg.mel_dim, zero=False)
        blocks = [
            {"attn_norm": L.adaln_init(k, cfg.dim, zero=False)}
            for k in jax.random.split(ks[2], cfg.depth)
        ]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)
        params["blocks"]["attn_norm"] = stacked["attn_norm"]
    return params


RNG = np.random.default_rng(11)


def _inputs(cfg, b=2, n=32, nt=12):
    x = RNG.standard_normal((b, n, cfg.mel_dim)).astype(np.float32)
    cond = RNG.standard_normal((b, n, cfg.mel_dim)).astype(np.float32)
    text = RNG.integers(0, cfg.text_num_embeds, (b, nt)).astype(np.int32)
    text[1, 8:] = -1  # ragged batch padding
    time = np.array([0.3, 0.7], dtype=np.float32)
    mask = np.zeros((b, n), dtype=bool)
    mask[0, :n] = True
    mask[1, : n - 10] = True
    return x, cond, text, time, mask


@pytest.mark.parametrize("use_mask", [False, True])
def test_dit_forward_matches_torch(use_mask):
    cfg = SMALL
    params = make_params(cfg)
    x, cond, text, time, mask = _inputs(cfg)
    lens = mask.sum(axis=1).astype(np.int32) if use_mask else None
    got = np.asarray(
        D.forward_with_text(
            params, cfg, jnp.asarray(x), jnp.asarray(cond), jnp.asarray(text),
            jnp.asarray(time), mask=jnp.asarray(mask) if use_mask else None,
            lens=jnp.asarray(lens) if use_mask else None, backend="sdpa",
        )
    )
    from tests.oracles import torch_dit as OD

    want = OD.forward(
        params, cfg, torch.from_numpy(x), torch.from_numpy(cond),
        torch.from_numpy(text).long(), torch.from_numpy(time),
        mask=torch.from_numpy(mask) if use_mask else None,
        lens=torch.from_numpy(lens).long() if use_mask else None,
    ).numpy()
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)
    assert np.abs(got - want).mean() < 1e-4


def test_dit_cfg_pair_matches_separate_forwards():
    cfg = SMALL
    params = make_params(cfg)
    x, cond, text, time, mask = _inputs(cfg)
    lens = mask.sum(axis=1).astype(np.int32)
    te_c = D.text_embedding(params, cfg, jnp.asarray(text), x.shape[1], lens=jnp.asarray(lens))
    te_u = D.text_embedding(params, cfg, jnp.asarray(text), x.shape[1], lens=jnp.asarray(lens), drop_text=True)
    pred, null = D.forward_cfg(
        params, cfg, jnp.asarray(x), jnp.asarray(cond), te_c, te_u, jnp.asarray(time),
        mask=jnp.asarray(mask), backend="sdpa",
    )
    want_pred = D.forward(params, cfg, jnp.asarray(x), jnp.asarray(cond), te_c,
                          jnp.asarray(time), mask=jnp.asarray(mask), backend="sdpa")
    want_null = D.forward(params, cfg, jnp.asarray(x), jnp.asarray(cond), te_u,
                          jnp.asarray(time), mask=jnp.asarray(mask), drop_audio_cond=True, backend="sdpa")
    np.testing.assert_allclose(np.asarray(pred), np.asarray(want_pred), atol=1e-5)
    np.testing.assert_allclose(np.asarray(null), np.asarray(want_null), atol=1e-5)


def test_dit_zero_init_outputs_zero():
    cfg = SMALL
    params = D.init(jax.random.PRNGKey(3), cfg)
    x, cond, text, time, mask = _inputs(cfg)
    out = D.forward_with_text(params, cfg, jnp.asarray(x), jnp.asarray(cond),
                              jnp.asarray(text), jnp.asarray(time), backend="sdpa")
    # AdaLN-zero + zero proj_out => exactly zero output at init (dit.py:264-274)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_dit_average_upsampling_matches_reference_algorithm():
    cfg = dataclasses.replace(SMALL, text_embedding_average_upsampling=True)
    params = make_params(cfg)
    b, n, nt = 2, 32, 12
    text = RNG.integers(0, cfg.text_num_embeds, (b, nt)).astype(np.int32)
    text[0, 10:] = -1
    text[1, 5:] = -1
    lens = np.array([32, 17], dtype=np.int32)
    got = np.asarray(D.text_embedding(params, cfg, jnp.asarray(text), n, lens=jnp.asarray(lens)))
    # reference loop (dit.py:55-84) on the pre-upsample embedding
    cfg_no_up = dataclasses.replace(cfg, text_embedding_average_upsampling=False)
    pre = np.asarray(D.text_embedding(params, cfg_no_up, jnp.asarray(text), n, lens=jnp.asarray(lens)))
    ids = np.pad(text + 1, ((0, 0), (0, n - nt)))
    for i in range(b):
        ids_i = ids[i].copy()
        ids_i[lens[i]:] = 0
        text_mask = ids_i != 0
        text_len = int(text_mask.sum())
        audio_len = int(lens[i])
        valid = pre[i][np.where(text_mask)[0]]
        base, rem = audio_len // text_len, audio_len % text_len
        idx = []
        for j in range(text_len):
            idx.extend([j] * (base + (1 if j >= text_len - rem else 0)))
        want_i = np.zeros_like(pre[i])
        want_i[:audio_len] = valid[np.array(idx[:audio_len])]
        np.testing.assert_allclose(got[i], want_i, atol=1e-5)


def test_remat_policy_flash_skips_forward_recompute():
    """remat_policy="flash" (D.remat_policy) saves the flash kernel's tagged
    out/lse residuals (ops/flash_attention.py _tag_for_remat), so the
    checkpointed block's BACKWARD recompute must not re-run the Pallas
    forward.  Structural check on the grad jaxpr (trace-only — kernels never
    execute, so this runs on CPU): "nothing" re-runs the fwd-stats kernel
    inside the remat region; "flash" keeps exactly one fewer.  Gradient
    numerics across policies are chip-validated (remat never changes math;
    DEVELOPMENT.md bench_train A/B)."""
    import re

    arch = DiTConfig(dim=64, depth=2, heads=4, dim_head=16, ff_mult=2,
                     mel_dim=16, text_num_embeds=30, text_dim=32,
                     conv_layers=1, max_pos=512, checkpoint_activations=True)
    params = D.init(jax.random.PRNGKey(0), arch)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 256, 16)).astype(np.float32))
    cond = jnp.asarray(rng.standard_normal((2, 256, 16)).astype(np.float32))
    tid = jnp.asarray(rng.integers(0, 30, (2, 32)).astype(np.int32))

    def loss(p, cfg):
        out = D.forward_with_text(p, cfg, x, cond, tid, jnp.float32(0.5),
                                  backend="flash_train")
        return jnp.sum(out**2)

    def fwd_kernel_count(cfg):
        txt = str(jax.make_jaxpr(lambda p: jax.grad(loss)(p, cfg))(params))
        return len(re.findall(r"name=_flash_fwd_stats\b", txt))

    n_nothing = fwd_kernel_count(dataclasses.replace(arch, remat_policy="nothing"))
    n_flash = fwd_kernel_count(dataclasses.replace(arch, remat_policy="flash"))
    assert n_flash == n_nothing - 1, (n_nothing, n_flash)


def test_remat_policy_unknown_raises():
    with pytest.raises(ValueError, match="remat_policy"):
        D.remat_policy(dataclasses.replace(DiTConfig(), remat_policy="typo"))
