"""Golden tests: UNetT backbone vs torch oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from f5_tts_tpu.models import unett as U
from f5_tts_tpu.models.configs import UNetTConfig
from tests.oracles import torch_unett as OU

SMALL = UNetTConfig(
    dim=64, depth=4, heads=4, dim_head=16, ff_mult=2, mel_dim=10,
    text_num_embeds=30, text_dim=24, conv_layers=1, max_pos=128,
    text_mask_padding=False, pe_attn_head=1,
)

RNG = np.random.default_rng(13)


def _inputs(cfg, b=2, n=24, nt=9):
    x = RNG.standard_normal((b, n, cfg.mel_dim)).astype(np.float32)
    cond = RNG.standard_normal((b, n, cfg.mel_dim)).astype(np.float32)
    text = RNG.integers(0, cfg.text_num_embeds, (b, nt)).astype(np.int32)
    text[1, 5:] = -1
    time = np.array([0.2, 0.8], dtype=np.float32)
    mask = np.zeros((b, n), dtype=bool)
    mask[0, :] = True
    mask[1, : n - 7] = True
    return x, cond, text, time, mask


@pytest.mark.parametrize("use_mask", [False, True])
def test_unett_forward_matches_torch(use_mask):
    cfg = SMALL
    params = U.init(jax.random.PRNGKey(0), cfg)
    x, cond, text, time, mask = _inputs(cfg)
    got = np.asarray(
        U.forward_with_text(params, cfg, jnp.asarray(x), jnp.asarray(cond), jnp.asarray(text),
                            jnp.asarray(time), mask=jnp.asarray(mask) if use_mask else None,
                            backend="sdpa")
    )
    want = OU.forward(params, cfg, torch.from_numpy(x), torch.from_numpy(cond),
                      torch.from_numpy(text).long(), torch.from_numpy(time),
                      mask=torch.from_numpy(mask) if use_mask else None).numpy()
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)
    assert np.abs(got - want).mean() < 1e-4


def test_unett_cfg_pair_matches_separate():
    cfg = SMALL
    params = U.init(jax.random.PRNGKey(1), cfg)
    x, cond, text, time, mask = _inputs(cfg)
    te_c = U.text_embedding(params, cfg, jnp.asarray(text), x.shape[1])
    te_u = U.text_embedding(params, cfg, jnp.asarray(text), x.shape[1], drop_text=True)
    pred, null = U.forward_cfg(params, cfg, jnp.asarray(x), jnp.asarray(cond), te_c, te_u,
                               jnp.asarray(time), mask=jnp.asarray(mask), backend="sdpa")
    want_pred = U.forward(params, cfg, jnp.asarray(x), jnp.asarray(cond), te_c, jnp.asarray(time),
                          mask=jnp.asarray(mask), backend="sdpa")
    want_null = U.forward(params, cfg, jnp.asarray(x), jnp.asarray(cond), te_u, jnp.asarray(time),
                          mask=jnp.asarray(mask), drop_audio_cond=True, backend="sdpa")
    np.testing.assert_allclose(np.asarray(pred), np.asarray(want_pred), atol=1e-5)
    np.testing.assert_allclose(np.asarray(null), np.asarray(want_null), atol=1e-5)


def test_unett_add_skip_variant():
    cfg = UNetTConfig(dim=32, depth=2, heads=2, dim_head=16, ff_mult=2, mel_dim=8,
                      text_num_embeds=20, text_dim=16, conv_layers=0, max_pos=64,
                      skip_connect_type="add")
    params = U.init(jax.random.PRNGKey(2), cfg)
    x, cond, text, time, mask = _inputs(cfg, n=16, nt=5)
    got = np.asarray(U.forward_with_text(params, cfg, jnp.asarray(x), jnp.asarray(cond),
                                         jnp.asarray(text), jnp.asarray(time), backend="sdpa"))
    want = OU.forward(params, cfg, torch.from_numpy(x), torch.from_numpy(cond),
                      torch.from_numpy(text).long(), torch.from_numpy(time)).numpy()
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


def test_unett_cfm_sample_runs():
    from f5_tts_tpu.models import cfm as C

    cfg = SMALL
    params = U.init(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(7)
    b, n = 2, 40
    cond = rng.standard_normal((b, n, cfg.mel_dim)).astype(np.float32)
    text = rng.integers(0, cfg.text_num_embeds, (b, 8)).astype(np.int32)
    out = C.sample(params, cfg, jnp.asarray(cond), jnp.asarray(text),
                   jnp.asarray(np.array([36, 30], np.int32)),
                   jnp.asarray(rng.standard_normal((b, n, cfg.mel_dim)).astype(np.float32)),
                   lens=jnp.asarray(np.array([10, 8], np.int32)),
                   opts=C.SampleOptions(steps=2), backend="sdpa")
    assert np.isfinite(np.asarray(out)).all()


def test_unett_ckpt_roundtrip_forward():
    """Convert a torch-named state dict (built from our pytree) back and check
    the forward is identical -> converter mapping is consistent."""
    from f5_tts_tpu.utils import ckpt as CK

    cfg = SMALL
    params = U.init(jax.random.PRNGKey(4), cfg)
    # build a reference-shaped state dict by inverse-mapping by hand
    state = {}

    def put_lin(name, p):
        state[name + ".weight"] = np.asarray(p["kernel"]).T
        if "bias" in p:
            state[name + ".bias"] = np.asarray(p["bias"])

    def put_conv(name, p):
        state[name + ".weight"] = np.transpose(np.asarray(p["kernel"]), (2, 1, 0))
        state[name + ".bias"] = np.asarray(p["bias"])

    put_lin("time_embed.time_mlp.0", params["time_embed"]["mlp1"])
    put_lin("time_embed.time_mlp.2", params["time_embed"]["mlp2"])
    state["text_embed.text_embed.weight"] = np.asarray(params["text_embed"]["embed"]["weight"])
    for i, bp in enumerate(params["text_embed"]["blocks"]):
        pre = f"text_embed.text_blocks.{i}"
        put_conv(pre + ".dwconv", bp["dwconv"])
        state[pre + ".norm.weight"] = np.asarray(bp["norm"]["weight"])
        state[pre + ".norm.bias"] = np.asarray(bp["norm"]["bias"])
        put_lin(pre + ".pwconv1", bp["pwconv1"])
        state[pre + ".grn.gamma"] = np.asarray(bp["grn"]["gamma"]).reshape(1, 1, -1)
        state[pre + ".grn.beta"] = np.asarray(bp["grn"]["beta"]).reshape(1, 1, -1)
        put_lin(pre + ".pwconv2", bp["pwconv2"])
    put_lin("input_embed.proj", params["input_embed"]["proj"])
    put_conv("input_embed.conv_pos_embed.conv1d.0", params["input_embed"]["conv_pos"]["conv1"])
    put_conv("input_embed.conv_pos_embed.conv1d.2", params["input_embed"]["conv_pos"]["conv2"])
    half = cfg.depth // 2
    for i in range(cfg.depth):
        src = params["first"] if i < half else params["second"]
        bp = jax.tree.map(lambda x, j=(i % half): x[j], src)
        b = f"layers.{i}"
        if i >= half and "skip_proj" in bp:
            state[b + ".0.weight"] = np.asarray(bp["skip_proj"]["kernel"]).T
        state[b + ".1.g"] = np.asarray(bp["attn_norm"]["g"])
        for nm in ("to_q", "to_k", "to_v"):
            put_lin(f"{b}.2.{nm}", bp["attn"][nm])
        put_lin(f"{b}.2.to_out.0", bp["attn"]["to_out"])
        state[b + ".3.g"] = np.asarray(bp["ff_norm"]["g"])
        put_lin(f"{b}.4.ff.0.0", bp["ff"]["in"])
        put_lin(f"{b}.4.ff.2", bp["ff"]["out"])
    state["norm_out.g"] = np.asarray(params["norm_out"]["g"])
    put_lin("proj_out", params["proj_out"])

    back = CK.unett_params_from_state(state, cfg)
    x, cond, text, time, mask = _inputs(cfg)
    a = U.forward_with_text(params, cfg, jnp.asarray(x), jnp.asarray(cond),
                            jnp.asarray(text), jnp.asarray(time), backend="sdpa")
    c = U.forward_with_text(back, cfg, jnp.asarray(x), jnp.asarray(cond),
                            jnp.asarray(text), jnp.asarray(time), backend="sdpa")
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-6)


def test_unett_sampler_matches_torch_oracle():
    """Full Euler CFG loop with the UNetT backbone vs the torch oracle."""
    from f5_tts_tpu.models import cfm as C

    cfg = SMALL
    params = U.init(jax.random.PRNGKey(6), cfg)
    rng = np.random.default_rng(23)
    b, n, nt = 1, 40, 8
    cond = rng.standard_normal((b, n, cfg.mel_dim)).astype(np.float32)
    lens = np.array([10], np.int32)
    cond[0, 10:] = 0.0
    text = rng.integers(0, cfg.text_num_embeds, (b, nt)).astype(np.int32)
    duration = np.array([36], np.int32)
    noise = rng.standard_normal((b, n, cfg.mel_dim)).astype(np.float32)

    opts = C.SampleOptions(steps=5, cfg_strength=2.0, sway_sampling_coef=-1.0)
    got = np.asarray(C.sample(params, cfg, jnp.asarray(cond), jnp.asarray(text),
                              jnp.asarray(duration), jnp.asarray(noise),
                              lens=jnp.asarray(lens), opts=opts, backend="sdpa"))

    # torch oracle Euler loop
    import torch as T

    cond_t = T.from_numpy(cond)
    text_t = T.from_numpy(text).long()
    lens_t = T.from_numpy(lens).long()
    dur_t = T.from_numpy(duration).long()
    cond_mask = T.arange(n)[None, :] < lens_t[:, None]
    step_cond = T.where(cond_mask.unsqueeze(-1), cond_t, T.zeros_like(cond_t))
    text_len = (text_t != -1).sum(dim=-1)
    dur_t = T.maximum(T.maximum(text_len, lens_t) + 1, dur_t).clamp(max=n)
    mask = T.arange(n)[None, :] < dur_t[:, None]
    y = T.where(mask.unsqueeze(-1), T.from_numpy(noise), T.zeros_like(cond_t))
    ts = C.timestep_schedule(5, sway_sampling_coef=-1.0, use_epss=True)
    for k in range(5):
        t = T.full((b,), float(ts[k]))
        pred = OU.forward(params, cfg, y, step_cond, text_t, t, mask=mask)
        null = OU.forward(params, cfg, y, step_cond, text_t, t, mask=mask,
                          drop_audio_cond=True, drop_text=True)
        v = pred + (pred - null) * 2.0
        y = y + (float(ts[k + 1]) - float(ts[k])) * v
    out = T.where(cond_mask.unsqueeze(-1), cond_t, y)
    want = T.where(mask.unsqueeze(-1), out, T.zeros_like(out)).numpy()
    assert np.abs(got - want).mean() < 1e-3
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=1e-2)


def test_unett_flash_padding_path_matches_unpadded():
    """backend='auto'/'flash' pads the time-token sequence to a 256-multiple;
    must be numerically identical to the unpadded sdpa path (CPU -> flash gate
    falls back to sdpa but the padding branch still executes)."""
    import dataclasses

    cfg = dataclasses.replace(SMALL, max_pos=1024)
    params = U.init(jax.random.PRNGKey(8), cfg)
    rng = np.random.default_rng(31)
    b, n = 1, 512  # seq -> 513 -> padded 768 under auto
    x = rng.standard_normal((b, n, cfg.mel_dim)).astype(np.float32)
    cond = rng.standard_normal((b, n, cfg.mel_dim)).astype(np.float32)
    text = rng.integers(0, cfg.text_num_embeds, (b, 12)).astype(np.int32)
    time = np.array([0.5], np.float32)
    a = np.asarray(U.forward_with_text(params, cfg, jnp.asarray(x), jnp.asarray(cond),
                                       jnp.asarray(text), jnp.asarray(time), backend="sdpa"))
    c = np.asarray(U.forward_with_text(params, cfg, jnp.asarray(x), jnp.asarray(cond),
                                       jnp.asarray(text), jnp.asarray(time), backend="auto"))
    np.testing.assert_allclose(a, c, atol=1e-4)


def test_flash_padding_beyond_max_pos():
    """Rope table must cover the 256-padded sequence even when it exceeds
    max_pos+1 (bucket 4096 at max_pos 4096 pads to 4352): backend='auto'
    pads seq>256, which used to truncate the table and crash apply_rotary."""
    import dataclasses

    cfg = dataclasses.replace(SMALL, max_pos=256)
    params = U.init(jax.random.PRNGKey(2), cfg)
    n = 256  # seq = n+1 = 257 -> pad_to 512 > max_pos+1
    x, cond, text, time, mask = _inputs(cfg, n=n)
    out = np.asarray(U.forward_with_text(
        params, cfg, jnp.asarray(x), jnp.asarray(cond), jnp.asarray(text),
        jnp.asarray(time), mask=jnp.asarray(mask), backend="auto",
    ))
    ref = np.asarray(U.forward_with_text(
        params, cfg, jnp.asarray(x), jnp.asarray(cond), jnp.asarray(text),
        jnp.asarray(time), mask=jnp.asarray(mask), backend="sdpa",
    ))
    assert out.shape == (2, n, cfg.mel_dim)
    mm = mask[:, :, None]
    np.testing.assert_allclose(out * mm, ref * mm, atol=1e-5, rtol=1e-5)


def test_unett_checkpoint_activations_grads_match():
    """checkpoint_activations was a silent no-op for UNetT (the reference has
    no UNetT remat path at all); it now wraps both scan halves in
    jax.checkpoint.  Remat must not change math: grads match the
    non-checkpointed forward, and the grad jaxpr actually contains remat."""
    import dataclasses

    cfg = SMALL
    cfg_ck = dataclasses.replace(SMALL, checkpoint_activations=True)
    params = U.init(jax.random.PRNGKey(2), cfg)
    x, cond, text, time, mask = _inputs(cfg)

    def loss(p, c):
        out = U.forward_with_text(p, c, jnp.asarray(x), jnp.asarray(cond),
                                  jnp.asarray(text), jnp.asarray(time),
                                  mask=jnp.asarray(mask), backend="sdpa")
        return jnp.sum(out**2)

    g0 = jax.grad(loss)(params, cfg)
    g1 = jax.grad(loss)(params, cfg_ck)
    for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)
    txt = str(jax.make_jaxpr(lambda p: jax.grad(loss)(p, cfg_ck))(params))
    assert "remat" in txt or "checkpoint" in txt
