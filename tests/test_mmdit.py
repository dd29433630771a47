"""Golden tests: MMDiT backbone vs a fresh torch oracle of the reference
MMDiTBlock / JointAttnProcessor (modules.py:563-846, backbones/mmdit.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from f5_tts_tpu.models import mmdit as M
from f5_tts_tpu.models.configs import MMDiTConfig
from tests.oracles import torch_dit as ODT
from tests.oracles import torch_layers as O

SMALL = MMDiTConfig(dim=64, depth=3, heads=4, dim_head=16, ff_mult=2, mel_dim=10,
                    text_num_embeds=30, max_pos=128, text_max_pos=64)


def randomize_adaln(params, cfg, seed=50):
    from f5_tts_tpu.models import layers as L

    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    mids = []
    for i in range(cfg.depth - 1):
        mids.append({
            "attn_norm_x": L.adaln_init(jax.random.fold_in(ks[0], i), cfg.dim, zero=False),
            "attn_norm_c": L.adaln_init(jax.random.fold_in(ks[1], i), cfg.dim, zero=False),
        })
    st = jax.tree.map(lambda *xs: jnp.stack(xs), *mids)
    params["blocks"]["attn_norm_x"] = st["attn_norm_x"]
    params["blocks"]["attn_norm_c"] = st["attn_norm_c"]
    params["last_block"]["attn_norm_x"] = L.adaln_init(ks[2], cfg.dim, zero=False)
    params["last_block"]["attn_norm_c"] = L.adaln_final_init(ks[3], cfg.dim, zero=False)
    params["norm_out"] = L.adaln_final_init(ks[4], cfg.dim, zero=False)
    params["proj_out"] = L.linear_init(ks[5], cfg.dim, cfg.mel_dim, zero=False)
    return params


def torch_joint_attention(p, xn, cn, heads, rope_a, rope_t, mask, c_mask, pre_only, mask_enabled):
    b, n, _ = xn.shape
    nt = cn.shape[1]
    hd = O.t(p["to_q"]["kernel"]).shape[1] // heads

    def split(t):
        return t.view(b, -1, heads, hd).transpose(1, 2)

    q, k, v = split(O.linear(p["to_q"], xn)), split(O.linear(p["to_k"], xn)), split(O.linear(p["to_v"], xn))
    cq, ck, cv = split(O.linear(p["to_q_c"], cn)), split(O.linear(p["to_k_c"], cn)), split(O.linear(p["to_v_c"], cn))
    q, k = O.apply_rotary_pos_emb(q, rope_a), O.apply_rotary_pos_emb(k, rope_a)
    cq, ck = O.apply_rotary_pos_emb(cq, rope_t), O.apply_rotary_pos_emb(ck, rope_t)
    Q = torch.cat([q, cq], dim=2)
    K = torch.cat([k, ck], dim=2)
    V = torch.cat([v, cv], dim=2)
    attn_mask = None
    if mask_enabled and mask is not None:
        cm = c_mask if c_mask is not None else torch.ones(b, nt, dtype=torch.bool)
        am = torch.cat([mask, cm], dim=1)
        attn_mask = am.unsqueeze(1).unsqueeze(1).expand(b, heads, n + nt, n + nt)
    out = F.scaled_dot_product_attention(Q, K, V, attn_mask=attn_mask, is_causal=False)
    out = out.transpose(1, 2).reshape(b, n + nt, heads * hd)
    xo, co = out[:, :n], out[:, n:]
    xo = O.linear(p["to_out"], xo)
    co = O.linear(p["to_out_c"], co) if not pre_only else None
    if mask is not None:
        xo = xo.masked_fill(~mask.unsqueeze(-1), 0.0)
    if co is not None and c_mask is not None:
        co = co.masked_fill(~c_mask.unsqueeze(-1), 0.0)
    return xo, co


def torch_mmdit_forward(params, cfg, x, cond, text_ids, time, mask=None, drop_audio_cond=False,
                        drop_text=False, attn_mask_enabled=False):
    import jax as _jax

    b, n, _ = x.shape
    nt = text_ids.shape[1]
    if time.ndim == 0:
        time = time.repeat(b)
    t_emb = O.timestep_embed(params["time_embed"], time)
    # text embed
    ids = text_ids + 1
    pad_mask = ids == 0
    if drop_text:
        ids = torch.zeros_like(ids)
    c = F.embedding(ids, O.t(params["text_embed"]["embed"]["weight"]))
    c = c + ODT.abs_pos_table(cfg.text_max_pos, cfg.dim)[:nt].unsqueeze(0)
    if cfg.text_mask_padding:
        c = c.masked_fill(pad_mask.unsqueeze(-1), 0.0)
    c_mask = (text_ids + 1) != 0
    # audio embed
    cnd = torch.zeros_like(cond) if drop_audio_cond else cond
    h = O.linear(params["audio_embed"]["proj"], torch.cat([x, cnd], dim=-1))
    h = O.conv_pos_embed(params["audio_embed"]["conv_pos"], h) + h
    rope_a = O.rotary_freqs(n, cfg.dim_head)
    rope_t = O.rotary_freqs(nt, cfg.dim_head)

    def np_block(i):
        return _jax.tree.map(lambda a, i=i: np.asarray(a)[i], params["blocks"])

    blocks = [np_block(i) for i in range(cfg.depth - 1)] + [params["last_block"]]
    for i, bp in enumerate(blocks):
        pre_only = i == cfg.depth - 1
        if pre_only:
            norm_c = O.adaln_final(bp["attn_norm_c"], c, t_emb)
        else:
            norm_c, c_gate, c_shift, c_scale, c_gate_mlp = O.adaln(bp["attn_norm_c"], c, t_emb)
        norm_x, x_gate, x_shift, x_scale, x_gate_mlp = O.adaln(bp["attn_norm_x"], h, t_emb)
        xo, co = torch_joint_attention(bp["attn"], norm_x, norm_c, cfg.heads, rope_a, rope_t,
                                       mask, c_mask, pre_only, attn_mask_enabled)
        if not pre_only:
            c = c + c_gate.unsqueeze(1) * co
            nc = F.layer_norm(c, (cfg.dim,), eps=1e-6) * (1 + c_scale[:, None]) + c_shift[:, None]
            c = c + c_gate_mlp.unsqueeze(1) * O.feedforward(bp["ff_c"], nc)
        h = h + x_gate.unsqueeze(1) * xo
        nx = F.layer_norm(h, (cfg.dim,), eps=1e-6) * (1 + x_scale[:, None]) + x_shift[:, None]
        h = h + x_gate_mlp.unsqueeze(1) * O.feedforward(bp["ff_x"], nx)
    h = O.adaln_final(params["norm_out"], h, t_emb)
    return O.linear(params["proj_out"], h)


RNG = np.random.default_rng(17)


def test_mmdit_forward_matches_torch():
    cfg = SMALL
    params = randomize_adaln(M.init(jax.random.PRNGKey(0), cfg), cfg)
    b, n, nt = 2, 24, 9
    x = RNG.standard_normal((b, n, cfg.mel_dim)).astype(np.float32)
    cond = RNG.standard_normal((b, n, cfg.mel_dim)).astype(np.float32)
    text = RNG.integers(0, cfg.text_num_embeds, (b, nt)).astype(np.int32)
    text[1, 5:] = -1
    time = np.array([0.4, 0.6], np.float32)
    mask = np.ones((b, n), bool)
    mask[1, 17:] = False
    got = np.asarray(M.forward_with_text(
        params, cfg, jnp.asarray(x), jnp.asarray(cond), jnp.asarray(text),
        jnp.asarray(time), mask=jnp.asarray(mask)))
    want = torch_mmdit_forward(params, cfg, torch.from_numpy(x), torch.from_numpy(cond),
                               torch.from_numpy(text).long(), torch.from_numpy(time),
                               mask=torch.from_numpy(mask)).numpy()
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)
    assert np.abs(got - want).mean() < 1e-4


def test_mmdit_zero_init_outputs_zero():
    cfg = SMALL
    params = M.init(jax.random.PRNGKey(1), cfg)
    b, n, nt = 1, 16, 5
    out = M.forward_with_text(
        params, cfg, jnp.zeros((b, n, cfg.mel_dim)), jnp.zeros((b, n, cfg.mel_dim)),
        jnp.zeros((b, nt), jnp.int32), jnp.asarray(np.array([0.5], np.float32)))
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_mmdit_cfm_sample_runs():
    from f5_tts_tpu.models import cfm as C

    cfg = SMALL
    params = randomize_adaln(M.init(jax.random.PRNGKey(2), cfg), cfg)
    b, n = 2, 32
    cond = RNG.standard_normal((b, n, cfg.mel_dim)).astype(np.float32)
    text = RNG.integers(0, cfg.text_num_embeds, (b, 7)).astype(np.int32)
    out = C.sample(params, cfg, jnp.asarray(cond), jnp.asarray(text),
                   jnp.asarray(np.array([30, 24], np.int32)),
                   jnp.asarray(RNG.standard_normal((b, n, cfg.mel_dim)).astype(np.float32)),
                   lens=jnp.asarray(np.array([8, 6], np.int32)),
                   opts=C.SampleOptions(steps=2), backend="sdpa")
    assert np.isfinite(np.asarray(out)).all()


def test_mmdit_ckpt_converter_roundtrip():
    """Inverse-map our pytree into a reference-named state dict by hand, then
    convert back and compare forwards."""
    from f5_tts_tpu.utils.ckpt import mmdit_params_from_state

    cfg = SMALL
    params = randomize_adaln(M.init(jax.random.PRNGKey(5), cfg), cfg)
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
    put_lin("audio_embed.linear", params["audio_embed"]["proj"])
    put_conv("audio_embed.conv_pos_embed.conv1d.0", params["audio_embed"]["conv_pos"]["conv1"])
    put_conv("audio_embed.conv_pos_embed.conv1d.2", params["audio_embed"]["conv_pos"]["conv2"])
    for i in range(cfg.depth):
        pre_only = i == cfg.depth - 1
        bp = params["last_block"] if pre_only else jax.tree.map(lambda x, j=i: x[j], params["blocks"])
        b = f"transformer_blocks.{i}"
        put_lin(f"{b}.attn_norm_x.linear", bp["attn_norm_x"]["linear"])
        put_lin(f"{b}.attn_norm_c.linear", bp["attn_norm_c"]["linear"])
        for nm in ("to_q", "to_k", "to_v", "to_q_c", "to_k_c", "to_v_c"):
            put_lin(f"{b}.attn.{nm}", bp["attn"][nm])
        put_lin(f"{b}.attn.to_out.0", bp["attn"]["to_out"])
        if not pre_only:
            put_lin(f"{b}.attn.to_out_c", bp["attn"]["to_out_c"])
            put_lin(f"{b}.ff_c.ff.0.0", bp["ff_c"]["in"])
            put_lin(f"{b}.ff_c.ff.2", bp["ff_c"]["out"])
        put_lin(f"{b}.ff_x.ff.0.0", bp["ff_x"]["in"])
        put_lin(f"{b}.ff_x.ff.2", bp["ff_x"]["out"])
    put_lin("norm_out.linear", params["norm_out"]["linear"])
    put_lin("proj_out", params["proj_out"])

    back = mmdit_params_from_state(state, cfg)
    b_, n, nt = 2, 16, 6
    x = RNG.standard_normal((b_, n, cfg.mel_dim)).astype(np.float32)
    cond = RNG.standard_normal((b_, n, cfg.mel_dim)).astype(np.float32)
    text = RNG.integers(0, cfg.text_num_embeds, (b_, nt)).astype(np.int32)
    time = np.array([0.3, 0.7], np.float32)
    a = M.forward_with_text(params, cfg, jnp.asarray(x), jnp.asarray(cond), jnp.asarray(text), jnp.asarray(time))
    c = M.forward_with_text(back, cfg, jnp.asarray(x), jnp.asarray(cond), jnp.asarray(text), jnp.asarray(time))
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-6)


def test_mmdit_checkpoint_activations_grads_match():
    """checkpoint_activations wraps the MMDiT block scan + final block in
    jax.checkpoint (reference mmdit.py:252-255 honors the flag; this repo
    silently ignored it before).  Grads must match the non-checkpointed
    forward exactly."""
    import dataclasses

    cfg = SMALL
    cfg_ck = dataclasses.replace(SMALL, checkpoint_activations=True)
    params = randomize_adaln(M.init(jax.random.PRNGKey(3), cfg), cfg)
    b, n, nt = 2, 24, 9
    x = RNG.standard_normal((b, n, cfg.mel_dim)).astype(np.float32)
    cond = RNG.standard_normal((b, n, cfg.mel_dim)).astype(np.float32)
    text = RNG.integers(0, cfg.text_num_embeds, (b, nt)).astype(np.int32)
    time = np.array([0.4, 0.6], np.float32)
    mask = np.ones((b, n), bool)
    mask[1, 17:] = False

    def loss(p, c):
        out = M.forward_with_text(p, c, jnp.asarray(x), jnp.asarray(cond),
                                  jnp.asarray(text), jnp.asarray(time),
                                  mask=jnp.asarray(mask))
        return jnp.sum(out**2)

    g0 = jax.grad(loss)(params, cfg)
    g1 = jax.grad(loss)(params, cfg_ck)
    for a, b_ in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5, rtol=1e-5)
    txt = str(jax.make_jaxpr(lambda p: jax.grad(loss)(p, cfg_ck))(params))
    assert "remat" in txt or "checkpoint" in txt
