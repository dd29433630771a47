"""UNetT backbone (E2-TTS): flat UNet transformer over mel frames.

Functional rebuild of reference src/f5_tts/model/backbones/unett.py:108-307:
time embedding prepended as a sequence TOKEN (:271-274), RMSNorm pre-norm
blocks (x_transformers RMSNorm: F.normalize * sqrt(dim) * g), U-Net skip
connections — first half pushes, second half pops + concat-projects (:281-303).

TPU-first: the two halves are scan-stacked separately (first-half outputs are
the scan's collected ys, consumed in reverse by the second-half scan), so XLA
compiles one block per half regardless of depth.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from f5_tts_tpu.models import layers as L
from f5_tts_tpu.models.configs import UNetTConfig
from f5_tts_tpu.ops.rope import abs_pos_table, rotary_freqs


def rms_norm_xt_init(dim: int):
    """x_transformers RMSNorm: param ``g``, y = normalize(x) * sqrt(dim) * g."""
    return {"g": jnp.ones((dim,), jnp.float32)}


def rms_norm_xt(p, x):
    xf = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(jnp.square(xf), axis=-1, keepdims=True))
    y = xf / jnp.maximum(norm, 1e-12) * (x.shape[-1] ** 0.5)
    return y.astype(x.dtype) * p["g"].astype(x.dtype)


def _half_block_init(key, cfg: UNetTConfig, with_skip: bool):
    ks = jax.random.split(key, 3)
    p = {
        "attn_norm": rms_norm_xt_init(cfg.dim),
        "attn": L.mha_init(ks[0], cfg.dim, cfg.heads, cfg.dim_head, qk_norm=cfg.qk_norm),
        "ff_norm": rms_norm_xt_init(cfg.dim),
        "ff": L.feedforward_init(ks[1], cfg.dim, mult=cfg.ff_mult),
    }
    if with_skip:
        p["skip_proj"] = L.linear_init(ks[2], cfg.dim * 2, cfg.dim, bias=False)
    return p


def init(key: jax.Array, cfg: UNetTConfig):
    assert cfg.depth % 2 == 0, "UNetT depth must be even"
    text_dim = cfg.text_dim or cfg.mel_dim
    ks = jax.random.split(key, 8)
    text_p = {"embed": L.embedding_init(ks[0], cfg.text_num_embeds + 1, text_dim)}
    if cfg.conv_layers > 0:
        bkeys = jax.random.split(ks[1], cfg.conv_layers)
        text_p["blocks"] = [
            L.convnext_v2_init(bkeys[i], text_dim, text_dim * cfg.conv_mult)
            for i in range(cfg.conv_layers)
        ]
    half = cfg.depth // 2
    with_skip = cfg.skip_connect_type == "concat"
    first = [_half_block_init(k, cfg, False) for k in jax.random.split(ks[2], half)]
    second = [_half_block_init(k, cfg, with_skip) for k in jax.random.split(ks[3], half)]
    return {
        "time_embed": L.timestep_embed_init(ks[4], cfg.dim),
        "text_embed": text_p,
        "input_embed": {
            "proj": L.linear_init(ks[5], cfg.mel_dim * 2 + text_dim, cfg.dim),
            "conv_pos": L.conv_pos_embed_init(ks[6], cfg.dim),
        },
        "first": jax.tree.map(lambda *xs: jnp.stack(xs), *first),
        "second": jax.tree.map(lambda *xs: jnp.stack(xs), *second),
        "norm_out": rms_norm_xt_init(cfg.dim),
        "proj_out": L.linear_init(ks[7], cfg.dim, cfg.mel_dim),
    }


def text_embedding(params, cfg: UNetTConfig, text_ids, seq_len: int, lens=None, drop_text: bool = False):
    """UNetT TextEmbedding (unett.py:54-84) — like DiT's but without the
    per-sample-length masking variant (``lens`` accepted for interface parity,
    unused just as the reference UNetT ignores per-sample speech lengths)."""
    del lens
    p = params["text_embed"]
    text_dim = cfg.text_dim or cfg.mel_dim
    ids = text_ids + 1
    nt = ids.shape[1]
    ids = ids[:, :seq_len] if nt >= seq_len else jnp.pad(ids, ((0, 0), (0, seq_len - nt)))
    pad_mask = ids == 0
    if drop_text:
        ids = jnp.zeros_like(ids)
    emb = L.embedding(p["embed"], ids)
    if cfg.conv_layers > 0:
        freqs = jnp.asarray(abs_pos_table(cfg.max_pos, text_dim)[:seq_len], dtype=emb.dtype)
        emb = emb + freqs[None]
        if cfg.text_mask_padding:
            keep = (~pad_mask)[..., None].astype(emb.dtype)
            emb = emb * keep
            for bp in p["blocks"]:
                emb = L.convnext_v2(bp, emb) * keep
        else:
            for bp in p["blocks"]:
                emb = L.convnext_v2(bp, emb)
    return emb


def _block(bp, x, mask, rope, cfg: UNetTConfig, backend):
    h = rms_norm_xt(bp["attn_norm"], x)
    x = L.mha(bp["attn"], h, cfg.heads, mask=mask, rope_freqs=rope,
              pe_attn_head=cfg.pe_attn_head, backend=backend) + x
    h = rms_norm_xt(bp["ff_norm"], x)
    x = L.feedforward(bp["ff"], h) + x
    return x


def forward(
    params,
    cfg: UNetTConfig,
    x,  # [b, n, mel]
    cond,
    text_emb,  # [b, n, text_dim] precomputed
    time,
    mask=None,
    drop_audio_cond: bool = False,
    backend: str = "auto",
):
    b, n, _ = x.shape
    if time.ndim == 0:
        time = jnp.broadcast_to(time, (b,))
    t_emb = L.timestep_embed(params["time_embed"], time, dtype=x.dtype)

    if drop_audio_cond:
        cond = jnp.zeros_like(cond)
    p_in = params["input_embed"]
    h = L.linear(p_in["proj"], jnp.concatenate([x, cond, text_emb], axis=-1))
    h = L.conv_pos_embed(p_in["conv_pos"], h) + h  # no audio mask (unett.py:96-102)

    # prepend time token (unett.py:271-274)
    h = jnp.concatenate([t_emb[:, None, :], h], axis=1)
    if mask is not None:
        mask = jnp.pad(mask, ((0, 0), (1, 0)), constant_values=True)
    # pad to a 256-multiple so the Pallas flash kernel stays eligible (the
    # time token makes the sequence n+1); padding rows are masked out
    seq = n + 1
    pad_to = (
        -(-seq // 256) * 256
        if backend in ("auto", "flash", "train_auto", "flash_train") and seq > 256
        else seq
    )
    pad_amt = pad_to - seq
    if pad_amt:
        h = jnp.pad(h, ((0, 0), (0, pad_amt), (0, 0)))
        if mask is None:
            mask = jnp.arange(pad_to)[None, :] < seq
        else:
            mask = jnp.pad(mask, ((0, 0), (0, pad_amt)), constant_values=False)
    # table must cover the flash-padded length too (bucket 4096 at max_pos
    # 4096 pads to 4352 — a short table would broadcast-crash apply_rotary)
    rope = jnp.asarray(rotary_freqs(max(cfg.max_pos + 1, pad_to), cfg.dim_head)[:pad_to])

    def first_fn(carry, bp):
        out = _block(bp, carry, mask, rope, cfg, backend)
        return out, carry  # push PRE-block x: reference appends before the block

    def second_fn(carry, inp):
        bp, skip = inp
        if cfg.skip_connect_type == "concat":
            carry = L.linear(bp["skip_proj"], jnp.concatenate([carry, skip], axis=-1))
        elif cfg.skip_connect_type == "add":
            carry = carry + skip
        out = _block(bp, carry, mask, rope, cfg, backend)
        return out, None

    if cfg.checkpoint_activations:  # per-block remat (beyond reference: its
        # UNetT has no activation-checkpoint path at all; policy semantics
        # match models/dit.py remat_policy)
        from f5_tts_tpu.models.dit import remat_policy

        tokens = h.shape[0] * h.shape[1]
        first_fn = jax.checkpoint(first_fn, policy=remat_policy(cfg, tokens=tokens))
        second_fn = jax.checkpoint(second_fn, policy=remat_policy(cfg, tokens=tokens))

    h, skips = jax.lax.scan(first_fn, h, params["first"])

    # pops are LIFO: reverse the collected skips
    h, _ = jax.lax.scan(second_fn, h, (params["second"], jnp.flip(skips, axis=0)))

    h = rms_norm_xt(params["norm_out"], h)[:, 1 : n + 1, :]
    return L.linear(params["proj_out"], h)


def forward_with_text(
    params, cfg: UNetTConfig, x, cond, text_ids, time, mask=None,
    drop_audio_cond=False, drop_text=False, backend="auto",
):
    te = text_embedding(params, cfg, text_ids, x.shape[1], drop_text=drop_text).astype(x.dtype)
    return forward(params, cfg, x, cond, te, time, mask=mask,
                   drop_audio_cond=drop_audio_cond, backend=backend)


def forward_cfg(
    params, cfg: UNetTConfig, x, step_cond, text_emb_cond, text_emb_uncond, time,
    mask=None, backend="auto",
):
    b = x.shape[0]
    x2 = jnp.concatenate([x, x], axis=0)
    cond2 = jnp.concatenate([step_cond, jnp.zeros_like(step_cond)], axis=0)
    te2 = jnp.concatenate([text_emb_cond, text_emb_uncond], axis=0)
    if time.ndim == 0:
        time = jnp.broadcast_to(time, (b,))
    t2 = jnp.concatenate([time, time], axis=0)
    mask2 = None if mask is None else jnp.concatenate([mask, mask], axis=0)
    out = forward(params, cfg, x2, cond2, te2, t2, mask=mask2, backend=backend)
    return out[:b], out[b:]


def fuse_for_inference(params):
    """Fuse q/k/v projections in both scan-stacked halves (see dit.fuse_for_inference)."""
    out = dict(params)
    for half in ("first", "second"):
        h = dict(params[half])
        h["attn"] = L.fuse_qkv(params[half]["attn"])
        out[half] = h
    return out
