"""MMDiT backbone — SD3-style dual-stream (text + audio) joint-attention DiT.

Functional rebuild of reference src/f5_tts/model/backbones/mmdit.py:87-262 and
the MMDiTBlock / JointAttnProcessor (modules.py:563-846): separate AdaLN-zero
modulation per stream, joint attention over the concatenated [audio, text]
sequence with separate rotary tables, last block ``context_pre_only``.

Blocks 0..depth-2 are scan-stacked; the final block (no text-stream FF/out
projection) is kept separate.  Joint attention dispatches between XLA SDPA
and the TWO-SEGMENT Pallas flash kernel (ops/flash_attention.py
flash_attention_two_segment): both segment masks are prefixes (length-masked
audio, trailing-padded text), so the kernel models validity as two prefix
windows [0, len_a) and [n, n + len_t).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from f5_tts_tpu.models import layers as L
from f5_tts_tpu.models.configs import MMDiTConfig
from f5_tts_tpu.ops.attention import sdpa
from f5_tts_tpu.ops.rope import abs_pos_table, apply_rotary, rotary_freqs


def _attn_init(key, dim, heads, dim_head, qk_norm, context_pre_only):
    inner = heads * dim_head
    ks = jax.random.split(key, 8)
    p = {
        "to_q": L.linear_init(ks[0], dim, inner),
        "to_k": L.linear_init(ks[1], dim, inner),
        "to_v": L.linear_init(ks[2], dim, inner),
        "to_q_c": L.linear_init(ks[3], dim, inner),
        "to_k_c": L.linear_init(ks[4], dim, inner),
        "to_v_c": L.linear_init(ks[5], dim, inner),
        "to_out": L.linear_init(ks[6], inner, dim),
    }
    if not context_pre_only:
        p["to_out_c"] = L.linear_init(ks[7], inner, dim)
    if qk_norm == "rms_norm":
        for nm in ("q_norm", "k_norm", "c_q_norm", "c_k_norm"):
            p[nm] = L.rms_norm_init(dim_head)
    return p


def block_init(key, cfg: MMDiTConfig, context_pre_only: bool):
    ks = jax.random.split(key, 5)
    p = {
        "attn_norm_x": L.adaln_init(ks[0], cfg.dim, zero=True),
        "attn": _attn_init(ks[1], cfg.dim, cfg.heads, cfg.dim_head, cfg.qk_norm, context_pre_only),
        "ff_x": L.feedforward_init(ks[2], cfg.dim, mult=cfg.ff_mult),
    }
    if context_pre_only:
        p["attn_norm_c"] = L.adaln_final_init(ks[3], cfg.dim, zero=True)
    else:
        p["attn_norm_c"] = L.adaln_init(ks[3], cfg.dim, zero=True)
        p["ff_c"] = L.feedforward_init(ks[4], cfg.dim, mult=cfg.ff_mult)
    return p


def init(key: jax.Array, cfg: MMDiTConfig):
    ks = jax.random.split(key, 7)
    mids = [block_init(k, cfg, False) for k in jax.random.split(ks[0], cfg.depth - 1)]
    return {
        "time_embed": L.timestep_embed_init(ks[1], cfg.dim),
        "text_embed": {"embed": L.embedding_init(ks[2], cfg.text_num_embeds + 1, cfg.dim)},
        "audio_embed": {
            "proj": L.linear_init(ks[3], cfg.mel_dim * 2, cfg.dim),
            "conv_pos": L.conv_pos_embed_init(ks[4], cfg.dim),
        },
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs), *mids),
        "last_block": block_init(ks[5], cfg, True),
        "norm_out": L.adaln_final_init(ks[6], cfg.dim, zero=True),
        "proj_out": L.linear_init(jax.random.split(ks[6], 1)[0], cfg.dim, cfg.mel_dim, zero=True),
    }


def text_embedding(params, cfg: MMDiTConfig, text_ids, seq_len=None, lens=None, drop_text=False):
    """MMDiT TextEmbedding (mmdit.py:32-63): stays at TEXT length (no upsample
    to mel frames) — the text runs as its own stream.  seq_len/lens accepted
    for interface parity and ignored."""
    del seq_len, lens
    p = params["text_embed"]
    ids = text_ids + 1
    pad_mask = ids == 0
    if drop_text:
        ids = jnp.zeros_like(ids)
    emb = L.embedding(p["embed"], ids)
    freqs = jnp.asarray(abs_pos_table(cfg.text_max_pos, cfg.dim)[: ids.shape[1]], dtype=emb.dtype)
    emb = emb + freqs[None]
    if cfg.text_mask_padding:
        emb = emb * (~pad_mask)[..., None].astype(emb.dtype)
    return emb


def audio_embedding(params, x, cond, drop_audio_cond=False):
    p = params["audio_embed"]
    if drop_audio_cond:
        cond = jnp.zeros_like(cond)
    h = L.linear(p["proj"], jnp.concatenate([x, cond], axis=-1))
    return L.conv_pos_embed(p["conv_pos"], h) + h


def _joint_attention(p, xn, cn, heads, rope_a, rope_t, mask, c_mask, context_pre_only,
                     attn_mask_enabled, backend="sdpa"):
    b, n, _ = xn.shape
    nt = cn.shape[1]

    def heads_split(t):
        return t.reshape(b, -1, heads, t.shape[-1] // heads).transpose(0, 2, 1, 3)

    q = heads_split(L.linear(p["to_q"], xn))
    k = heads_split(L.linear(p["to_k"], xn))
    v = heads_split(L.linear(p["to_v"], xn))
    cq = heads_split(L.linear(p["to_q_c"], cn))
    ck = heads_split(L.linear(p["to_k_c"], cn))
    cv = heads_split(L.linear(p["to_v_c"], cn))
    if "q_norm" in p:
        q, k = L.rms_norm(p["q_norm"], q), L.rms_norm(p["k_norm"], k)
        cq, ck = L.rms_norm(p["c_q_norm"], cq), L.rms_norm(p["c_k_norm"], ck)
    q, k = apply_rotary(q, rope_a), apply_rotary(k, rope_a)
    cq, ck = apply_rotary(cq, rope_t), apply_rotary(ck, rope_t)

    Q = jnp.concatenate([q, cq], axis=2)
    K = jnp.concatenate([k, ck], axis=2)
    V = jnp.concatenate([v, cv], axis=2)

    out = None
    if attn_mask_enabled and mask is not None:
        cm = c_mask if c_mask is not None else jnp.ones((b, nt), bool)
        if backend in ("flash", "auto", "flash_train", "train_auto"):
            # both segment masks are prefixes (lens_to_mask audio, trailing -1
            # text padding), so the two-segment Pallas kernel applies;
            # training backends take the differentiable custom-VJP variant
            from f5_tts_tpu.ops.flash_attention import (
                flash_attention_two_segment, flash_attention_two_segment_trainable,
                flash_seg_supported)

            if backend in ("flash", "flash_train") or flash_seg_supported(Q):
                fn = (flash_attention_two_segment_trainable
                      if backend in ("flash_train", "train_auto")
                      else flash_attention_two_segment)
                out = fn(Q, K, V, jnp.sum(mask, axis=-1), jnp.sum(cm, axis=-1), seg=n)
        if out is None:
            out = sdpa(Q, K, V, jnp.concatenate([mask, cm], axis=1))
    else:
        if backend in ("flash", "auto", "flash_train", "train_auto"):
            from f5_tts_tpu.ops.flash_attention import (
                flash_attention, flash_attention_trainable, flash_supported)

            if backend in ("flash", "flash_train") or flash_supported(Q):
                fn = (flash_attention_trainable
                      if backend in ("flash_train", "train_auto")
                      else flash_attention)
                out = fn(Q, K, V, None)
        if out is None:
            out = sdpa(Q, K, V, None)
    out = out.transpose(0, 2, 1, 3).reshape(b, n + nt, -1)
    xo, co = out[:, :n], out[:, n:]
    xo = L.linear(p["to_out"], xo)
    if not context_pre_only:
        co = L.linear(p["to_out_c"], co)
    else:
        co = None
    if mask is not None:
        xo = xo * mask[..., None].astype(xo.dtype)
    if co is not None and c_mask is not None:
        co = co * c_mask[..., None].astype(co.dtype)
    return xo, co


def _block(bp, x, c, t_emb, cfg: MMDiTConfig, rope_a, rope_t, mask, c_mask,
           context_pre_only: bool, attn_mask_enabled: bool, backend: str = "sdpa"):
    if context_pre_only:
        norm_c = L.adaln_final(bp["attn_norm_c"], c, t_emb)
    else:
        norm_c, c_gate, c_shift, c_scale, c_gate_mlp = L.adaln(bp["attn_norm_c"], c, t_emb)
    norm_x, x_gate, x_shift, x_scale, x_gate_mlp = L.adaln(bp["attn_norm_x"], x, t_emb)
    xo, co = _joint_attention(bp["attn"], norm_x, norm_c, cfg.heads, rope_a, rope_t,
                              mask, c_mask, context_pre_only, attn_mask_enabled, backend)
    if context_pre_only:
        c = None
    else:
        c = c + c_gate[:, None] * co
        nc = L.layer_norm(c, eps=1e-6) * (1 + c_scale[:, None]) + c_shift[:, None]
        c = c + c_gate_mlp[:, None] * L.feedforward(bp["ff_c"], nc)
    x = x + x_gate[:, None] * xo
    nx = L.layer_norm(x, eps=1e-6) * (1 + x_scale[:, None]) + x_shift[:, None]
    x = x + x_gate_mlp[:, None] * L.feedforward(bp["ff_x"], nx)
    return x, c


def forward(
    params,
    cfg: MMDiTConfig,
    x,  # [b, n, mel]
    cond,
    text_emb,  # [b, nt, dim] (TEXT length — dual stream)
    time,
    mask=None,
    c_mask=None,  # [b, nt] text valid mask
    drop_audio_cond: bool = False,
    backend: str = "sdpa",
    attn_mask_enabled: bool = False,
):
    b, n, _ = x.shape
    nt = text_emb.shape[1]
    if time.ndim == 0:
        time = jnp.broadcast_to(time, (b,))
    t_emb = L.timestep_embed(params["time_embed"], time, dtype=x.dtype)
    h = audio_embedding(params, x, cond, drop_audio_cond=drop_audio_cond)
    rope_a = jnp.asarray(rotary_freqs(cfg.max_pos, cfg.dim_head)[:n])
    rope_t = jnp.asarray(rotary_freqs(cfg.max_pos, cfg.dim_head)[:nt])

    c = text_emb

    def body(carry, bp):
        xx, cc = carry
        xx, cc = _block(bp, xx, cc, t_emb, cfg, rope_a, rope_t, mask, c_mask,
                        False, attn_mask_enabled, backend)
        return (xx, cc), None

    def last_fn(hh, cc):
        return _block(params["last_block"], hh, cc, t_emb, cfg, rope_a, rope_t,
                      mask, c_mask, True, attn_mask_enabled, backend)

    if cfg.checkpoint_activations:  # per-block remat (reference mmdit.py:252-255;
        # policy semantics match models/dit.py remat_policy)
        from f5_tts_tpu.models.dit import remat_policy

        tokens = h.shape[0] * h.shape[1]
        body = jax.checkpoint(body, policy=remat_policy(cfg, tokens=tokens))
        last_fn = jax.checkpoint(last_fn, policy=remat_policy(cfg, tokens=tokens))

    (h, c), _ = jax.lax.scan(body, (h, c), params["blocks"])
    h, _ = last_fn(h, c)
    h = L.adaln_final(params["norm_out"], h, t_emb)
    return L.linear(params["proj_out"], h)


def forward_with_text(
    params, cfg: MMDiTConfig, x, cond, text_ids, time, mask=None, lens=None,
    drop_audio_cond=False, drop_text=False, backend="sdpa", attn_mask_enabled=False,
):
    te = text_embedding(params, cfg, text_ids, drop_text=drop_text).astype(x.dtype)
    c_mask = (text_ids + 1) != 0
    return forward(params, cfg, x, cond, te, time, mask=mask, c_mask=c_mask,
                   drop_audio_cond=drop_audio_cond, backend=backend,
                   attn_mask_enabled=attn_mask_enabled)


def forward_cfg(
    params, cfg: MMDiTConfig, x, step_cond, text_emb_cond, text_emb_uncond, time,
    mask=None, c_mask=None, backend="sdpa", attn_mask_enabled: bool = False,
):
    b = x.shape[0]
    x2 = jnp.concatenate([x, x], axis=0)
    cond2 = jnp.concatenate([step_cond, jnp.zeros_like(step_cond)], axis=0)
    te2 = jnp.concatenate([text_emb_cond, text_emb_uncond], axis=0)
    if time.ndim == 0:
        time = jnp.broadcast_to(time, (b,))
    t2 = jnp.concatenate([time, time], axis=0)
    mask2 = None if mask is None else jnp.concatenate([mask, mask], axis=0)
    cm2 = None if c_mask is None else jnp.concatenate([c_mask, c_mask], axis=0)
    out = forward(params, cfg, x2, cond2, te2, t2, mask=mask2, c_mask=cm2,
                  backend=backend, attn_mask_enabled=attn_mask_enabled)
    return out[:b], out[b:]
