"""Torch oracle for the full DiT backbone (reference backbones/dit.py semantics),
consuming the JAX param pytree directly."""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F

from tests.oracles import torch_layers as O


def abs_pos_table(max_len, dim, theta=10000.0):
    inv = 1.0 / (theta ** (torch.arange(0, dim, 2).float()[: dim // 2] / dim))
    freqs = torch.outer(torch.arange(max_len).float(), inv)
    return torch.cat([freqs.cos(), freqs.sin()], dim=-1)


def text_embedding(p, cfg, text_ids, seq_len, lens=None, drop_text=False):
    tp = p["text_embed"]
    ids = text_ids + 1
    nt = ids.shape[1]
    if nt >= seq_len:
        ids = ids[:, :seq_len]
    else:
        ids = F.pad(ids, (0, seq_len - nt), value=0)
    valid = None
    if lens is not None:
        pos = torch.arange(seq_len).unsqueeze(0)
        valid = pos < lens.unsqueeze(1)
        ids = ids.masked_fill(~valid, 0)
    pad_mask = ids == 0
    if drop_text:
        ids = torch.zeros_like(ids)
    emb = F.embedding(ids, O.t(p["text_embed"]["embed"]["weight"]))
    if valid is not None:
        emb = emb.masked_fill(~valid.unsqueeze(-1), 0.0)
    if cfg.conv_layers > 0:
        freqs = abs_pos_table(cfg.max_pos, cfg.text_dim)[:seq_len]
        if valid is not None:
            freqs = freqs.unsqueeze(0) * valid.unsqueeze(-1).float()
        emb = emb + freqs
        if cfg.text_mask_padding:
            emb = emb.masked_fill(pad_mask.unsqueeze(-1), 0.0)
            for bp in tp["blocks"]:
                emb = O.convnext_v2(bp, emb)
                emb = emb.masked_fill(pad_mask.unsqueeze(-1), 0.0)
        else:
            for bp in tp["blocks"]:
                emb = O.convnext_v2(bp, emb)
    return emb


def input_embedding(p, x, cond, text_emb, drop_audio_cond=False, mask=None):
    ip = p["input_embed"]
    if drop_audio_cond:
        cond = torch.zeros_like(cond)
    h = O.linear(ip["proj"], torch.cat([x, cond, text_emb], dim=-1))
    return O.conv_pos_embed(ip["conv_pos"], h, mask=mask) + h


def _unstack_blocks(stacked, depth):
    out = []
    for i in range(depth):

        def take(x, i=i):
            return np.asarray(x)[i]

        import jax

        out.append(jax.tree.map(take, stacked))
    return out


def forward(p, cfg, x, cond, text_ids, time, mask=None, drop_audio_cond=False, drop_text=False, lens=None):
    b, n, _ = x.shape
    if time.ndim == 0:
        time = time.repeat(b)
    t_emb = O.timestep_embed(p["time_embed"], time)
    te = text_embedding(p, cfg, text_ids, n, lens=lens, drop_text=drop_text)
    h = input_embedding(p, x, cond, te, drop_audio_cond=drop_audio_cond, mask=mask)
    rope = O.rotary_freqs(n, cfg.dim_head)
    for bp in _unstack_blocks(p["blocks"], cfg.depth):
        h = O.dit_block(bp, h, t_emb, cfg.heads, mask=mask, rope_freqs=rope, pe_attn_head=cfg.pe_attn_head)
    if "long_skip" in p:
        raise NotImplementedError
    h = O.adaln_final(p["norm_out"], h, t_emb)
    return O.linear(p["proj_out"], h)
