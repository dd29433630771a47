"""Torch oracle for the UNetT backbone (reference backbones/unett.py semantics)."""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F

from tests.oracles import torch_dit as ODT
from tests.oracles import torch_layers as O


def rms_norm_xt(p, x):
    return F.normalize(x, dim=-1) * (x.shape[-1] ** 0.5) * O.t(p["g"])


def text_embedding(p, cfg, text_ids, seq_len, drop_text=False):
    tp = p["text_embed"]
    text_dim = cfg.text_dim or cfg.mel_dim
    ids = text_ids + 1
    nt = ids.shape[1]
    ids = ids[:, :seq_len] if nt >= seq_len else F.pad(ids, (0, seq_len - nt), value=0)
    pad_mask = ids == 0
    if drop_text:
        ids = torch.zeros_like(ids)
    emb = F.embedding(ids, O.t(tp["embed"]["weight"]))
    if cfg.conv_layers > 0:
        freqs = ODT.abs_pos_table(cfg.max_pos, text_dim)[:seq_len]
        emb = emb + freqs.unsqueeze(0)
        if cfg.text_mask_padding:
            emb = emb.masked_fill(pad_mask.unsqueeze(-1), 0.0)
            for bp in tp["blocks"]:
                emb = O.convnext_v2(bp, emb)
                emb = emb.masked_fill(pad_mask.unsqueeze(-1), 0.0)
        else:
            for bp in tp["blocks"]:
                emb = O.convnext_v2(bp, emb)
    return emb


def _unstack(stacked, depth):
    import jax

    return [jax.tree.map(lambda x, i=i: np.asarray(x)[i], stacked) for i in range(depth)]


def forward(p, cfg, x, cond, text_ids, time, mask=None, drop_audio_cond=False, drop_text=False):
    b, n, _ = x.shape
    if time.ndim == 0:
        time = time.repeat(b)
    t_emb = O.timestep_embed(p["time_embed"], time)
    te = text_embedding(p, cfg, text_ids, n, drop_text=drop_text)
    if drop_audio_cond:
        cond = torch.zeros_like(cond)
    h = O.linear(p["input_embed"]["proj"], torch.cat([x, cond, te], dim=-1))
    h = O.conv_pos_embed(p["input_embed"]["conv_pos"], h) + h

    h = torch.cat([t_emb.unsqueeze(1), h], dim=1)
    if mask is not None:
        mask = F.pad(mask, (1, 0), value=True)
    rope = O.rotary_freqs(n + 1, cfg.dim_head)

    half = cfg.depth // 2
    first = _unstack(p["first"], half)
    second = _unstack(p["second"], half)
    skips = []
    for idx in range(cfg.depth):
        if idx < half:
            bp = first[idx]
            skips.append(h)
        else:
            bp = second[idx - half]
            skip = skips.pop()
            if cfg.skip_connect_type == "concat":
                h = O.linear(bp["skip_proj"], torch.cat([h, skip], dim=-1))
            elif cfg.skip_connect_type == "add":
                h = h + skip
        a = rms_norm_xt(bp["attn_norm"], h)
        h = O.mha(bp["attn"], a, cfg.heads, mask=mask, rope_freqs=rope, pe_attn_head=cfg.pe_attn_head) + h
        f = rms_norm_xt(bp["ff_norm"], h)
        h = O.feedforward(bp["ff"], f) + h
    h = rms_norm_xt(p["norm_out"], h)[:, 1:, :]
    return O.linear(p["proj_out"], h)
