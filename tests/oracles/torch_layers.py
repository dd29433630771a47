"""Independent torch oracle implementations of the reference layer semantics.

These are written fresh from the documented behavior of
src/f5_tts/model/modules.py (and x_transformers rotary), NOT copied — they
exist so the JAX layers can be golden-tested without torchaudio/x_transformers
installed.  Weights are injected from the JAX pytrees (see ``load_*``), so any
mismatch is a math bug, not an init mismatch.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F


def t(x):
    return torch.from_numpy(np.asarray(x)).float()


def linear(p, x):
    return F.linear(x, t(p["kernel"]).T, t(p["bias"]) if "bias" in p else None)


def conv1d_ncw(p, x, groups=1, dilation=1):
    """x: [b, c, n]; p kernel [k, in/g, out] -> torch [out, in/g, k]."""
    w = t(p["kernel"]).permute(2, 1, 0)
    k = w.shape[-1]
    pad = dilation * (k - 1) // 2
    return F.conv1d(x, w, t(p.get("bias")) if "bias" in p else None, padding=pad, groups=groups, dilation=dilation)


def grn(p, x):
    gx = torch.norm(x, p=2, dim=1, keepdim=True)
    nx = gx / (gx.mean(dim=-1, keepdim=True) + 1e-6)
    return t(p["gamma"]) * (x * nx) + t(p["beta"]) + x


def convnext_v2(p, x, dilation=1):
    residual = x
    x = conv1d_ncw(p["dwconv"], x.transpose(1, 2), groups=x.shape[-1], dilation=dilation).transpose(1, 2)
    x = F.layer_norm(x, (x.shape[-1],), t(p["norm"]["weight"]), t(p["norm"]["bias"]), eps=1e-6)
    x = linear(p["pwconv1"], x)
    x = F.gelu(x)
    x = grn(p["grn"], x)
    x = linear(p["pwconv2"], x)
    return residual + x


def conv_pos_embed(p, x, mask=None, groups=16):
    g = groups
    xm = x
    if mask is not None:
        xm = xm.masked_fill(~mask.unsqueeze(-1), 0.0)
    y = xm.transpose(1, 2)
    y = F.mish(conv1d_ncw(p["conv1"], y, groups=g))
    if mask is not None:
        y = y.masked_fill(~mask.unsqueeze(1), 0.0)
    y = F.mish(conv1d_ncw(p["conv2"], y, groups=g))
    y = y.transpose(1, 2)
    if mask is not None:
        y = y.masked_fill(~mask.unsqueeze(-1), 0.0)
    return y


def sinus_pos_embed(x, dim, scale=1000.0):
    half = dim // 2
    emb = math.log(10000) / (half - 1)
    emb = torch.exp(torch.arange(half).float() * -emb)
    emb = scale * x.unsqueeze(1) * emb.unsqueeze(0)
    return torch.cat((emb.sin(), emb.cos()), dim=-1)


def timestep_embed(p, time, freq_embed_dim=256):
    h = sinus_pos_embed(time, freq_embed_dim)
    return linear(p["mlp2"], F.silu(linear(p["mlp1"], h)))


def adaln(p, x, emb):
    e = linear(p["linear"], F.silu(emb))
    shift_msa, scale_msa, gate_msa, shift_mlp, scale_mlp, gate_mlp = torch.chunk(e, 6, dim=1)
    x = F.layer_norm(x, (x.shape[-1],), eps=1e-6) * (1 + scale_msa[:, None]) + shift_msa[:, None]
    return x, gate_msa, shift_mlp, scale_mlp, gate_mlp


def adaln_final(p, x, emb):
    e = linear(p["linear"], F.silu(emb))
    scale, shift = torch.chunk(e, 2, dim=1)
    return F.layer_norm(x, (x.shape[-1],), eps=1e-6) * (1 + scale)[:, None, :] + shift[:, None, :]


def feedforward(p, x):
    return linear(p["out"], F.gelu(linear(p["in"], x), approximate="tanh"))


def rms_norm(p, x, eps=1e-6):
    variance = x.float().pow(2).mean(-1, keepdim=True)
    return x * torch.rsqrt(variance + eps) * t(p["weight"])


# x_transformers-style rotary (interleaved rotate-every-two)


def rotary_freqs(seq_len, dim, theta=10000.0):
    inv_freq = 1.0 / (theta ** (torch.arange(0, dim, 2).float() / dim))
    freqs = torch.einsum("i,j->ij", torch.arange(seq_len).float(), inv_freq)
    freqs = torch.stack((freqs, freqs), dim=-1).reshape(seq_len, dim)
    return freqs


def rotate_half(x):
    x = x.reshape(*x.shape[:-1], -1, 2)
    x1, x2 = x.unbind(dim=-1)
    return torch.stack((-x2, x1), dim=-1).reshape(*x.shape[:-2], -1)


def apply_rotary_pos_emb(x, freqs, scale=1.0):
    return (x * freqs.cos() * scale) + (rotate_half(x) * freqs.sin() * scale)


def mha(p, x, heads, mask=None, rope_freqs=None, pe_attn_head=None):
    b, n, _ = x.shape
    q, k, v = linear(p["to_q"], x), linear(p["to_k"], x), linear(p["to_v"], x)
    hd = q.shape[-1] // heads
    q = q.view(b, n, heads, hd).transpose(1, 2)
    k = k.view(b, n, heads, hd).transpose(1, 2)
    v = v.view(b, n, heads, hd).transpose(1, 2)
    if "q_norm" in p:
        q = rms_norm(p["q_norm"], q)
        k = rms_norm(p["k_norm"], k)
    if rope_freqs is not None:
        if pe_attn_head is not None:
            pn = pe_attn_head
            q = torch.cat([apply_rotary_pos_emb(q[:, :pn], rope_freqs), q[:, pn:]], dim=1)
            k = torch.cat([apply_rotary_pos_emb(k[:, :pn], rope_freqs), k[:, pn:]], dim=1)
        else:
            q = apply_rotary_pos_emb(q, rope_freqs)
            k = apply_rotary_pos_emb(k, rope_freqs)
    attn_mask = None
    if mask is not None:
        attn_mask = mask.unsqueeze(1).unsqueeze(1).expand(b, heads, n, n)
    o = F.scaled_dot_product_attention(q, k, v, attn_mask=attn_mask, dropout_p=0.0, is_causal=False)
    o = o.transpose(1, 2).reshape(b, n, heads * hd)
    o = linear(p["to_out"], o)
    if mask is not None:
        o = o.masked_fill(~mask.unsqueeze(-1), 0.0)
    return o


def dit_block(p, x, t_emb, heads, mask=None, rope_freqs=None, pe_attn_head=None):
    norm, gate_msa, shift_mlp, scale_mlp, gate_mlp = adaln(p["attn_norm"], x, t_emb)
    attn_out = mha(p["attn"], norm, heads, mask=mask, rope_freqs=rope_freqs, pe_attn_head=pe_attn_head)
    x = x + gate_msa.unsqueeze(1) * attn_out
    norm = F.layer_norm(x, (x.shape[-1],), eps=1e-6) * (1 + scale_mlp[:, None]) + shift_mlp[:, None]
    x = x + gate_mlp.unsqueeze(1) * feedforward(p["ff"], norm)
    return x
