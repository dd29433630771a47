"""Param + FLOP counts per backbone (reference src/f5_tts/scripts/count_params_gflops.py).

Counts params from the pytree and FLOPs analytically for the standard 20 s
audio / 150 text-token operating point (matmul FLOPs = 2*m*n*k; attention
QK^T + PV).  Reference numbers to cross-check: DiT Base 335.8 M / 363.4 G,
UNetT Base 333.2 M / 622.1 G.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp


def count_params(params) -> int:
    return sum(x.size for x in jax.tree.leaves(params))


def dit_flops(cfg, n: int, nt: int) -> float:
    """Analytic forward FLOPs for one DiT pass at seq len n."""
    d, td = cfg.dim, cfg.text_dim
    fl = 0.0
    # text embed convnext blocks at seq n (text is padded to mel frames)
    for _ in range(cfg.conv_layers):
        fl += n * (7 * td + 2 * 2 * td * td * cfg.conv_mult)
    # input embed
    fl += n * 2 * (2 * cfg.mel_dim + td) * d
    fl += 2 * n * (31 * d / 16 * d) * 2  # grouped convs k=31 g=16, twice
    inner = cfg.heads * cfg.dim_head
    for _ in range(cfg.depth):
        fl += n * 2 * d * inner * 4          # qkv + out proj
        fl += 2 * 2 * n * n * inner          # QK^T and PV
        fl += n * 2 * d * (d * cfg.ff_mult) * 2  # ff in+out
        fl += 2 * d * 6 * d                  # adaln
    fl += n * 2 * d * cfg.mel_dim
    return fl


def unett_flops(cfg, n: int, nt: int) -> float:
    d = cfg.dim
    td = cfg.text_dim or cfg.mel_dim
    fl = n * 2 * (2 * cfg.mel_dim + td) * d
    inner = cfg.heads * cfg.dim_head
    m = n + 1  # time token
    for i in range(cfg.depth):
        if i >= cfg.depth // 2 and cfg.skip_connect_type == "concat":
            fl += m * 2 * (2 * d) * d
        fl += m * 2 * d * inner * 4
        fl += 2 * 2 * m * m * inner
        fl += m * 2 * d * (d * cfg.ff_mult) * 2
    fl += n * 2 * d * cfg.mel_dim
    return fl


def main():
    from f5_tts_tpu.models import dit, unett
    from f5_tts_tpu.models.configs import MODEL_CONFIGS

    n = int(20 * 24000 / 256)  # 20 s of audio -> 1875 frames
    nt = 150
    for name in ["F5TTS_v1_Base", "F5TTS_Base", "F5TTS_v1_Small", "E2TTS_Base"]:
        cfg = MODEL_CONFIGS[name]
        if cfg.arch.backbone == "DiT":
            params = dit.init(jax.random.PRNGKey(0), cfg.arch)
            fl = dit_flops(cfg.arch, n, nt)
        else:
            params = unett.init(jax.random.PRNGKey(0), cfg.arch)
            fl = unett_flops(cfg.arch, n, nt)
        # thop-convention (reference script): linear/conv MACs only, no attention
        inner = cfg.arch.heads * cfg.arch.dim_head
        m = n + (1 if cfg.arch.backbone == "UNetT" else 0)
        attn_fl = cfg.arch.depth * 2 * 2 * m * m * inner
        thop_g = (fl - attn_fl) / 2 / 1e9
        print(
            f"{name}: {count_params(params) / 1e6:.1f} M params, "
            f"{fl / 1e9:.1f} GFLOPs @20s (true, incl. attention; "
            f"thop-convention MACs: {thop_g:.1f} G — reference reports this)"
        )


if __name__ == "__main__":
    main()
