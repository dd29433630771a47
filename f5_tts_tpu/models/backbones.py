"""Backbone registry: uniform functional interface over DiT / UNetT / MMDiT.

Each backbone module exposes:
  init(key, cfg) -> params
  text_embedding(params, cfg, text_ids, seq_len, lens=None, drop_text=False)
  forward(params, cfg, x, cond, text_emb, time, mask=None, drop_audio_cond=False, backend)
  forward_cfg(params, cfg, x, step_cond, te_cond, te_uncond, time, mask=None, backend)
  forward_with_text(...)  (training path)
"""

from __future__ import annotations

from f5_tts_tpu.models import dit, unett
from f5_tts_tpu.models.configs import DiTConfig, UNetTConfig


def get_backbone(arch_cfg):
    if isinstance(arch_cfg, DiTConfig):
        return dit
    if isinstance(arch_cfg, UNetTConfig):
        return unett
    if getattr(arch_cfg, "backbone", None) == "MMDiT":
        from f5_tts_tpu.models import mmdit

        return mmdit
    raise ValueError(f"unknown backbone config {type(arch_cfg)}")
