"""Model architecture configs mirroring the reference YAMLs
(src/f5_tts/configs/*.yaml) plus mel/training hyperparameters.

These are plain frozen dataclasses — no hydra.  ``MODEL_CONFIGS[name]`` gives
the shipped architectures; ``from_yaml_dict`` accepts a reference-format dict
so user YAML/TOML configs keep working.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

from f5_tts_tpu.ops.mel import MelConfig


@dataclass(frozen=True)
class DiTConfig:
    """DiT backbone arch (reference backbones/dit.py:170-235)."""

    dim: int = 1024
    depth: int = 22
    heads: int = 16
    dim_head: int = 64
    ff_mult: int = 2
    mel_dim: int = 100
    text_num_embeds: int = 2545  # vocab size (Emilia pinyin vocab has 2545 entries)
    text_dim: int = 512
    text_mask_padding: bool = True
    text_embedding_average_upsampling: bool = False
    qk_norm: str | None = None
    conv_layers: int = 4
    conv_mult: int = 2
    pe_attn_head: int | None = None
    long_skip_connection: bool = False
    checkpoint_activations: bool = False
    # rematerialization policy under checkpoint_activations:
    # "nothing" recomputes everything in backward (min memory);
    # "dots" saves matmul outputs (jax dots_with_no_batch_dims_saveable);
    # "flash" saves only the flash-attention out/lse so backward recompute
    # skips the Pallas forward kernel (smallest memory add per saved FLOP);
    # "dots_flash" composes both; "auto" (default) picks per shape from the
    # measured v5e policy matrix (models/dit.py remat_policy: dots_flash
    # when per-device b*n fits HBM, else flash) — A/B per chip with
    # scripts/bench_train.py, table in DEVELOPMENT.md
    remat_policy: str = "auto"
    backbone: str = "DiT"
    # rope/abs-pos table horizon: 8192 frames ~ 87s @ 24kHz hop 256 (dit.py:47)
    max_pos: int = 8192


@dataclass(frozen=True)
class UNetTConfig:
    """UNetT (E2-TTS) backbone arch (reference backbones/unett.py:108-307)."""

    dim: int = 1024
    depth: int = 24
    heads: int = 16
    dim_head: int = 64
    ff_mult: int = 4
    mel_dim: int = 100
    text_num_embeds: int = 2545
    text_dim: int | None = None  # None -> mel_dim
    text_mask_padding: bool = True
    qk_norm: str | None = None
    conv_layers: int = 0
    conv_mult: int = 2
    pe_attn_head: int | None = None
    skip_connect_type: str = "concat"
    checkpoint_activations: bool = False
    remat_policy: str = "auto"  # see DiTConfig.remat_policy
    backbone: str = "UNetT"
    max_pos: int = 4096


@dataclass(frozen=True)
class MMDiTConfig:
    """MMDiT dual-stream backbone arch (reference backbones/mmdit.py:87-262)."""

    dim: int = 1024
    depth: int = 22
    heads: int = 16
    dim_head: int = 64
    ff_mult: int = 4
    mel_dim: int = 100
    text_num_embeds: int = 2545
    text_mask_padding: bool = True
    qk_norm: str | None = None
    checkpoint_activations: bool = False
    remat_policy: str = "auto"  # see DiTConfig.remat_policy
    backbone: str = "MMDiT"
    max_pos: int = 4096
    text_max_pos: int = 1024


@dataclass(frozen=True)
class ModelConfig:
    name: str
    arch: DiTConfig | UNetTConfig | MMDiTConfig
    mel: MelConfig = MelConfig()
    tokenizer: str = "pinyin"


def _dit(name, tokenizer="pinyin", **kw) -> ModelConfig:
    return ModelConfig(name=name, arch=DiTConfig(**kw), tokenizer=tokenizer)


MODEL_CONFIGS: dict[str, ModelConfig] = {
    # F5TTS_v1_Base.yaml:20-44
    "F5TTS_v1_Base": _dit("F5TTS_v1_Base", dim=1024, depth=22, heads=16, ff_mult=2,
                          text_dim=512, text_mask_padding=True, conv_layers=4, pe_attn_head=None),
    # F5TTS_Base.yaml (legacy v0): pe_attn_head=1, no padding mask
    "F5TTS_Base": _dit("F5TTS_Base", dim=1024, depth=22, heads=16, ff_mult=2,
                       text_dim=512, text_mask_padding=False, conv_layers=4, pe_attn_head=1),
    "F5TTS_v1_Small": _dit("F5TTS_v1_Small", tokenizer="char", dim=768, depth=18, heads=12,
                           ff_mult=2, text_dim=512, text_mask_padding=True, conv_layers=4,
                           pe_attn_head=None),
    "F5TTS_Small": _dit("F5TTS_Small", dim=768, depth=18, heads=12, ff_mult=2,
                        text_dim=512, text_mask_padding=False, conv_layers=4, pe_attn_head=1),
    "E2TTS_Base": ModelConfig(
        name="E2TTS_Base",
        arch=UNetTConfig(dim=1024, depth=24, heads=16, ff_mult=4,
                         text_mask_padding=False, pe_attn_head=1),
    ),
    "E2TTS_Small": ModelConfig(
        name="E2TTS_Small",
        arch=UNetTConfig(dim=768, depth=20, heads=12, ff_mult=4,
                         text_mask_padding=False, pe_attn_head=1),
    ),
    # experimental dual-stream config (the reference defines MMDiT but ships no
    # checkpoint for it; provided for training/research use)
    "F5TTS_MMDiT_Base": ModelConfig(
        name="F5TTS_MMDiT_Base",
        arch=MMDiTConfig(dim=1024, depth=22, heads=16, ff_mult=4),
    ),
    # test/smoke-only tiny config (not a released architecture)
    "F5TTS_Tiny": _dit("F5TTS_Tiny", tokenizer="char", dim=64, depth=2, heads=4,
                       ff_mult=2, text_dim=32, text_mask_padding=True, conv_layers=1,
                       pe_attn_head=None),
}


def from_yaml_dict(model: dict) -> ModelConfig:
    """Build a ModelConfig from a reference-format ``model:`` YAML section."""
    backbone = model.get("backbone", "DiT")
    arch_kw = dict(model.get("arch", {}))
    # reference-only knobs that don't apply to the XLA build
    for k in ("attn_backend", "attn_mask_enabled"):
        arch_kw.pop(k, None)
    cls = {"DiT": DiTConfig, "UNetT": UNetTConfig, "MMDiT": MMDiTConfig}[backbone]
    valid = {f.name for f in dataclasses.fields(cls)}
    arch = cls(**{k: v for k, v in arch_kw.items() if k in valid})
    mel_kw = dict(model.get("mel_spec", {}))
    valid_mel = {f.name for f in dataclasses.fields(MelConfig)}
    mel = MelConfig(**{k: v for k, v in mel_kw.items() if k in valid_mel})
    return ModelConfig(
        name=model.get("name", "custom"),
        arch=arch,
        mel=mel,
        tokenizer=model.get("tokenizer", "pinyin"),
    )


def to_yaml_dict(cfg: ModelConfig) -> dict:
    """Inverse of :func:`from_yaml_dict`: a reference-format ``model:`` section
    for a ModelConfig.  Used by the train CLI so hydra-style dotted overrides
    (``++model.arch.dim=256``) can target builtin configs, not only YAML files
    (reference: src/f5_tts/train/train.py:17-19 accepts arbitrary hydra
    overrides on top of the named config)."""
    backbone = {DiTConfig: "DiT", UNetTConfig: "UNetT", MMDiTConfig: "MMDiT"}[type(cfg.arch)]
    return {
        "name": cfg.name,
        "backbone": backbone,
        "tokenizer": cfg.tokenizer,
        "arch": dataclasses.asdict(cfg.arch),
        "mel_spec": dataclasses.asdict(cfg.mel),
    }


def with_vocab_size(cfg: ModelConfig, vocab_size: int) -> ModelConfig:
    return dataclasses.replace(cfg, arch=dataclasses.replace(cfg.arch, text_num_embeds=vocab_size))
