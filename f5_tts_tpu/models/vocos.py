"""Vocos vocoder (mel -> waveform), TPU-native port.

Replaces the reference's external `vocos` dependency + TRT `vocos_vocoder.plan`
engine (reference infer/utils_infer.py:106-145, runtime scripts
export_vocoder_to_onnx.py / conv_stft.py).  Architecture mirrors
charactr/vocos-mel-24khz: Conv1d embed -> LayerNorm -> 8 ConvNeXt(v1, layer
scale) blocks -> LayerNorm -> ISTFT head (Linear to mag/phase, inverse STFT
with center padding).  The ISTFT is the matmul+overlap-add kernel from
ops/stft.py, so mel->wav is one fused XLA region that chains directly onto the
CFM sampler graph.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from f5_tts_tpu.models import layers as L
from f5_tts_tpu.ops.stft import STFTConfig, istft


@dataclass(frozen=True)
class VocosConfig:
    input_channels: int = 100
    dim: int = 512
    intermediate_dim: int = 1536
    num_layers: int = 8
    n_fft: int = 1024
    hop_length: int = 256
    sample_rate: int = 24_000

    @property
    def stft(self) -> STFTConfig:
        return STFTConfig(n_fft=self.n_fft, hop_length=self.hop_length, win_length=self.n_fft, center=True)


def convnext_v1_init(key, dim: int, intermediate_dim: int, layer_scale: float):
    """Vocos ConvNeXt block (v1): dwconv k7 -> LN -> pw1 -> GELU -> pw2,
    layer-scale gamma residual (no GRN — that's the v2 variant)."""
    ks = jax.random.split(key, 3)
    return {
        "dwconv": L.conv1d_init(ks[0], dim, dim, 7, groups=dim),
        "norm": L.layer_norm_init(dim),
        "pwconv1": L.linear_init(ks[1], dim, intermediate_dim),
        "pwconv2": L.linear_init(ks[2], intermediate_dim, dim),
        "gamma": jnp.full((dim,), layer_scale, jnp.float32),
    }


def convnext_v1(p, x):
    residual = x
    x = L.conv1d(p["dwconv"], x, groups=x.shape[-1])
    x = L.layer_norm(x, p["norm"]["weight"].astype(x.dtype), p["norm"]["bias"].astype(x.dtype), eps=1e-6)
    x = L.linear(p["pwconv1"], x)
    x = jax.nn.gelu(x, approximate=False)
    x = L.linear(p["pwconv2"], x)
    return residual + p["gamma"].astype(x.dtype) * x


def init(key: jax.Array, cfg: VocosConfig = VocosConfig()):
    ks = jax.random.split(key, 4)
    layer_scale = 1.0 / cfg.num_layers
    return {
        "embed": L.conv1d_init(ks[0], cfg.input_channels, cfg.dim, 7),
        "norm": L.layer_norm_init(cfg.dim),
        "blocks": [
            convnext_v1_init(k, cfg.dim, cfg.intermediate_dim, layer_scale)
            for k in jax.random.split(ks[1], cfg.num_layers)
        ],
        "final_norm": L.layer_norm_init(cfg.dim),
        "head": L.linear_init(ks[2], cfg.dim, cfg.n_fft + 2),
    }


def decode(
    params,
    mel: jax.Array,
    cfg: VocosConfig = VocosConfig(),
    length: int | None = None,
    lens: jax.Array | None = None,
) -> jax.Array:
    """[b, n, n_mels] log-mel -> [b, T] waveform, T = (n-1)*hop by default.

    ``lens`` ([b] int) makes decoding of a bucket-padded mel bit-identical to
    decoding each sample's exact-length mel: padded frames are masked at every
    conv boundary (zeros == the conv zero-padding an exact-length input sees)
    and excluded from the ISTFT overlap-add envelope.
    """
    keep = None
    if lens is not None:
        keep = (jnp.arange(mel.shape[1])[None, :] < lens[:, None])[..., None].astype(mel.dtype)
        mel = mel * keep
    x = L.conv1d(params["embed"], mel)
    if keep is not None:
        x = x * keep
    x = L.layer_norm(x, params["norm"]["weight"].astype(x.dtype), params["norm"]["bias"].astype(x.dtype), eps=1e-6)
    for bp in params["blocks"]:
        if keep is not None:
            x = x * keep  # re-zero before each dwconv so padding never leaks
        x = convnext_v1(bp, x)
    x = L.layer_norm(
        x, params["final_norm"]["weight"].astype(x.dtype), params["final_norm"]["bias"].astype(x.dtype), eps=1e-6
    )
    x = L.linear(params["head"], x)  # [b, n, n_fft + 2]
    n_freq = cfg.n_fft // 2 + 1
    mag, phase = x[..., :n_freq], x[..., n_freq:]
    # magnitude cap AFTER exp (vocos heads.py ISTFTHead: exp(x).clip(max=1e2));
    # the inner clip only guards exp from fp32 overflow on wild inputs
    mag = jnp.minimum(jnp.exp(jnp.clip(mag.astype(jnp.float32), max=20.0)), 1e2)
    re = mag * jnp.cos(phase.astype(jnp.float32))
    im = mag * jnp.sin(phase.astype(jnp.float32))
    return istft(re, im, cfg.stft, length=length, frame_lens=lens)
