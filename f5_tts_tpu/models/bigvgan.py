"""BigVGAN v2 vocoder (mel -> waveform), TPU-native port.

Replaces the reference's BigVGAN git-submodule dependency
(reference infer/utils_infer.py:126-141, src/third_party/BigVGAN).  Arch =
nvidia/bigvgan_v2_24khz_100band_256x: conv_pre -> 6 transposed-conv upsample
stages (4,4,2,2,2,2 = 256x) each followed by 3 parallel AMP resblocks
(dilated convs + anti-aliased SnakeBeta activations) -> conv_post, clamp.

The anti-aliased activation (alias-free 2x up -> snake -> 2x down with
kaiser-windowed sinc filters) is expressed with conv/conv_transpose ops so XLA
maps it onto the MXU; the reference's optional fused CUDA kernel
(use_cuda_kernel) is an optimization it ships disabled (utils_infer.py:137-140).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from f5_tts_tpu.models import layers as L


@dataclass(frozen=True)
class BigVGANConfig:
    """nvidia/bigvgan_v2_24khz_100band_256x config.json values."""

    num_mels: int = 100
    upsample_rates: tuple = (4, 4, 2, 2, 2, 2)
    upsample_kernel_sizes: tuple = (8, 8, 4, 4, 4, 4)
    upsample_initial_channel: int = 1536
    resblock_kernel_sizes: tuple = (3, 7, 11)
    resblock_dilation_sizes: tuple = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    activation: str = "snakebeta"
    snake_logscale: bool = True
    use_bias_at_final: bool = False
    use_tanh_at_final: bool = False
    sample_rate: int = 24_000


def kaiser_sinc_filter1d(cutoff: float, half_width: float, kernel_size: int) -> np.ndarray:
    """Kaiser-windowed sinc low-pass (alias-free-torch resample filter)."""
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    delta_f = 4 * half_width
    A = 2.285 * (half_size - 1) * np.pi * delta_f + 7.95
    if A > 50.0:
        beta = 0.1102 * (A - 8.7)
    elif A >= 21.0:
        beta = 0.5842 * (A - 21) ** 0.4 + 0.07886 * (A - 21.0)
    else:
        beta = 0.0
    window = np.kaiser(kernel_size, beta)
    if even:
        time = np.arange(-half_size, half_size) + 0.5
    else:
        time = np.arange(kernel_size) - half_size
    if cutoff == 0:
        return np.zeros(kernel_size)
    f = 2 * cutoff * window * np.sinc(2 * cutoff * time)
    f = f / np.sum(f) * 1.0  # normalized so DC gain == 1 pre-ratio-scaling
    return f.astype(np.float32)


def _snake_beta(x, alpha, beta, logscale: bool):
    """SnakeBeta: x + 1/(beta+eps) * sin^2(alpha*x); params per channel."""
    if logscale:
        alpha = jnp.exp(alpha)
        beta = jnp.exp(beta)
    return x + (1.0 / (beta + 1e-9)) * jnp.square(jnp.sin(x * alpha))


def _upsample2(x, filt):
    """[b, n, c] -> [b, 2n, c] anti-aliased 2x upsample.

    Exact alias-free-torch UpSample1d semantics (ratio=2, k=12): replicate-pad
    by k//ratio - 1, VALID conv_transpose stride 2 with the sinc filter scaled
    by ratio, then crop pad*stride + (k - stride)//2 per side."""
    c = x.shape[-1]
    k = filt.shape[0]
    ratio = 2
    pad = k // ratio - 1
    crop = pad * ratio + (k - ratio) // 2
    kernel = jnp.tile((float(ratio) * filt)[:, None, None], (1, 1, c))
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="edge")
    # conv_transpose == lhs-dilated conv; the sinc filter is palindromic so no
    # kernel flip is needed (lax.conv_transpose lacks grouped support here)
    y = jax.lax.conv_general_dilated(
        xp, kernel.astype(x.dtype), window_strides=(1,), padding=[(k - 1, k - 1)],
        lhs_dilation=(ratio,), dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=c,
    )
    return y[:, crop : crop + ratio * x.shape[1], :]


def _downsample2(x, filt):
    """[b, 2n, c] -> [b, n, c] anti-aliased 2x downsample (alias-free-torch
    LowPassFilter1d: replicate pad (k//2 - 1, k//2), stride-2 conv)."""
    c = x.shape[-1]
    k = filt.shape[0]
    pad_l = k // 2 - (1 if k % 2 == 0 else 0)
    pad_r = k // 2
    kernel = jnp.tile(filt[:, None, None], (1, 1, c))
    xp = jnp.pad(x, ((0, 0), (pad_l, pad_r), (0, 0)), mode="edge")
    return jax.lax.conv_general_dilated(
        xp, kernel.astype(x.dtype), window_strides=(2,), padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=c,
    )


def _aa_filters():
    f = kaiser_sinc_filter1d(cutoff=0.5 / 2, half_width=0.6 / 2, kernel_size=12)
    return jnp.asarray(f), jnp.asarray(f)


def activation1d(x, alpha, beta, logscale: bool):
    """Anti-aliased SnakeBeta: 2x upsample -> snake -> 2x downsample."""
    up, down = _aa_filters()
    y = _upsample2(x, up)
    y = _snake_beta(y, alpha, beta, logscale)
    return _downsample2(y, down)


def amp_block_init(key, channels: int, kernel_size: int, dilations=(1, 3, 5)):
    """AMPBlock1: len(d) dilated convs1 + len(d) d=1 convs2, interleaved
    anti-aliased activations; 2*len(d) activation param pairs."""
    n = len(dilations)
    ks = jax.random.split(key, 2 * n)
    return {
        "convs1": [L.conv1d_init(ks[i], channels, channels, kernel_size) for i in range(n)],
        "convs2": [L.conv1d_init(ks[n + i], channels, channels, kernel_size) for i in range(n)],
        "alpha": jnp.zeros((2 * n, channels), jnp.float32),
        "beta": jnp.zeros((2 * n, channels), jnp.float32),
    }


def amp_block(p, x, kernel_size: int, dilations, logscale: bool):
    for i, d in enumerate(dilations):
        xt = activation1d(x, p["alpha"][2 * i], p["beta"][2 * i], logscale)
        xt = L.conv1d(p["convs1"][i], xt, dilation=d)
        xt = activation1d(xt, p["alpha"][2 * i + 1], p["beta"][2 * i + 1], logscale)
        xt = L.conv1d(p["convs2"][i], xt)
        x = x + xt
    return x


def conv_transpose1d(p, x, stride: int, kernel_size: int):
    """torch ConvTranspose1d(stride=s, padding=(k-s)//2) -> output len = n*s.

    Expressed as an lhs-dilated conv: out = (n-1)s - 2p + k with the kernel
    flipped along the tap axis and in/out swapped.  Kernel stored [k, out, in]
    (= torch [in, out, k] transposed)."""
    pad = (kernel_size - stride) // 2
    kernel = jnp.flip(p["kernel"], axis=0).transpose(0, 2, 1)  # [k, in, out]
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), window_strides=(1,),
        padding=[(kernel_size - 1 - pad, kernel_size - 1 - pad)],
        lhs_dilation=(stride,), dimension_numbers=("NWC", "WIO", "NWC"),
    )
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def init(key: jax.Array, cfg: BigVGANConfig = BigVGANConfig()):
    ks = jax.random.split(key, 4 + len(cfg.upsample_rates))
    ch0 = cfg.upsample_initial_channel
    params = {"conv_pre": L.conv1d_init(ks[0], cfg.num_mels, ch0, 7)}
    ups, resblocks = [], []
    ch = ch0
    for i, (r, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        ch_out = ch // 2
        kk = jax.random.split(ks[1 + i], 1 + len(cfg.resblock_kernel_sizes))
        # store transposed-conv kernels [k, out, in] (torch IOW layout transposed at load)
        import math

        bound = 1.0 / math.sqrt(ch * k / r)  # torch ConvTranspose1d default-ish
        ups.append({
            "kernel": jax.random.uniform(kk[0], (k, ch_out, ch), jnp.float32, -bound, bound),
            "bias": jax.random.uniform(jax.random.fold_in(kk[0], 1), (ch_out,), jnp.float32, -bound, bound),
        })
        resblocks.append([
            amp_block_init(kk[1 + j], ch_out, rk, cfg.resblock_dilation_sizes[j])
            for j, rk in enumerate(cfg.resblock_kernel_sizes)
        ])
        ch = ch_out
    params["ups"] = ups
    params["resblocks"] = resblocks
    params["post_alpha"] = jnp.zeros((ch,), jnp.float32)
    params["post_beta"] = jnp.zeros((ch,), jnp.float32)
    params["conv_post"] = L.conv1d_init(ks[-1], ch, 1, 7, bias=cfg.use_bias_at_final)
    return params


def decode(params, mel: jax.Array, cfg: BigVGANConfig = BigVGANConfig()) -> jax.Array:
    """[b, n, num_mels] log-mel -> [b, n * 256] waveform."""
    x = L.conv1d(params["conv_pre"], mel)
    for i, (r, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        x = conv_transpose1d(params["ups"][i], x, r, k)
        acc = None
        for j, rk in enumerate(cfg.resblock_kernel_sizes):
            y = amp_block(params["resblocks"][i][j], x, rk, cfg.resblock_dilation_sizes[j],
                          cfg.snake_logscale)
            acc = y if acc is None else acc + y
        x = acc / len(cfg.resblock_kernel_sizes)
    x = activation1d(x, params["post_alpha"], params["post_beta"], cfg.snake_logscale)
    x = L.conv1d(params["conv_post"], x)
    x = jnp.tanh(x) if cfg.use_tanh_at_final else jnp.clip(x, -1.0, 1.0)
    return x[..., 0]
