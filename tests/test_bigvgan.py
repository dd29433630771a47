"""BigVGAN port tests: anti-aliased activation vs an alias-free-torch oracle,
transposed-conv parity with torch, end-to-end shapes, converter fusion."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from f5_tts_tpu.models import bigvgan as BV


def torch_kaiser_filter(cutoff, half_width, kernel_size):
    return torch.from_numpy(BV.kaiser_sinc_filter1d(cutoff, half_width, kernel_size))


def torch_upsample2(x_ncl, filt):
    """alias_free_torch UpSample1d(ratio=2) oracle."""
    ratio, k = 2, filt.shape[-1]
    C = x_ncl.shape[1]
    pad = k // ratio - 1
    pad_left = pad * ratio + (k - ratio) // 2
    pad_right = pad * ratio + (k - ratio + 1) // 2
    x = F.pad(x_ncl, (pad, pad), mode="replicate")
    y = ratio * F.conv_transpose1d(x, filt.view(1, 1, k).expand(C, -1, -1), stride=ratio, groups=C)
    return y[..., pad_left:-pad_right]


def torch_downsample2(x_ncl, filt):
    """alias_free_torch DownSample1d(ratio=2) oracle."""
    k = filt.shape[-1]
    C = x_ncl.shape[1]
    pad_left = k // 2 - 1
    pad_right = k // 2
    x = F.pad(x_ncl, (pad_left, pad_right), mode="replicate")
    return F.conv1d(x, filt.view(1, 1, k).expand(C, -1, -1), stride=2, groups=C)


def test_aa_up_down_matches_alias_free_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 64, 8)).astype(np.float32)  # [b, n, c]
    up, down = BV._aa_filters()
    got_up = np.asarray(BV._upsample2(jnp.asarray(x), up))
    filt = torch_kaiser_filter(0.25, 0.3, 12).float()
    want_up = torch_upsample2(torch.from_numpy(x).transpose(1, 2), filt).transpose(1, 2).numpy()
    assert got_up.shape == want_up.shape == (2, 128, 8)
    np.testing.assert_allclose(got_up, want_up, atol=1e-5)

    got_dn = np.asarray(BV._downsample2(jnp.asarray(got_up), down))
    want_dn = torch_downsample2(torch.from_numpy(want_up).transpose(1, 2), filt).transpose(1, 2).numpy()
    assert got_dn.shape == want_dn.shape == (2, 64, 8)
    np.testing.assert_allclose(got_dn, want_dn, atol=1e-5)


def test_conv_transpose_matches_torch():
    rng = np.random.default_rng(1)
    b, n, cin, cout, k, s = 2, 16, 6, 4, 8, 4
    x = rng.standard_normal((b, n, cin)).astype(np.float32)
    w = rng.standard_normal((cin, cout, k)).astype(np.float32)  # torch layout
    bias = rng.standard_normal((cout,)).astype(np.float32)
    p = {"kernel": jnp.asarray(np.transpose(w, (2, 1, 0))), "bias": jnp.asarray(bias)}
    got = np.asarray(BV.conv_transpose1d(p, jnp.asarray(x), stride=s, kernel_size=k))
    want = F.conv_transpose1d(torch.from_numpy(x).transpose(1, 2), torch.from_numpy(w),
                              torch.from_numpy(bias), stride=s, padding=(k - s) // 2)
    want = want.transpose(1, 2).numpy()
    assert got.shape == want.shape == (b, n * s, cout)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_snake_beta():
    x = jnp.asarray(np.linspace(-2, 2, 16, dtype=np.float32))
    alpha = jnp.zeros(16)
    beta = jnp.zeros(16)
    y = BV._snake_beta(x, alpha, beta, logscale=True)  # exp(0)=1
    want = np.asarray(x) + np.sin(np.asarray(x)) ** 2
    np.testing.assert_allclose(np.asarray(y), want, atol=1e-5)


def tiny_cfg():
    return BV.BigVGANConfig(
        num_mels=8, upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
        upsample_initial_channel=16, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
    )


def test_bigvgan_decode_shapes():
    cfg = tiny_cfg()
    params = BV.init(jax.random.PRNGKey(0), cfg)
    mel = jnp.asarray(np.random.default_rng(2).standard_normal((1, 20, 8)).astype(np.float32))
    wav = BV.decode(params, mel, cfg)
    assert wav.shape == (1, 20 * 8)
    assert np.isfinite(np.asarray(wav)).all()
    assert np.abs(np.asarray(wav)).max() <= 1.0


def test_bigvgan_converter_weight_norm_fusion():
    from f5_tts_tpu.utils.ckpt import bigvgan_params_from_state

    cfg = tiny_cfg()
    rng = np.random.default_rng(3)
    state = {}

    def wn_conv(name, cout, cin, k, bias=True):
        v = rng.standard_normal((cout, cin, k)).astype(np.float32)
        g = rng.standard_normal((cout, 1, 1)).astype(np.float32)
        state[f"{name}.weight_v"] = v
        state[f"{name}.weight_g"] = g
        if bias:
            state[f"{name}.bias"] = rng.standard_normal((cout,)).astype(np.float32)
        norm = np.sqrt((v * v).sum(axis=(1, 2), keepdims=True))
        return g * v / norm

    def wn_convT(name, cin, cout, k):
        v = rng.standard_normal((cin, cout, k)).astype(np.float32)
        g = rng.standard_normal((cin, 1, 1)).astype(np.float32)
        state[f"{name}.weight_v"] = v
        state[f"{name}.weight_g"] = g
        state[f"{name}.bias"] = rng.standard_normal((cout,)).astype(np.float32)

    w_pre = wn_conv("conv_pre", 16, 8, 7)
    ch = 16
    for i, (r, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        wn_convT(f"ups.{i}.0", ch, ch // 2, k)
        ch //= 2
        rr = f"resblocks.{i}"
        for m in range(2):
            wn_conv(f"{rr}.convs1.{m}", ch, ch, 3)
            wn_conv(f"{rr}.convs2.{m}", ch, ch, 3)
        for m in range(4):
            state[f"{rr}.activations.{m}.act.alpha"] = rng.standard_normal(ch).astype(np.float32)
            state[f"{rr}.activations.{m}.act.beta"] = rng.standard_normal(ch).astype(np.float32)
    state["activation_post.act.alpha"] = rng.standard_normal(ch).astype(np.float32)
    state["activation_post.act.beta"] = rng.standard_normal(ch).astype(np.float32)
    wn_conv("conv_post", 1, ch, 7, bias=False)

    params = bigvgan_params_from_state(state, cfg)
    # fused conv_pre kernel matches manual fusion
    np.testing.assert_allclose(
        np.asarray(params["conv_pre"]["kernel"]), np.transpose(w_pre, (2, 1, 0)), atol=1e-6
    )
    mel = jnp.asarray(rng.standard_normal((1, 12, 8)).astype(np.float32))
    wav = BV.decode(params, mel, cfg)
    assert wav.shape == (1, 12 * 8)
    assert np.isfinite(np.asarray(wav)).all()
