"""Golden tests: JAX layers vs torch oracles with shared (injected) weights."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from f5_tts_tpu.models import layers as L
from f5_tts_tpu.ops import rope as R
from tests.oracles import torch_layers as O


def np_tree(p):
    return jax.tree.map(np.asarray, p)


RNG = np.random.default_rng(7)


def randn(*shape):
    return RNG.standard_normal(shape).astype(np.float32)


def test_linear_matches_torch():
    key = jax.random.PRNGKey(0)
    p = L.linear_init(key, 16, 32)
    x = randn(4, 16)
    got = np.asarray(L.linear(p, jnp.asarray(x)))
    want = O.linear(np_tree(p), torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.parametrize("groups", [1, 4, 32])
def test_conv1d_matches_torch(groups):
    key = jax.random.PRNGKey(1)
    p = L.conv1d_init(key, 32, 32, 7, groups=groups)
    x = randn(2, 20, 32)
    got = np.asarray(L.conv1d(p, jnp.asarray(x), groups=groups))
    want = O.conv1d_ncw(np_tree(p), torch.from_numpy(x).transpose(1, 2), groups=groups).transpose(1, 2).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_convnext_v2_matches_torch():
    key = jax.random.PRNGKey(2)
    p = L.convnext_v2_init(key, 64, 128)
    x = randn(2, 50, 64)
    got = np.asarray(L.convnext_v2(p, jnp.asarray(x)))
    want = O.convnext_v2(np_tree(p), torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_conv_pos_embed_matches_torch_masked():
    key = jax.random.PRNGKey(3)
    p = L.conv_pos_embed_init(key, 64, kernel_size=31, groups=16)
    x = randn(2, 40, 64)
    mask = np.zeros((2, 40), dtype=bool)
    mask[0, :40] = True
    mask[1, :25] = True
    got = np.asarray(L.conv_pos_embed(p, jnp.asarray(x), mask=jnp.asarray(mask)))
    want = O.conv_pos_embed(np_tree(p), torch.from_numpy(x), mask=torch.from_numpy(mask)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_conv_pos_embed_taps_matches_xla():
    """The GSPMD-shardable einsum-tap grouped conv (data-parallel training
    path, see _grouped_conv1d_taps) is the same math as the XLA grouped conv."""
    key = jax.random.PRNGKey(9)
    p = L.conv_pos_embed_init(key, 64, kernel_size=31, groups=16)
    x = randn(2, 40, 64)
    mask = np.zeros((2, 40), dtype=bool)
    mask[0, :40] = True
    mask[1, :25] = True
    want = np.asarray(L.conv_pos_embed_xla(p, jnp.asarray(x), mask=jnp.asarray(mask)))
    got = np.asarray(L.conv_pos_embed_taps(p, jnp.asarray(x), mask=jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, atol=1e-5)
    # even-kernel edge: pad split must match XLA's "same" (lo = (k-1)//2)
    p8 = L.conv_pos_embed_init(key, 64, kernel_size=8, groups=16)
    want8 = np.asarray(L.conv_pos_embed_xla(p8, jnp.asarray(x)))
    got8 = np.asarray(L.conv_pos_embed_taps(p8, jnp.asarray(x)))
    np.testing.assert_allclose(got8, want8, atol=1e-5)


def test_timestep_embed_matches_torch():
    key = jax.random.PRNGKey(4)
    p = L.timestep_embed_init(key, 128)
    tt = np.array([0.0, 0.25, 0.9], dtype=np.float32)
    got = np.asarray(L.timestep_embed(p, jnp.asarray(tt), freq_embed_dim=256))
    want = O.timestep_embed(np_tree(p), torch.from_numpy(tt), freq_embed_dim=256).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_adaln_matches_torch():
    key = jax.random.PRNGKey(5)
    p = L.adaln_init(key, 64, zero=False)
    x, emb = randn(2, 10, 64), randn(2, 64)
    got = L.adaln(p, jnp.asarray(x), jnp.asarray(emb))
    want = O.adaln(np_tree(p), torch.from_numpy(x), torch.from_numpy(emb))
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w.numpy(), atol=1e-4)


def test_adaln_final_matches_torch():
    key = jax.random.PRNGKey(6)
    p = L.adaln_final_init(key, 64, zero=False)
    x, emb = randn(2, 10, 64), randn(2, 64)
    got = np.asarray(L.adaln_final(p, jnp.asarray(x), jnp.asarray(emb)))
    want = O.adaln_final(np_tree(p), torch.from_numpy(x), torch.from_numpy(emb)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_rotary_matches_x_transformers_semantics():
    freqs_j = R.rotary_freqs(32, 64)
    freqs_t = O.rotary_freqs(32, 64).numpy()
    np.testing.assert_allclose(freqs_j, freqs_t, atol=1e-5)
    x = randn(2, 8, 32, 64)  # [b, h, n, d]
    got = np.asarray(R.apply_rotary(jnp.asarray(x), jnp.asarray(freqs_j)))
    want = O.apply_rotary_pos_emb(torch.from_numpy(x), torch.from_numpy(freqs_t)).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_abs_pos_table_matches_reference_formula():
    # reference precompute_freqs_cis: concat [cos || sin] over half-dim
    tab = R.abs_pos_table(16, 8)
    inv = 1.0 / (10000 ** (np.arange(0, 8, 2) / 8))
    ang = np.outer(np.arange(16), inv)
    want = np.concatenate([np.cos(ang), np.sin(ang)], axis=-1)
    np.testing.assert_allclose(tab, want.astype(np.float32), atol=1e-6)


@pytest.mark.parametrize("pe_attn_head", [None, 1])
def test_mha_matches_torch(pe_attn_head):
    key = jax.random.PRNGKey(8)
    heads, dim_head = 4, 16
    p = L.mha_init(key, 64, heads, dim_head)
    x = randn(2, 24, 64)
    mask = np.zeros((2, 24), dtype=bool)
    mask[0, :24] = True
    mask[1, :17] = True
    freqs = R.rotary_freqs(24, dim_head)
    got = np.asarray(
        L.mha(p, jnp.asarray(x), heads, mask=jnp.asarray(mask), rope_freqs=jnp.asarray(freqs),
              pe_attn_head=pe_attn_head, backend="sdpa")
    )
    want = O.mha(
        np_tree(p), torch.from_numpy(x), heads, mask=torch.from_numpy(mask),
        rope_freqs=torch.from_numpy(np.asarray(freqs)), pe_attn_head=pe_attn_head,
    ).numpy()
    np.testing.assert_allclose(got, want, atol=2e-4)


def test_dit_block_matches_torch():
    key = jax.random.PRNGKey(9)
    heads, dim = 4, 64
    p = L.dit_block_init(key, dim, heads, 16, ff_mult=2)
    # zero-init adaln would make the block identity-ish; randomize for a strong test
    k2 = jax.random.PRNGKey(10)
    p["attn_norm"] = L.adaln_init(k2, dim, zero=False)
    x, temb = randn(2, 20, dim), randn(2, dim)
    mask = np.zeros((2, 20), dtype=bool)
    mask[0, :20] = True
    mask[1, :13] = True
    freqs = R.rotary_freqs(20, 16)
    got = np.asarray(
        L.dit_block(p, jnp.asarray(x), jnp.asarray(temb), heads, mask=jnp.asarray(mask),
                    rope_freqs=jnp.asarray(freqs), backend="sdpa")
    )
    want = O.dit_block(
        np_tree(p), torch.from_numpy(x), torch.from_numpy(temb), heads,
        mask=torch.from_numpy(mask), rope_freqs=torch.from_numpy(np.asarray(freqs)),
    ).numpy()
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_fuse_qkv_matches_unfused():
    key = jax.random.PRNGKey(77)
    heads, dim_head = 4, 16
    p = L.mha_init(key, 64, heads, dim_head)
    x = randn(2, 24, 64)
    fused = L.fuse_qkv(p)
    a = np.asarray(L.mha(p, jnp.asarray(x), heads, backend="sdpa"))
    b = np.asarray(L.mha(fused, jnp.asarray(x), heads, backend="sdpa"))
    np.testing.assert_allclose(a, b, atol=1e-5)
    # stacked (depth-leading) variant
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), p, p)
    sf = L.fuse_qkv(stacked)
    assert sf["to_qkv"]["kernel"].shape == (2, 64, 3 * heads * dim_head)


def test_rotary_ntk_rescale_hook():
    base = R.rotary_freqs(16, 8)
    rescaled = R.rotary_freqs(16, 8, theta_rescale_factor=2.0)
    # rescaling theta lowers the angular frequencies (longer wavelengths)
    assert np.all(rescaled[1, 0::2] <= base[1, 0::2] + 1e-9)
    assert not np.allclose(rescaled, base)
