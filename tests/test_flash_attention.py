"""Flash attention kernel vs SDPA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from f5_tts_tpu.ops.attention import sdpa
from f5_tts_tpu.ops import flash_attention as FA


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    # run the Pallas kernel in interpreter mode on CPU
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


@pytest.mark.parametrize("masked", [False, True])
def test_flash_matches_sdpa(masked):
    rng = np.random.default_rng(0)
    b, h, n, dh = 2, 4, 512, 64
    q = rng.standard_normal((b, h, n, dh)).astype(np.float32)
    k = rng.standard_normal((b, h, n, dh)).astype(np.float32)
    v = rng.standard_normal((b, h, n, dh)).astype(np.float32)
    mask = None
    if masked:
        mask = np.zeros((b, n), bool)
        mask[0, :n] = True
        mask[1, :300] = True
        mask_j = jnp.asarray(mask)
    else:
        mask_j = None
    got = np.asarray(FA.flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), mask_j))
    want = np.asarray(sdpa(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), mask_j))
    if masked:
        got = got * mask[:, None, :, None]
        want = want * mask[:, None, :, None]
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=1e-2)
    assert np.abs(got - want).mean() < 2e-3


@pytest.mark.parametrize("n", [768, 1280])
def test_flash_non_block_multiple_lengths(n):
    """Regression: n not a multiple of the default block_k=512 (e.g. serving
    bucket 768, UNetT pad 1280) must still attend ALL keys — the old fixed
    block loop silently dropped keys past the last full 512 chunk."""
    rng = np.random.default_rng(7)
    b, h, dh = 1, 2, 64
    q = jnp.asarray(rng.standard_normal((b, h, n, dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, n, dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, n, dh)).astype(np.float32))
    mask = jnp.asarray(np.arange(n)[None, :] < np.array([[n - 100]]))
    got = np.asarray(FA.flash_attention(q, k, v, mask))
    want = np.asarray(sdpa(q, k, v, mask))
    mm = np.asarray(mask)[:, None, :, None]
    np.testing.assert_allclose(got * mm, want * mm, atol=2e-2, rtol=1e-2)
    assert np.abs(got * mm - want * mm).mean() < 2e-3

    # trainable path: same blocks picker, grads must cover the tail keys
    def loss_f(k_):
        return (FA.flash_attention_trainable(q, k_, v, mask) * mm).sum()

    def loss_s(k_):
        return (sdpa(q, k_, v, mask) * mm).sum()

    gf = np.asarray(jax.grad(loss_f)(k))
    gs = np.asarray(jax.grad(loss_s)(k))
    # tail keys (beyond the last 512 chunk) must receive nonzero gradient
    assert np.abs(gs[:, :, 512:, :]).max() > 0
    assert np.abs(gf - gs).mean() < 5e-3


def test_pick_block():
    assert FA._pick_block(768, 512) == 256
    assert FA._pick_block(1280, 512) == 256
    assert FA._pick_block(1024, 512) == 512
    assert FA._pick_block(512, 512) == 512
    assert FA._pick_block(384, 512) == 384  # n itself (single chunk)
    assert FA._pick_block(384, 256) == 128
    assert FA._pick_block(192, 256) == 192


def test_flash_supported_gating():
    q = jnp.zeros((1, 2, 512, 64))
    assert not FA.flash_supported(q) or jax.default_backend() != "cpu"
    assert FA.flash_supported(jnp.zeros((1, 2, 511, 64))) is False if jax.default_backend() != "cpu" else True


def test_chunked_attention_matches_sdpa_and_grads():
    import jax
    from f5_tts_tpu.ops.attention import chunked_attention

    rng = np.random.default_rng(3)
    b, h, n, dh = 2, 2, 512, 32
    q = jnp.asarray(rng.standard_normal((b, h, n, dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, n, dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, n, dh)).astype(np.float32))
    mask = jnp.asarray(np.arange(n)[None, :] < np.array([[n], [300]]))
    got = np.asarray(chunked_attention(q, k, v, mask, chunk=128))
    want = np.asarray(sdpa(q, k, v, mask))
    mm = np.asarray(mask)[:, None, :, None]
    np.testing.assert_allclose(got * mm, want * mm, atol=2e-5)

    def loss_c(q_):
        return (chunked_attention(q_, k, v, mask, chunk=128) * mm).sum()

    def loss_s(q_):
        return (sdpa(q_, k, v, mask) * mm).sum()

    gc = np.asarray(jax.grad(loss_c)(q))
    gs = np.asarray(jax.grad(loss_s)(q))
    np.testing.assert_allclose(gc, gs, atol=1e-4)


def test_flash_trainable_grads_match_sdpa():
    import jax
    from f5_tts_tpu.ops.flash_attention import flash_attention_trainable

    rng = np.random.default_rng(5)
    b, h, n, dh = 1, 2, 256, 64
    q = jnp.asarray(rng.standard_normal((b, h, n, dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, n, dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, n, dh)).astype(np.float32))
    mask = jnp.asarray(np.arange(n)[None, :] < np.array([[180]]))
    mm = np.asarray(mask)[:, None, :, None]

    out_f = np.asarray(flash_attention_trainable(q, k, v, mask, block_q=128, block_k=128))
    out_s = np.asarray(sdpa(q, k, v, mask))
    np.testing.assert_allclose(out_f * mm, out_s * mm, atol=2e-2)

    def loss_f(q_, k_, v_):
        return (flash_attention_trainable(q_, k_, v_, mask, block_q=128, block_k=128) * mm).sum()

    def loss_s(q_, k_, v_):
        return (sdpa(q_, k_, v_, mask) * mm).sum()

    gf = jax.grad(loss_f, argnums=(0, 1, 2))(q, k, v)
    gs = jax.grad(loss_s, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gs):
        err = np.abs(np.asarray(a) - np.asarray(b_)).mean()
        assert err < 5e-3, err
