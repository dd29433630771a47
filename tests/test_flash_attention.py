"""Flash attention kernel vs SDPA reference (interpret mode on CPU)."""

import functools

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


def test_two_segment_flash_matches_sdpa():
    """MMDiT joint-attention mask: audio prefix + text prefix at offset seg."""
    rng = np.random.default_rng(9)
    b, h, dh = 2, 2, 64
    n_audio, n_text = 256, 128
    n = n_audio + n_text
    q = jnp.asarray(rng.standard_normal((b, h, n, dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, n, dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, n, dh)).astype(np.float32))
    lens_a = jnp.asarray([256, 180])
    lens_t = jnp.asarray([128, 40])
    pos = np.arange(n)
    mask = (pos[None, :] < np.asarray(lens_a)[:, None]) | (
        (pos[None, :] >= n_audio)
        & (pos[None, :] < n_audio + np.asarray(lens_t)[:, None])
    )
    got = np.asarray(FA.flash_attention_two_segment(q, k, v, lens_a, lens_t, seg=n_audio))
    want = np.asarray(sdpa(q, k, v, jnp.asarray(mask)))
    mm = mask[:, None, :, None]
    np.testing.assert_allclose(got * mm, want * mm, atol=2e-2, rtol=1e-2)
    assert np.abs(got * mm - want * mm).mean() < 2e-3


def test_mmdit_flash_backend_matches_sdpa():
    import jax as _jax

    from f5_tts_tpu.models import mmdit as M
    from tests.test_mmdit import SMALL as MM_SMALL

    cfg = MM_SMALL
    params = M.init(_jax.random.PRNGKey(0), cfg)
    # zero-init AdaLN gates would gate attention OUT of the output and make
    # this parity check vacuous — randomize them
    from f5_tts_tpu.models import layers as L

    ks = _jax.random.split(_jax.random.PRNGKey(7), cfg.depth - 1)
    stacked = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[{"x": L.adaln_init(k, cfg.dim, zero=False),
           "c": L.adaln_init(k, cfg.dim, zero=False)} for k in ks])
    params["blocks"]["attn_norm_x"] = stacked["x"]
    params["blocks"]["attn_norm_c"] = stacked["c"]
    rng = np.random.default_rng(4)
    b, n, nt = 2, 128, 64  # within SMALL max_pos; joint 192
    x = jnp.asarray(rng.standard_normal((b, n, cfg.mel_dim)).astype(np.float32))
    cond = jnp.asarray(rng.standard_normal((b, n, cfg.mel_dim)).astype(np.float32))
    text = np.full((b, nt), -1, np.int32)
    text[0, :40] = rng.integers(0, cfg.text_num_embeds, 40)
    text[1, :22] = rng.integers(0, cfg.text_num_embeds, 22)
    time = jnp.asarray([0.3, 0.8], jnp.float32)
    mask = jnp.asarray(np.arange(n)[None, :] < np.asarray([[n], [90]]))

    a = np.asarray(M.forward_with_text(params, cfg, x, cond, jnp.asarray(text), time,
                                       mask=mask, backend="sdpa", attn_mask_enabled=True))
    f = np.asarray(M.forward_with_text(params, cfg, x, cond, jnp.asarray(text), time,
                                       mask=mask, backend="flash", attn_mask_enabled=True))
    mm = np.asarray(mask)[:, :, None]
    np.testing.assert_allclose(a * mm, f * mm, atol=2e-2, rtol=1e-2)
    assert np.abs((a - f) * mm).mean() < 2e-3


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


def test_flash_with_stats_value_and_grads():
    """flash_attention_with_stats (the differentiable ring block primitive):
    (out, logsumexp) values AND gradients — including the logsumexp cotangent
    path, which the custom VJP folds into the jacobian-correction term
    (D' = D - dL) — must match a jnp oracle with the kernel's masking."""
    from f5_tts_tpu.ops.flash_attention import flash_attention_with_stats

    rng = np.random.default_rng(13)
    b, h, n, dh = 2, 2, 256, 64
    q = jnp.asarray(rng.standard_normal((b, h, n, dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, n, dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, n, dh)).astype(np.float32))
    lens = jnp.asarray([256, 140], jnp.int32)
    valid_q = (np.arange(n)[None, :] < np.asarray(lens)[:, None])  # [b, n]
    w_out = jnp.asarray(rng.standard_normal((b, h, n, dh)).astype(np.float32)
                        * valid_q[:, None, :, None])
    w_lse = jnp.asarray(rng.standard_normal((b * h, 1, n)).astype(np.float32)
                        * np.repeat(valid_q, h, axis=0).reshape(b * h, 1, n))

    def oracle(q_, k_, v_):
        s = jnp.einsum("bhqd,bhkd->bhqk", q_, k_).astype(jnp.float32) * dh**-0.5
        col = jnp.arange(n)
        s = jnp.where((col[None, :] < lens[:, None])[:, None, None, :], s, -1e30)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        out = jnp.einsum("bhqk,bhkd->bhqd", p / l, v_)
        lse = (m + jnp.log(l))[..., 0].reshape(b * h, 1, n)
        return out, lse

    def flash(q_, k_, v_):
        return flash_attention_with_stats(q_, k_, v_, lens, block_q=128, block_k=128)

    def loss(fn, q_, k_, v_):
        out, lse = fn(q_, k_, v_)
        return jnp.sum(out * w_out) + jnp.sum(lse * w_lse)

    o_f, l_f = flash(q, k, v)
    o_s, l_s = oracle(q, k, v)
    mm = valid_q[:, None, :, None]
    np.testing.assert_allclose(np.asarray(o_f) * mm, np.asarray(o_s) * mm, atol=2e-2)
    lm = np.repeat(valid_q, h, axis=0).reshape(b * h, 1, n)
    np.testing.assert_allclose(np.asarray(l_f) * lm, np.asarray(l_s) * lm, atol=5e-3)

    gf = jax.grad(functools.partial(loss, flash), argnums=(0, 1, 2))(q, k, v)
    gs = jax.grad(functools.partial(loss, oracle), argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gs):
        err = np.abs(np.asarray(a) - np.asarray(b_)).mean()
        assert err < 5e-3, err
        assert np.isfinite(np.asarray(a)).all()


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


def test_two_segment_trainable_grads_match_sdpa():
    """MMDiT training path (VERDICT r2 weak #6): the differentiable
    two-segment kernel's fwd AND grads must match SDPA with the equivalent
    [audio-prefix | text-prefix-at-seg] boolean mask."""
    import jax
    from f5_tts_tpu.ops.flash_attention import flash_attention_two_segment_trainable

    rng = np.random.default_rng(13)
    b, h, dh = 2, 2, 64
    n_audio, n_text = 256, 128
    n = n_audio + n_text
    q = jnp.asarray(rng.standard_normal((b, h, n, dh)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, h, n, dh)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, h, n, dh)).astype(np.float32))
    lens_a = jnp.asarray([256, 180])
    lens_t = jnp.asarray([128, 40])
    pos = np.arange(n)
    mask = (pos[None, :] < np.asarray(lens_a)[:, None]) | (
        (pos[None, :] >= n_audio)
        & (pos[None, :] < n_audio + np.asarray(lens_t)[:, None])
    )
    mm = jnp.asarray(mask)[:, None, :, None]

    out_f = np.asarray(flash_attention_two_segment_trainable(
        q, k, v, lens_a, lens_t, seg=n_audio, block_q=128, block_k=128))
    out_s = np.asarray(sdpa(q, k, v, jnp.asarray(mask)))
    np.testing.assert_allclose(out_f * np.asarray(mm), out_s * np.asarray(mm), atol=2e-2)

    def loss_f(q_, k_, v_):
        o = flash_attention_two_segment_trainable(
            q_, k_, v_, lens_a, lens_t, seg=n_audio, block_q=128, block_k=128)
        return ((o * mm) ** 2).sum()

    def loss_s(q_, k_, v_):
        return ((sdpa(q_, k_, v_, jnp.asarray(mask)) * mm) ** 2).sum()

    gf = jax.grad(loss_f, argnums=(0, 1, 2))(q, k, v)
    gs = jax.grad(loss_s, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gs):
        err = np.abs(np.asarray(a) - np.asarray(b_)).mean()
        assert err < 5e-3, err


def test_mmdit_train_backend_grads_match_sdpa():
    """End-to-end: MMDiT forward under backend=flash_train must match sdpa in
    value and parameter gradients (joint attention on the trainable
    two-segment kernel)."""
    import jax as _jax

    from f5_tts_tpu.models import layers as L
    from f5_tts_tpu.models import mmdit as M
    from tests.test_mmdit import SMALL as MM_SMALL

    cfg = MM_SMALL
    params = M.init(_jax.random.PRNGKey(2), cfg)
    ks = _jax.random.split(_jax.random.PRNGKey(8), cfg.depth - 1)
    stacked = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[{"x": L.adaln_init(k, cfg.dim, zero=False),
           "c": L.adaln_init(k, cfg.dim, zero=False)} for k in ks])
    params["blocks"]["attn_norm_x"] = stacked["x"]
    params["blocks"]["attn_norm_c"] = stacked["c"]
    rng = np.random.default_rng(6)
    b, n, nt = 2, 128, 64
    x = jnp.asarray(rng.standard_normal((b, n, cfg.mel_dim)).astype(np.float32))
    cond = jnp.asarray(rng.standard_normal((b, n, cfg.mel_dim)).astype(np.float32))
    text = np.full((b, nt), -1, np.int32)
    text[0, :40] = rng.integers(0, cfg.text_num_embeds, 40)
    text[1, :22] = rng.integers(0, cfg.text_num_embeds, 22)
    time = jnp.asarray([0.3, 0.8], jnp.float32)
    mask = jnp.asarray(np.arange(n)[None, :] < np.asarray([[n], [90]]))

    def loss(p, backend):
        o = M.forward_with_text(p, cfg, x, cond, jnp.asarray(text), time,
                                mask=mask, backend=backend, attn_mask_enabled=True)
        return ((o * mask[:, :, None]) ** 2).mean()

    vs, gs = _jax.value_and_grad(lambda p: loss(p, "sdpa"))(params)
    vf, gf = _jax.value_and_grad(lambda p: loss(p, "flash_train"))(params)
    np.testing.assert_allclose(float(vf), float(vs), rtol=1e-3)
    flat_s = jax.tree.leaves(gs)
    flat_f = jax.tree.leaves(gf)
    for a, b_ in zip(flat_f, flat_s):
        denom = np.abs(np.asarray(b_)).mean() + 1e-6
        err = np.abs(np.asarray(a) - np.asarray(b_)).mean() / denom
        assert err < 5e-2, err


def test_pick_block_rejects_pathological_lengths():
    """Forced backends bypass flash_supported's shape gate; _pick_block must
    fail loudly for lengths that factor to sub-sublane blocks (n=1324 ->
    block 4) instead of handing Mosaic an illegal/pathological shape."""
    from f5_tts_tpu.ops.flash_attention import _pick_block

    assert _pick_block(1024, 512) == 512
    assert _pick_block(768, 512) == 256
    with pytest.raises(ValueError, match="flash block"):
        _pick_block(1324, 512)  # -> block 4
    with pytest.raises(ValueError, match="flash block"):
        _pick_block(1325, 512)  # odd -> block 1


def test_stats_requires_equal_qk_lengths():
    """flash_attention_with_stats tiles k/v with q's length (ring shards are
    equal-sized); unequal lengths must raise instead of mis-reshaping."""
    from f5_tts_tpu.ops.flash_attention import flash_attention_with_stats

    q = jnp.zeros((1, 2, 256, 64), jnp.float32)
    k = v = jnp.zeros((1, 2, 512, 64), jnp.float32)
    with pytest.raises(ValueError, match="len\\(q\\)==len\\(k\\)"):
        flash_attention_with_stats(q, k, v, jnp.array([256], jnp.int32))

