"""Fused ConvPositionEmbedding kernel (ops/fused_convpos.py) vs the plain
XLA grouped-conv composition (models/layers.py conv_pos_embed_xla), interpret
mode on CPU.  Reference semantics: modules.py:175-201 (conv->mish->conv->mish
with re-masking at every stage)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from f5_tts_tpu.models import layers as L
from f5_tts_tpu.ops import fused_convpos as FC


@pytest.fixture(autouse=True)
def _interpret():
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


def make_case(b=2, n=64, d=128, groups=2, seed=0):
    rng = np.random.default_rng(seed)
    p = L.conv_pos_embed_init(jax.random.PRNGKey(1), d, kernel_size=31, groups=groups)
    x = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)
    lens = jnp.asarray([n, n - 20], jnp.int32)
    mask = jnp.arange(n)[None, :] < lens[:, None]
    return p, x, lens, mask


@pytest.mark.parametrize("masked", [True, False])
def test_fused_convpos_matches_xla(masked):
    p, x, lens, mask = make_case()
    if not masked:
        mask = None
    want = np.asarray(L.conv_pos_embed_xla(p, x, mask=mask, groups=2))
    got = np.asarray(FC.conv_pos_fused(p, x, mask=mask, groups=2))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_fused_convpos_grads_match_xla():
    p, x, lens, mask = make_case(seed=3)

    def loss_fused(p_, x_):
        return jnp.sum(jnp.square(FC.conv_pos_fused(p_, x_, mask=mask, groups=2)))

    def loss_xla(p_, x_):
        return jnp.sum(jnp.square(L.conv_pos_embed_xla(p_, x_, mask=mask, groups=2)))

    gp_f, gx_f = jax.grad(loss_fused, argnums=(0, 1))(p, x)
    gp_x, gx_x = jax.grad(loss_xla, argnums=(0, 1))(p, x)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_x), atol=1e-3, rtol=1e-3)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-3, rtol=1e-3),
        gp_f, gp_x)


def test_supported_gate():
    # CPU backend -> always False (kernel never runs outside interpret tests)
    x = jnp.zeros((1, 32, 1024))
    assert FC.conv_pos_supported(x, 16) is False or jax.default_backend() != "cpu"


def test_fused_convpos_chunked_rows():
    """n > 1024 activates the in-kernel row chunking (vmem-stack bound at the
    2048+ buckets); 1536 also exercises the non-1024 divisor pick (CH=768)."""
    p, x, lens, mask = make_case(b=1, n=1536, d=128, groups=2, seed=5)
    lens = jnp.asarray([1400], jnp.int32)
    mask = jnp.arange(1536)[None, :] < lens[:, None]
    want = np.asarray(L.conv_pos_embed_xla(p, x, mask=mask, groups=2))
    got = np.asarray(FC.conv_pos_fused(p, x, mask=mask, groups=2))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)
