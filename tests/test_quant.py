"""Int8 quantized matmul kernel tests (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from f5_tts_tpu.ops import quant as Q


@pytest.fixture(autouse=True)
def _interpret():
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        yield


def test_quantize_roundtrip_error_bounded():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((8, 128)).astype(np.float32)
    q, s = Q.quantize_rows(jnp.asarray(x))
    back = np.asarray(q).astype(np.float32) * np.asarray(s)
    rel = np.abs(back - x).max() / np.abs(x).max()
    assert rel < 1e-2  # 8-bit symmetric quantization step


def test_int8_matmul_matches_fp32():
    rng = np.random.default_rng(1)
    m, k, n = 256, 512, 256
    x = rng.standard_normal((m, k)).astype(np.float32)
    w = (rng.standard_normal((k, n)) * 0.05).astype(np.float32)
    got = np.asarray(Q.quantized_linear(jnp.asarray(x), jnp.asarray(w)))
    want = x @ w
    denom = np.abs(want).mean()
    err = np.abs(got - want).mean() / denom
    assert err < 2e-2, err  # W8A8 quantization noise envelope
