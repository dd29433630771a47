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


def test_int8_matmul_non_divisible_shapes():
    """Regression: the grid/K loop must not silently drop remainder tiles."""
    rng = np.random.default_rng(5)
    m, k, n = 96, 192, 80  # none divisible by the 256/512 defaults
    x = rng.standard_normal((m, k)).astype(np.float32)
    w = rng.standard_normal((k, n)).astype(np.float32)
    got = np.asarray(Q.quantized_linear(jnp.asarray(x), jnp.asarray(w)))
    want = x @ w
    rel = np.abs(got - want).mean() / np.abs(want).mean()
    assert rel < 0.02, rel


def test_engine_quantize_flag_quality_gate():
    """EngineOptions.quantize: W8A8 DiT blocks produce audio close to the
    dense engine (the mel-MAE quality gate scripts/quant_ab.py applies)."""
    import jax

    from f5_tts_tpu.infer.engine import EngineOptions, InferenceEngine
    from f5_tts_tpu.models import vocos as V
    from tests.test_dit import make_params
    from tests.test_pipeline import tiny_model

    cfg, _, _, _ = tiny_model()
    # zero-init AdaLN gates/proj_out would make this A/B vacuous (the blocks'
    # contribution never reaches the output) — randomize them
    params = make_params(cfg.arch, seed=0)
    voc = V.init(jax.random.PRNGKey(1), V.VocosConfig())
    rng = np.random.default_rng(2)
    ref = rng.standard_normal((40, cfg.mel.n_mel_channels)).astype(np.float32)
    text = rng.integers(0, 200, size=24).astype(np.int32)

    outs = {}
    for quant in (False, True):
        eng = InferenceEngine(params, cfg, vocoder_params=voc,
                              options=EngineOptions(nfe_step=2, quantize=quant))
        mels, wavs, _ = eng.generate_batch([ref], [text], [180], seeds=[3])
        outs[quant] = (mels[0], wavs[0])
    mel_d, mel_q = outs[False][0], outs[True][0]
    assert np.isfinite(mel_q).all()
    mae = np.abs(mel_d - mel_q).mean()
    scale = np.abs(mel_d).mean()
    assert mae < 0.1 * scale, (mae, scale)
    # ...and the int8 path must actually have executed (a zero MAE would mean
    # the quantized kernels never reached the output)
    assert mae > 0, "quantized and dense outputs identical — int8 path inert"
    assert len(outs[True][1]) == len(outs[False][1])
