"""AOT engine artifacts (runtime/aot.py): build once with jax.export, reload
without tracing model code, bit-match the live engine.

TRT-LLM engine-build analog (reference runtime/triton_trtllm/run.sh stages
convert+trtllm-build / vocoder .plan): here the artifact is serialized
StableHLO with weights as call arguments, buildable cross-platform.
"""

import numpy as np
import jax
import pytest

from f5_tts_tpu.infer.engine import InferenceEngine, EngineOptions
from f5_tts_tpu.models import vocos as V
from f5_tts_tpu.runtime.aot import AotEngine, default_specs, export_engine
from tests.test_pipeline import tiny_model


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    cfg, params, _, _ = tiny_model()
    voc = V.init(jax.random.PRNGKey(1), V.VocosConfig())
    eng = InferenceEngine(params, cfg, vocoder_params=voc,
                          options=EngineOptions(nfe_step=2),
                          buckets=(256, 512))
    out = str(tmp_path_factory.mktemp("artifacts"))
    specs = [("mel", 2, 256, None), ("wav", 1, 256, 256)]
    names = export_engine(eng, out, specs, platforms=("cpu",))
    return cfg, params, voc, eng, out, names


def _mel_inputs(cfg, b=2, seed=0):
    rng = np.random.default_rng(seed)
    refs = [rng.standard_normal((40 + 5 * i, cfg.mel.n_mel_channels)).astype(np.float32)
            for i in range(b)]
    texts = [rng.integers(0, 200, size=24 + i).astype(np.int32) for i in range(b)]
    durs = [200 + 10 * i for i in range(b)]
    return refs, texts, durs


def test_aot_matches_live_engine_mel_path(built):
    cfg, params, voc, eng, out, names = built
    assert "mel_b2_n256.jaxexp" in names
    aot = AotEngine(out, params, cfg, vocoder_params=voc, buckets=(256, 512))
    refs, texts, durs = _mel_inputs(cfg)
    want = eng.generate_batch(refs, texts, durs, seeds=[3, 4])
    got = aot.generate_batch(refs, texts, durs, seeds=[3, 4])
    np.testing.assert_allclose(got[0], want[0], atol=1e-5)  # mel
    for a, b_ in zip(got[1], want[1]):
        np.testing.assert_allclose(a, b_, atol=1e-5)  # wav
    assert got[2] == want[2]


def test_aot_matches_live_engine_wav_path(built):
    cfg, params, voc, eng, out, _ = built
    aot = AotEngine(out, params, cfg, vocoder_params=voc, buckets=(256, 512))
    rng = np.random.default_rng(7)
    ref_wav = (0.2 * np.sin(np.arange(24000) / 30.0)).astype(np.float32)
    text = rng.integers(0, 200, size=30).astype(np.int32)
    want = eng.generate_batch_from_wav(ref_wav, [text], [220], seeds=[5])
    got = aot.generate_batch_from_wav(ref_wav, [text], [220], seeds=[5])
    np.testing.assert_allclose(got[0], want[0], atol=1e-5)
    np.testing.assert_allclose(got[1][0], want[1][0], atol=1e-5)


def test_aot_unexported_shape_raises_or_falls_back(built):
    cfg, params, voc, _, out, _ = built
    aot = AotEngine(out, params, cfg, vocoder_params=voc, buckets=(256, 512))
    refs, texts, durs = _mel_inputs(cfg, b=1)
    durs = [400]  # bucket 512: not exported
    with pytest.raises(KeyError, match="no AOT artifact"):
        aot.generate_batch(refs, texts, durs, seeds=[1])
    aot_fb = AotEngine(out, params, cfg, vocoder_params=voc, fallback=True,
                       buckets=(256, 512))
    mels, wavs, gf = aot_fb.generate_batch(refs, texts, durs, seeds=[1])
    assert wavs and np.isfinite(wavs[0]).all()


def test_aot_meta_guards_model_identity(built):
    import dataclasses

    cfg, params, voc, _, out, _ = built
    wrong = dataclasses.replace(cfg, name="SomethingElse")
    with pytest.raises(ValueError, match="artifacts built for"):
        AotEngine(out, params, wrong, vocoder_params=voc)


def test_aot_options_come_from_meta(built):
    cfg, params, voc, eng, out, _ = built
    aot = AotEngine(out, params, cfg, vocoder_params=voc, buckets=(256, 512))
    assert aot.options == eng.options  # nfe etc. restored from engine_meta.json
