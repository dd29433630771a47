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


def test_f5tts_api_serves_from_artifacts(tmp_path):
    """F5TTS(artifacts=dir) loads an AotEngine and produces the same audio as
    the live-jit F5TTS; servers pass --artifacts through this path."""
    from f5_tts_tpu.infer.api import F5TTS
    from f5_tts_tpu.runtime.aot import main as build_main

    out = str(tmp_path / "art")
    build_main(["--out", out, "--model", "F5TTS_Tiny", "--cpu-build",
                "--platforms", "cpu", "--batches", "1", "--buckets", "256",
                "--ref-buckets", "256", "--nfe", "2"])
    live = F5TTS(model="F5TTS_Tiny", init_random=True, nfe_step=2)
    aot = F5TTS(model="F5TTS_Tiny", init_random=True,
                artifacts=out, artifacts_fallback=True)
    assert isinstance(aot.engine, AotEngine) and aot.engine.options.nfe_step == 2
    sr = live.target_sample_rate
    ref = (0.2 * np.sin(np.arange(sr) / 25.0)).astype(np.float32)
    kw = dict(ref_file=(ref, sr), ref_text="a tone reference.",
              gen_text="artifact serving check.", seed=11, nfe_step=2)
    wav_live, _, _ = live.infer(**kw)
    wav_aot, _, _ = aot.infer(**kw)
    np.testing.assert_allclose(wav_aot, wav_live, atol=1e-5)

    # a per-call sampler override must not silently serve the baked graph:
    # strict mode raises (with fallback=True it re-jits live instead).
    # NB: output-level NFE sensitivity can't be asserted here — init_random
    # keeps the reference zero-init AdaLN gates, so velocity == 0 and any
    # step count vocodes the same mel (see DEVELOPMENT.md zero-init gotcha)
    strict = F5TTS(model="F5TTS_Tiny", init_random=True, artifacts=out)
    with pytest.raises(KeyError, match="per-call options"):
        strict.infer(**{**kw, "nfe_step": 4})


def test_aot_options_come_from_meta(built):
    cfg, params, voc, eng, out, _ = built
    aot = AotEngine(out, params, cfg, vocoder_params=voc, buckets=(256, 512))
    assert aot.options == eng.options  # nfe etc. restored from engine_meta.json


def test_warm_bundle_loads_without_compile(tmp_path):
    """The deploy property, cross-process: build a --warm bundle, load it in a
    FRESH subprocess, and assert the first audio is produced with ZERO XLA
    backend compiles after engine construction (counted via the
    /jax/core/compile/backend_compile_duration monitoring event).  Covers
    both the packaged-executable deserialization AND the AotEngine.warmup
    crop-slice precompile — the full TRT 'engine file deserializes and
    serves' analog (reference runtime/triton_trtllm/run.sh:18-112).
    Construction-time compiles are excluded: this test uses init_random
    (dozens of tiny PRNG-init compiles); a real deployment loads checkpoint
    weights via numpy with no compiles either way."""
    import os
    import subprocess
    import sys
    import textwrap

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # a serialized executable is topology-bound: build/warm and serve must see
    # the same device count, so strip conftest's 8-device CPU forcing
    xla_flags = " ".join(f for f in os.environ.get("XLA_FLAGS", "").split()
                         if "xla_force_host_platform_device_count" not in f)
    # repo-only PYTHONPATH: an inherited axon sitecustomize would re-pin the
    # backend to the tunneled TPU and defeat JAX_PLATFORMS=cpu
    env = dict(os.environ, JAX_PLATFORMS="cpu", XLA_FLAGS=xla_flags,
               PYTHONPATH=repo)

    out = str(tmp_path / "art")
    r = subprocess.run(
        [sys.executable, "-m", "f5_tts_tpu.runtime.aot", "--out", out,
         "--model", "F5TTS_Tiny", "--cpu-build", "--platforms", "cpu",
         "--batches", "1", "--buckets", "256", "--ref-buckets", "256",
         "--nfe", "2", "--warm"],
        env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-4000:]
    assert "packaged 2 serialized executables" in r.stdout

    script = textwrap.dedent(f"""
        import jax
        from jax._src import monitoring

        compiles = []

        def on_dur(name, dur, **kw):
            if name == "/jax/core/compile/backend_compile_duration":
                compiles.append(name)

        monitoring.register_event_duration_secs_listener(on_dur)
        import numpy as np
        from f5_tts_tpu.infer.api import F5TTS

        tts = F5TTS(model="F5TTS_Tiny", init_random=True, artifacts={out!r})
        assert tts.engine.loaded_executables == 2, tts.engine.loaded_executables
        after_ctor = len(compiles)
        sr = tts.target_sample_rate
        ref = (0.2 * np.sin(np.arange(sr) / 25.0)).astype(np.float32)
        wav, _, _ = tts.infer(ref_file=(ref, sr), ref_text="a tone reference.",
                              gen_text="warm bundle check.", seed=11, nfe_step=2,
                              show_info=lambda *a, **k: None)
        assert wav is not None and np.isfinite(wav).all()
        n_serve = len(compiles) - after_ctor
        assert n_serve == 0, f"{{n_serve}} XLA compiles on the serve path"
        print("OK zero-compile serve")
    """)
    r = subprocess.run([sys.executable, "-c", script], env=env,
                       capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-4000:]
    assert "OK zero-compile serve" in r.stdout


def test_warm_artifacts_load_without_compile(built):
    """warm_artifacts packages serialized PJRT executables with the bundle;
    AotEngine deserializes them directly (loaded_executables counts them) and
    serves outputs matching the live engine — no XLA compile at load, the TRT
    engine-file 'deserialize and serve in seconds' property (reference
    runtime/triton_trtllm/run.sh:18-112).  Cross-process portability is what
    packaged persistent-cache entries LACKED (the cache key hashes
    process-specific fingerprints; a warmed bundle still paid a 246 s first
    call on-chip) — scripts/aot_coldstart_ab.py measures the subprocess loop
    on real hardware."""
    from f5_tts_tpu.runtime.aot import warm_artifacts

    cfg, params, voc, eng, out, names = built
    n = warm_artifacts(out)
    assert n == len(names)  # one executable per artifact

    aot = AotEngine(out, params, cfg, vocoder_params=voc, buckets=(256, 512))
    assert aot.loaded_executables == n

    refs, texts, durs = _mel_inputs(cfg)
    want = eng.generate_batch(refs, texts, durs, seeds=[3, 4])
    got = aot.generate_batch(refs, texts, durs, seeds=[3, 4])
    np.testing.assert_allclose(got[0], want[0], atol=1e-5)
    for a, b_ in zip(got[1], want[1]):
        np.testing.assert_allclose(a, b_, atol=1e-5)
