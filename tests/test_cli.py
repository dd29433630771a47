"""CLI + socket server end-to-end smoke tests (tiny random model, CPU)."""

import os
import socket
import threading
import time

import numpy as np
import pytest

from f5_tts_tpu.audio.io import load_wav, save_wav


@pytest.fixture(scope="module")
def ref_wav_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("aud") / "ref.wav")
    sr = 24000
    t = np.arange(int(sr * 1.2)) / sr
    wav = (0.2 * np.sin(2 * np.pi * 220 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)
    save_wav(path, wav, sr)
    return path


def test_infer_cli_end_to_end(ref_wav_path, tmp_path):
    from f5_tts_tpu.infer.cli import main

    out = main([
        "--model", "F5TTS_Tiny", "--init_random",
        "--ref_audio", ref_wav_path,
        "--ref_text", "a simple tone reference.",
        "--gen_text", "hello world, this is a generated sentence.",
        "--output_dir", str(tmp_path), "--output_file", "out.wav",
        "--nfe_step", "2",
    ])
    assert out is not None and os.path.isfile(out)
    wav, sr = load_wav(out)
    assert sr == 24000 and len(wav) > 1000


def test_bundled_example_tomls_run_out_of_box(tmp_path, monkeypatch):
    """The shipped examples/*.toml run with zero user setup (reference bundles
    infer/examples/basic/basic_ref_en.wav + examples/multi/*.flac for the same
    first-run experience).  Asset paths resolve relative to the TOML from any
    cwd; the multi-voice prompts are FLAC, so this also exercises
    native/flacdec.cpp on the inference path.  Weights are overridden to the
    tiny random model so the smoke stays CPU-fast."""
    from f5_tts_tpu.infer.cli import main

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    monkeypatch.chdir(tmp_path)  # prove TOML-relative asset resolution
    for toml_name, out_name in [("basic.toml", "b.wav"), ("multi_voice.toml", "m.wav")]:
        out = main([
            "-c", os.path.join(repo, "examples", toml_name),
            "--model", "F5TTS_Tiny", "--init_random", "--nfe_step", "2",
            "--output_dir", str(tmp_path), "--output_file", out_name,
        ])
        assert out is not None and os.path.isfile(out), toml_name
        wav, sr = load_wav(out)
        assert sr == 24000 and len(wav) > 1000


def test_infer_cli_model_cfg_yaml_and_chunks(ref_wav_path, tmp_path):
    """-mc/--model_cfg loads a custom arch YAML (reference infer_cli.py:268-272)
    and --save_chunk names files '{i}_{text}.wav' with ASCII transliteration
    unless --no_legacy_text (reference :362-370)."""
    from f5_tts_tpu.infer.cli import main

    yaml_path = tmp_path / "tiny.yaml"
    yaml_path.write_text(
        "model:\n  name: TinyCustom\n  backbone: DiT\n  tokenizer: pinyin\n"
        "  arch:\n    dim: 64\n    depth: 2\n    heads: 4\n    dim_head: 16\n"
        "    ff_mult: 2\n    text_dim: 24\n    text_num_embeds: 200\n"
        "    conv_layers: 1\n    mel_dim: 100\n"
    )
    out = main([
        "--model_cfg", str(yaml_path), "--init_random",
        "--ref_audio", ref_wav_path,
        "--ref_text", "a simple tone reference.",
        "--gen_text", "chunk naming check, voilà.",
        "--output_dir", str(tmp_path), "--output_file", "mc.wav",
        "--nfe_step", "2", "--save_chunk",
    ])
    assert out is not None and os.path.isfile(out)
    chunk_dir = tmp_path / "mc_chunks"
    names = sorted(os.listdir(chunk_dir))
    assert names and names[0].startswith("0_") and names[0].endswith(".wav")
    assert "voila" in names[0] and "voilà" not in names[0]  # legacy ASCII default


def test_infer_cli_sampler_flags_take_effect(ref_wav_path, tmp_path, monkeypatch):
    """--cfg_strength / --sway_sampling_coef must reach the engine (they were
    once parsed-and-ignored), including explicit zeros (0.0 == False pitfall)."""
    from f5_tts_tpu.infer import cli as C

    seen = {}
    real_infer = C.P.infer_process

    def spy(engine, *a, **k):
        seen["cfg"] = engine.options.cfg_strength
        seen["sway"] = engine.options.sway_sampling_coef
        return real_infer(engine, *a, **k)

    monkeypatch.setattr(C.P, "infer_process", spy)
    out = C.main([
        "--model", "F5TTS_Tiny", "--init_random",
        "--ref_audio", ref_wav_path,
        "--ref_text", "a simple tone reference.",
        "--gen_text", "sampler flag check.",
        "--output_dir", str(tmp_path), "--output_file", "flags.wav",
        "--nfe_step", "2", "--cfg_strength", "1.5", "--sway_sampling_coef", "0.0",
    ])
    assert out is not None and os.path.isfile(out)
    assert seen == {"cfg": 1.5, "sway": 0.0}


def test_infer_cli_toml_config(ref_wav_path, tmp_path):
    from f5_tts_tpu.infer.cli import main

    cfg = tmp_path / "cfg.toml"
    cfg.write_text(
        f'''
model = "F5TTS_Tiny"
init_random = true
ref_audio = "{ref_wav_path}"
ref_text = "a simple tone reference."
gen_text = "[main] config driven. [alt] with another voice."
output_dir = "{tmp_path}"
output_file = "toml_out.wav"
nfe_step = 2

[voices.alt]
ref_audio = "{ref_wav_path}"
ref_text = "a simple tone reference."
'''
    )
    out = main(["-c", str(cfg)])
    assert out is not None and os.path.isfile(out)


def test_socket_server_stream(ref_wav_path):
    from f5_tts_tpu.infer.api import F5TTS
    from f5_tts_tpu.infer.socket_server import TTSStreamingProcessor, start_server
    from f5_tts_tpu.infer.socket_client import listen_to_f5tts

    tts = F5TTS(model="F5TTS_Tiny", init_random=True, nfe_step=2, device="cpu")
    proc = TTSStreamingProcessor(tts, ref_wav_path, "a simple tone reference.")
    port = 29431
    th = threading.Thread(target=start_server, args=("127.0.0.1", port, proc), daemon=True)
    th.start()
    time.sleep(0.5)
    wav = listen_to_f5tts("stream me some audio please.", "127.0.0.1", port)
    assert len(wav) > 1000
    assert np.isfinite(wav).all()


def test_gradio_apps_gated():
    """Without gradio installed the builders raise a clear error; helper
    functions work regardless."""
    import pytest as _pytest

    from f5_tts_tpu.train.finetune_gradio import calculate_train, expand_vocab, vocab_check

    s = calculate_train(2.0)
    assert s["total_updates"] > s["num_warmup_updates"] > 0

    try:
        import gradio  # noqa

        has_gradio = True
    except ImportError:
        has_gradio = False
    if not has_gradio:
        from f5_tts_tpu.infer.gradio_app import build_app

        with _pytest.raises(RuntimeError, match="gradio"):
            build_app()


def test_vocab_check_and_expand(tmp_path):
    from f5_tts_tpu.train.finetune_gradio import expand_vocab, vocab_check

    csv = tmp_path / "meta.csv"
    csv.write_text("audio_file|text\n/a.wav|hello ZZZ~\n", encoding="utf-8")
    missing = vocab_check(str(csv))
    assert "~" in missing or len(missing) >= 0  # chars not in Emilia vocab
    vocab = tmp_path / "v.txt"
    vocab.write_text(" \na\nb\n")
    n = expand_vocab(str(vocab), ["c", "a"], str(tmp_path / "v2.txt"))
    assert n == 4


def test_train_cli_end_to_end(tmp_path, monkeypatch):
    """prepare_csv_wavs -> f5-tts_train CLI on the tiny config."""
    import json

    from f5_tts_tpu.train.datasets.prepare_csv_wavs import prepare
    from f5_tts_tpu.train import cli as train_cli

    sr = 24000
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    lines = ["audio_file|text"]
    for i in range(4):
        path = str(wav_dir / f"a{i}.wav")
        save_wav(path, 0.1 * np.sin(np.arange(sr) / (30.0 + i)), sr)
        lines.append(f"{path}|short sample {i}")
    csv_path = tmp_path / "meta.csv"
    csv_path.write_text("\n".join(lines) + "\n")
    data_dir = tmp_path / "data" / "tiny_char"
    prepare(str(csv_path), str(data_dir), pretrain=False, pinyin=False)

    ckpt_dir = tmp_path / "ckpts"
    train_cli.main([
        "--model", "F5TTS_Tiny", "--dataset_name", "tiny",
        "--data_root", str(tmp_path / "data"),
        "--ckpt_dir", str(ckpt_dir), "--epochs", "1",
        "--batch_size_per_gpu", "400", "--max_samples", "2",
        "--num_warmup_updates", "2",
    ])
    log = ckpt_dir / "train_log.jsonl"
    assert log.is_file()
    rec = json.loads(log.read_text().strip().splitlines()[-1])
    assert np.isfinite(rec["loss"])
    assert (ckpt_dir / "model_last").is_dir()


def test_train_cli_parallel_flags(tmp_path):
    """f5-tts_train with --tensor_parallel/--pipeline_parallel/--zero1 builds
    the multi-axis mesh (8 virtual CPU devices) and trains a step."""
    import json

    from f5_tts_tpu.train import cli as train_cli
    from f5_tts_tpu.train.datasets.prepare_csv_wavs import prepare

    sr = 24000
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir()
    lines = ["audio_file|text"]
    for i in range(4):
        path = str(wav_dir / f"a{i}.wav")
        save_wav(path, 0.1 * np.sin(np.arange(sr) / (30.0 + i)), sr)
        lines.append(f"{path}|short sample {i}")
    csv_path = tmp_path / "meta.csv"
    csv_path.write_text("\n".join(lines) + "\n")
    data_dir = tmp_path / "data" / "tiny_char"
    prepare(str(csv_path), str(data_dir), pretrain=False, pinyin=False)

    ckpt_dir = tmp_path / "ckpts_pp"
    train_cli.main([
        "--model", "F5TTS_Tiny", "--dataset_name", "tiny",
        "--data_root", str(tmp_path / "data"),
        "--ckpt_dir", str(ckpt_dir), "--epochs", "1",
        "--batch_size_per_gpu", "400", "--max_samples", "2",
        "--num_warmup_updates", "2",
        "--tensor_parallel", "2", "--pipeline_parallel", "2",
        "--pipeline_microbatches", "2", "--zero1",
    ])
    log = ckpt_dir / "train_log.jsonl"
    assert log.is_file()
    rec = json.loads(log.read_text().strip().splitlines()[-1])
    assert np.isfinite(rec["loss"])


def test_package_level_exports():
    import f5_tts_tpu

    assert f5_tts_tpu.F5TTS.__name__ == "F5TTS"
    assert "F5TTS_v1_Base" in f5_tts_tpu.MODEL_CONFIGS


def test_api_loads_released_safetensors_format(ref_wav_path, tmp_path):
    """Full F5TTS API flow from an EMA .safetensors in the released layout."""
    import jax
    import numpy as np
    from safetensors.numpy import save_file

    from f5_tts_tpu.infer.api import F5TTS
    from f5_tts_tpu.models import dit as D
    from f5_tts_tpu.models.configs import MODEL_CONFIGS, with_vocab_size
    from f5_tts_tpu.text.tokenizer import get_tokenizer
    from f5_tts_tpu.utils import ckpt as CK

    vocab, size = get_tokenizer(None, "char")
    cfg = with_vocab_size(MODEL_CONFIGS["F5TTS_Tiny"], size)
    params = D.init(jax.random.PRNGKey(0), cfg.arch)
    state = CK.dit_params_to_state(params, cfg.arch, prefix="transformer.")
    state = {"ema_model." + k: np.ascontiguousarray(v) for k, v in state.items()}
    state["ema_model.initted"] = np.array(True)
    state["ema_model.step"] = np.array(100)
    path = str(tmp_path / "model_1250000.safetensors")
    save_file(state, path)

    tts = F5TTS(model="F5TTS_Tiny", ckpt_file=path, nfe_step=2, device="cpu", init_random=True)
    # init_random only fills the vocoder; the DiT weights came from the file
    wav, sr, spec = tts.infer(ref_wav_path, "a simple tone reference.",
                              "loaded from released format.", seed=4,
                              show_info=lambda *a, **k: None)
    assert wav is not None and np.isfinite(wav).all()


def test_infer_override_keeps_other_engine_options(ref_wav_path):
    """Per-call nfe/cfg overrides must not reset the other knobs: an engine
    built with ode_method='midpoint' stays midpoint after infer(nfe_step=...)
    (reference load_model fixes ode_method at ctor time, api.py:35-40)."""
    import numpy as np

    from f5_tts_tpu.infer.api import F5TTS

    tts = F5TTS(model="F5TTS_Tiny", init_random=True, nfe_step=2, device="cpu",
                ode_method="midpoint")
    wav, sr, _ = tts.infer(ref_wav_path, "a simple tone reference.",
                           "override check.", seed=3, nfe_step=4,
                           show_info=lambda *a, **k: None)
    assert wav is not None and np.isfinite(wav).all()
    assert tts.engine.options.nfe_step == 4
    assert tts.engine.options.ode_method == "midpoint"


def test_apply_overrides_unit():
    """hydra-style dotted overrides: set, create (++), nest, lists, scalars."""
    from f5_tts_tpu.train.cli import apply_overrides

    cfg = {"optim": {"learning_rate": 1e-4}}
    apply_overrides(cfg, [
        "optim.learning_rate=5e-5",               # set existing
        "++datasets.batch_size_per_gpu=19200",    # create section+key
        "++model.arch.depth=18",                  # deep create
        "datasets.names=[a, b,c]",                # list value
        "++optim.mixed_precision=true",           # bool scalar
    ])
    assert cfg["optim"]["learning_rate"] == 5e-5
    assert cfg["datasets"]["batch_size_per_gpu"] == 19200
    assert cfg["model"]["arch"]["depth"] == 18
    assert cfg["datasets"]["names"] == ["a", "b", "c"]
    assert cfg["optim"]["mixed_precision"] is True
    import pytest

    with pytest.raises(SystemExit):
        apply_overrides({}, ["no_dot=1"])
    with pytest.raises(SystemExit):
        apply_overrides({}, ["a.b"])


def test_train_cli_dotted_overrides(monkeypatch, tmp_path):
    """`f5-tts_train F5TTS_Tiny ++section.key=value` reaches config keys that
    have NO dedicated flag — parity with the reference's hydra CLI accepting
    arbitrary dotted overrides (reference src/f5_tts/train/README.md:45-53,
    train/train.py:17-19)."""
    import f5_tts_tpu.train.dataset as dataset_mod
    import f5_tts_tpu.train.trainer as trainer_mod
    from f5_tts_tpu.train import cli as train_cli

    captured = {}

    class FakeTrainer:
        def __init__(self, model_cfg, vocab, opt_cfg, **kw):
            captured["model_cfg"] = model_cfg
            captured["opt_cfg"] = opt_cfg
            captured["kw"] = kw

        def train(self, *a, **k):
            captured["trained"] = True

    monkeypatch.setattr(trainer_mod, "Trainer", FakeTrainer)
    monkeypatch.setattr(dataset_mod, "load_dataset",
                        lambda *a, **k: object())
    train_cli.main([
        "--model", "F5TTS_Tiny", "--dataset_name", "tiny",
        "--ckpt_dir", str(tmp_path),
        # none of these keys is exposed as a dedicated argparse flag:
        "++optim.max_grad_norm=0.5",
        "++optim.grad_accumulation_steps=3",
        "++ckpts.save_per_updates=7",
        "++datasets.batch_size_type=sample",
        "++model.arch.ff_mult=1",
    ])
    assert captured["trained"]
    assert captured["opt_cfg"].max_grad_norm == 0.5
    assert captured["opt_cfg"].grad_accumulation_steps == 3
    assert captured["kw"]["save_per_updates"] == 7
    assert captured["kw"]["batch_size_type"] == "sample"
    # the builtin model config was materialized and the dotted arch override hit it
    assert captured["model_cfg"].arch.ff_mult == 1
    assert captured["model_cfg"].arch.dim == 64  # rest of Tiny intact


def test_simple_yaml_parser():
    import textwrap

    from f5_tts_tpu.train.cli import parse_simple_yaml

    p = "/tmp/_yaml_test.yaml"
    open(p, "w").write(textwrap.dedent("""\
        # comment
        top: 1
        section:
          a: true
          b: null
          c: 7.5e-5
          nested:
            d: "quoted"
          e: plain string
        other:
          f: -1.0
        """))
    y = parse_simple_yaml(p)
    assert y["top"] == 1
    assert y["section"]["a"] is True
    assert y["section"]["b"] is None
    assert abs(y["section"]["c"] - 7.5e-5) < 1e-12
    assert y["section"]["nested"]["d"] == "quoted"
    assert y["section"]["e"] == "plain string"
    assert y["other"]["f"] == -1.0


def test_api_infer_kwargs_surface(ref_wav_path):
    """The reference api.py:98-116 kwargs all exist and are accepted."""
    import inspect

    from f5_tts_tpu.infer.api import F5TTS

    sig = inspect.signature(F5TTS.infer)
    for kw in ("ref_file", "ref_text", "gen_text", "show_info", "progress", "target_rms",
               "cross_fade_duration", "sway_sampling_coef", "cfg_strength", "nfe_step",
               "speed", "fix_duration", "remove_silence", "file_wave", "file_spec", "seed"):
        assert kw in sig.parameters, kw
    ctor = inspect.signature(F5TTS.__init__)
    for kw in ("model", "ckpt_file", "vocab_file", "ode_method", "use_ema",
               "vocoder_local_path", "device", "hf_cache_dir"):
        assert kw in ctor.parameters, kw
