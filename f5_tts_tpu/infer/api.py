"""Public Python API — mirrors the reference `f5_tts.api.F5TTS` surface
(reference src/f5_tts/api.py:23-149): constructor kwargs, `infer()` signature
and its (wav, sr, spec) return contract are preserved.

Differences driven by the TPU/zero-egress environment:
- model names resolve through the local HF cache first (utils/hub.py), then a
  hub download when the network is reachable; both the released
  .safetensors/.pt torch formats and native .npz snapshots load;
- ``device`` selects a jax device ("tpu"/"cpu"); dtype defaults to bfloat16 on
  TPU, float32 elsewhere (reference uses fp16 on CUDA, utils_infer.py:203).
"""

from __future__ import annotations

import random
import sys

import jax
import jax.numpy as jnp
import numpy as np

from f5_tts_tpu.audio.io import load_wav, save_wav
from f5_tts_tpu.audio.preprocess import preprocess_ref_audio_text
from f5_tts_tpu.infer.engine import EngineOptions, InferenceEngine
from f5_tts_tpu.infer.pipeline import (
    CFG_STRENGTH,
    CROSS_FADE_DURATION,
    NFE_STEP,
    SPEED,
    SWAY_SAMPLING_COEF,
    TARGET_RMS,
    PipelineOptions,
    infer_process,
)
from f5_tts_tpu.models import vocos as vocos_model
from f5_tts_tpu.models import configs as configs_mod
from f5_tts_tpu.models.configs import MODEL_CONFIGS, ModelConfig, with_vocab_size
from f5_tts_tpu.text.tokenizer import get_tokenizer
from f5_tts_tpu.utils import ckpt as ckpt_util
from f5_tts_tpu.utils import hub


class F5TTS:
    def __init__(
        self,
        model: str = "F5TTS_v1_Base",
        ckpt_file: str = "",
        vocab_file: str = "",
        ode_method: str = "euler",
        use_ema: bool = True,
        vocoder_local_path: str | None = None,
        device: str | None = None,
        hf_cache_dir: str | None = None,  # local HF cache for name->file resolution
        dtype=None,
        nfe_step: int = NFE_STEP,
        init_random: bool = False,
        model_cfg: dict | None = None,
        artifacts: str | None = None,  # AOT artifact dir (runtime/aot.py);
        # serve pre-built graphs instead of tracing + jit-compiling
        artifacts_fallback: bool = False,  # un-exported shapes fall back to live jit
    ):
        assert ode_method in ("euler", "midpoint"), (
            "fixed-step solvers only (matches reference torchdiffeq usage)"
        )
        self.hf_cache_dir = hf_cache_dir  # also used by the ASR fallback in infer()
        if isinstance(model_cfg, str):  # YAML config path (reference infer_cli.py
            # -mc/--model_cfg: OmegaConf.load of a configs/*.yaml, :268-272)
            from f5_tts_tpu.train.cli import parse_simple_yaml

            model_cfg = configs_mod.from_yaml_dict(parse_simple_yaml(model_cfg).get("model", {}))
        elif isinstance(model_cfg, dict):  # custom-arch dict, flat reference
            # format (infer_gradio.py:1037-1068)
            arch_kw = dict(model_cfg)
            backbone_name = arch_kw.pop("backbone", "DiT")
            model_cfg = configs_mod.from_yaml_dict(
                {"name": model, "backbone": backbone_name, "arch": arch_kw}
            )
        elif not model_cfg:
            model_cfg: ModelConfig = MODEL_CONFIGS[model]
        self.vocab, vocab_size = get_tokenizer(vocab_file or None, model_cfg.tokenizer)
        model_cfg = with_vocab_size(model_cfg, vocab_size)
        self.model_cfg = model_cfg
        self.tokenizer = model_cfg.tokenizer

        platform = device or ("tpu" if any(d.platform != "cpu" for d in jax.devices()) else "cpu")
        self.device = platform
        if dtype is None:
            dtype = jnp.bfloat16 if platform != "cpu" else jnp.float32
        self.seed = -1
        self.mel_spec_type = model_cfg.mel.mel_spec_type
        self.target_sample_rate = model_cfg.mel.target_sample_rate

        # DiT weights
        from f5_tts_tpu.models.backbones import get_backbone

        backbone = get_backbone(model_cfg.arch)
        if not ckpt_file and not init_random:
            # reference api.py:78-81 resolves the model name to a hub file;
            # here: local HF cache first, network only if reachable (utils/hub.py)
            ckpt_file = hub.resolve_checkpoint(
                model, model_cfg.mel.mel_spec_type, hf_cache_dir
            ) or ""
        elif ckpt_file.startswith("hf://"):  # reference infer_cli.py:292-293
            resolved = hub.resolve_hf_file(*hub.parse_hf_uri(ckpt_file), hf_cache_dir)
            if resolved is None:
                raise FileNotFoundError(
                    f"{ckpt_file} not in the local HF cache and not downloadable"
                )
            ckpt_file = resolved
        if ckpt_file:
            if ckpt_file.endswith(".npz"):
                template = backbone.init(jax.random.PRNGKey(0), model_cfg.arch)
                dit_params = ckpt_util.load_pytree(template, ckpt_file)
            else:
                state = ckpt_util.load_torch_state(ckpt_file, use_ema=use_ema)
                dit_params = ckpt_util.params_from_state(state, model_cfg.arch)
        elif init_random:
            dit_params = backbone.init(jax.random.PRNGKey(0), model_cfg.arch)
        else:
            raise ValueError(
                f"no checkpoint: {model} was not found in the local HF cache and"
                " could not be downloaded. Pass ckpt_file=, populate the HF cache"
                f" (repo {hub.model_hub_spec(model, model_cfg.mel.mel_spec_type)[0]}),"
                " or pass init_random=True for smoke testing."
            )

        # vocoder weights (backend from the model's mel_spec_type)
        vocoder_type = model_cfg.mel.mel_spec_type
        if not vocoder_local_path and not init_random:
            # reference utils_infer.py:108-146 downloads the vocoder by name
            vocoder_local_path = hub.resolve_vocoder(vocoder_type, hf_cache_dir)
        if vocoder_local_path:
            if vocoder_type == "bigvgan":
                from f5_tts_tpu.models import bigvgan as bigvgan_model

                if vocoder_local_path.endswith(".npz"):
                    template = bigvgan_model.init(jax.random.PRNGKey(0))
                    voc_params = ckpt_util.load_pytree(template, vocoder_local_path)
                else:
                    vstate = ckpt_util.load_torch_state(vocoder_local_path, use_ema=False)
                    voc_params = ckpt_util.bigvgan_params_from_state(vstate)
            elif vocoder_local_path.endswith(".npz"):
                template = vocos_model.init(jax.random.PRNGKey(0))
                voc_params = ckpt_util.load_pytree(template, vocoder_local_path)
            else:
                vstate = ckpt_util.load_torch_state(vocoder_local_path, use_ema=False)
                voc_params = ckpt_util.vocos_params_from_state(vstate)
        elif init_random:
            if vocoder_type == "bigvgan":
                from f5_tts_tpu.models import bigvgan as bigvgan_model

                voc_params = bigvgan_model.init(jax.random.PRNGKey(1))
            else:
                voc_params = vocos_model.init(jax.random.PRNGKey(1))
        else:
            voc_params = None
            import warnings

            warnings.warn(
                "no vocoder weights (vocoder_local_path not set and"
                " init_random=False): the engine runs mel-only and waveform"
                " calls will fail — download Vocos/BigVGAN weights and pass"
                " vocoder_local_path",
                stacklevel=2,
            )

        if artifacts:
            # pre-built AOT graphs (runtime/aot.py): sampler options, dtype and
            # buckets come from engine_meta.json; weights stay the ones loaded
            # above, so finetuned checkpoints serve through existing artifacts
            from f5_tts_tpu.runtime.aot import AotEngine

            self.engine = AotEngine(
                artifacts, dit_params, model_cfg, vocoder_params=voc_params,
                fallback=artifacts_fallback,
            )
        else:
            self.engine = InferenceEngine(
                dit_params,
                model_cfg,
                vocoder_params=voc_params,
                dtype=dtype,
                options=EngineOptions(nfe_step=nfe_step, ode_method=ode_method),
            )

    # surface parity: reference api.py:86-96
    def transcribe(self, ref_audio, language=None):
        from f5_tts_tpu.audio.asr import make_whisper_transcriber

        fn = make_whisper_transcriber(language=language, hf_cache_dir=self.hf_cache_dir)
        if isinstance(ref_audio, str):
            wav, sr = load_wav(ref_audio)
        else:
            wav, sr = ref_audio
        return fn(wav, sr)

    def export_wav(self, wav, file_wave, remove_silence=False):
        save_wav(file_wave, wav, self.target_sample_rate)

    def export_spectrogram(self, spec, file_spec):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.figure(figsize=(12, 4))
        plt.imshow(spec, origin="lower", aspect="auto")
        plt.colorbar()
        plt.savefig(file_spec)
        plt.close()

    def infer(
        self,
        ref_file: str | tuple[np.ndarray, int],
        ref_text: str,
        gen_text: str,
        show_info=print,
        progress=None,  # surface compat
        target_rms: float = TARGET_RMS,
        cross_fade_duration: float = CROSS_FADE_DURATION,
        sway_sampling_coef: float = SWAY_SAMPLING_COEF,
        cfg_strength: float = CFG_STRENGTH,
        nfe_step: int = NFE_STEP,
        speed: float = SPEED,
        fix_duration: float | None = None,
        remove_silence: bool = False,
        file_wave: str | None = None,
        file_spec: str | None = None,
        seed: int | None = None,
    ):
        if seed is None:
            seed = random.randint(0, sys.maxsize) % (2**31 - 1)
        self.seed = seed

        transcribe_fn = None
        if not ref_text.strip():
            # reference lazy-loads whisper automatically on empty ref_text
            # (utils_infer.py:153-184); resolve env var / HF cache / download
            # resolve ONCE (against the same HF cache the ctor used) and hand
            # the resolved snapshot to the transcriber — a second resolution
            # could re-hit the hub or disagree with the availability probe
            from f5_tts_tpu.audio.asr import make_whisper_transcriber
            from f5_tts_tpu.utils.hub import resolve_whisper

            wpath = resolve_whisper(hf_cache_dir=self.hf_cache_dir)
            if wpath:
                transcribe_fn = make_whisper_transcriber(wpath)
        (wav, sr), ref_text = preprocess_ref_audio_text(
            ref_file, ref_text, show_info=show_info, transcribe_fn=transcribe_fn
        )
        # surface the clipped/transcribed ref text so UIs can write it back
        # (reference infer_gradio.py returns ref_text from its infer())
        self.last_ref_text = ref_text

        eng = self.engine
        if (
            nfe_step != eng.options.nfe_step
            or cfg_strength != eng.options.cfg_strength
            or sway_sampling_coef != eng.options.sway_sampling_coef
        ):
            # replace() keeps every other knob (ode_method, quantize, epss,
            # backend) — rebuilding from scratch silently reset the solver
            import dataclasses

            eng.options = dataclasses.replace(
                eng.options,
                nfe_step=nfe_step,
                cfg_strength=cfg_strength,
                sway_sampling_coef=sway_sampling_coef,
            )

        out_wav, out_sr, spec = infer_process(
            eng,
            (wav, sr),
            ref_text,
            gen_text,
            self.vocab,
            tokenizer=self.tokenizer,
            opts=PipelineOptions(
                target_rms=target_rms,
                cross_fade_duration=cross_fade_duration,
                speed=speed,
                fix_duration=fix_duration,
                seed=seed,
            ),
            show_info=show_info,
        )
        if remove_silence and out_wav is not None:
            from f5_tts_tpu.audio.silence import remove_silence_edges

            out_wav = remove_silence_edges(out_wav, out_sr)
        if file_wave is not None and out_wav is not None:
            self.export_wav(out_wav, file_wave)
        if file_spec is not None and spec is not None:
            self.export_spectrogram(spec, file_spec)
        return out_wav, out_sr, spec
