"""ASR fallback for empty ref_text (reference utils_infer.py:153-184 uses
openai/whisper-large-v3-turbo via transformers).

Model resolution is automatic like the reference's lazy init: explicit
``model_path`` -> $F5_TTS_TPU_WHISPER -> local HF cache snapshot -> hub
download when the network is reachable (utils/hub.py).  The returned callable
plugs into ``preprocess_ref_audio_text(transcribe_fn=...)``.
"""

from __future__ import annotations

import os

import numpy as np

_pipe = None
_pipe_path = None


def whisper_available(model_path: str | None = None, hf_cache_dir: str | None = None) -> bool:
    """True when an ASR model is resolvable without manual wiring."""
    from f5_tts_tpu.utils.hub import resolve_whisper

    return resolve_whisper(model_path, hf_cache_dir) is not None


def make_whisper_transcriber(
    model_path: str | None = None,
    language: str | None = None,
    hf_cache_dir: str | None = None,
):
    """Returns transcribe_fn(wav: np.ndarray, sr: int) -> str.

    Model resolution (reference lazy-loads by name, utils_infer.py:153-184):
    explicit ``model_path`` -> $F5_TTS_TPU_WHISPER -> local HF cache snapshot
    of openai/whisper-large-v3-turbo -> (if online) hub download.
    """
    from f5_tts_tpu.utils.hub import WHISPER_REPO, resolve_whisper

    model_path = resolve_whisper(model_path, hf_cache_dir)
    if not model_path:
        raise RuntimeError(
            f"no Whisper model: populate the local HF cache with {WHISPER_REPO},"
            " set $F5_TTS_TPU_WHISPER to a local snapshot, or pass model_path"
        )
    global _pipe, _pipe_path
    if _pipe is None or _pipe_path != model_path:  # re-key on a new snapshot
        from transformers import pipeline

        _pipe = pipeline(
            "automatic-speech-recognition",
            model=model_path,
            device="cpu",
        )
        _pipe_path = model_path
    pipe = _pipe  # bind locally: a later transcriber with another snapshot
    # must not swap the model under this closure

    def transcribe(wav: np.ndarray, sr: int) -> str:
        out = pipe(
            {"raw": np.asarray(wav, dtype=np.float32), "sampling_rate": sr},
            chunk_length_s=30,
            batch_size=8,
            generate_kwargs={"task": "transcribe", "language": language} if language else {"task": "transcribe"},
            return_timestamps=False,
        )
        return out["text"].strip()

    return transcribe
