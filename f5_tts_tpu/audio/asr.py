"""ASR fallback for empty ref_text (reference utils_infer.py:153-184 uses
openai/whisper-large-v3-turbo via transformers).

transformers is installed in this build but model weights must be local
(zero egress): point $F5_TTS_TPU_WHISPER or ``model_path`` at a downloaded
Whisper snapshot directory.  The returned callable plugs into
``preprocess_ref_audio_text(transcribe_fn=...)``.
"""

from __future__ import annotations

import os

import numpy as np

_pipe = None


def make_whisper_transcriber(model_path: str | None = None, language: str | None = None):
    """Returns transcribe_fn(wav: np.ndarray, sr: int) -> str."""
    model_path = model_path or os.environ.get("F5_TTS_TPU_WHISPER")
    if not model_path:
        raise RuntimeError(
            "no Whisper model path: set $F5_TTS_TPU_WHISPER to a local snapshot"
            " of openai/whisper-large-v3-turbo (or pass model_path)"
        )
    global _pipe
    if _pipe is None:
        from transformers import pipeline

        _pipe = pipeline(
            "automatic-speech-recognition",
            model=model_path,
            device="cpu",
        )

    def transcribe(wav: np.ndarray, sr: int) -> str:
        out = _pipe(
            {"raw": np.asarray(wav, dtype=np.float32), "sampling_rate": sr},
            chunk_length_s=30,
            batch_size=8,
            generate_kwargs={"task": "transcribe", "language": language} if language else {"task": "transcribe"},
            return_timestamps=False,
        )
        return out["text"].strip()

    return transcribe
