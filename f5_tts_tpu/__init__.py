"""F5-TTS TPU — a TPU-native (JAX/XLA/Pallas) rebuild of the F5-TTS voice-cloning
TTS framework.

Capabilities mirror SWivid/F5-TTS (reference mounted at /root/reference) but the
design is TPU-first:

- mel extraction, the DiT/UNetT/MMDiT backbones, the whole NFE conditional-flow-
  matching Euler loop (with fused classifier-free-guidance batching) and the Vocos
  vocoder live in ONE jit-compiled XLA graph — no per-ODE-step engine dispatch.
- attention runs as a Pallas flash-attention kernel on TPU (XLA SDPA fallback).
- scaling is mesh-based: `jax.sharding.Mesh` + NamedSharding for data/tensor
  parallel serving and training, XLA collectives over ICI.

Public API mirrors `f5_tts.api.F5TTS` (reference src/f5_tts/api.py).
"""

__version__ = "0.1.0"


def __getattr__(name):
    # lazy convenience re-exports (keep bare `import f5_tts_tpu` dependency-light)
    if name == "F5TTS":
        from f5_tts_tpu.infer.api import F5TTS

        return F5TTS
    if name == "MODEL_CONFIGS":
        from f5_tts_tpu.models.configs import MODEL_CONFIGS

        return MODEL_CONFIGS
    raise AttributeError(name)
