"""Model zoo: functional backbones + CFM + vocoders.

Discoverability re-exports (the reference exposes classes from f5_tts.model;
here each model is a module of pure init/apply functions over pytrees).
"""

from f5_tts_tpu.models import cfm, dit, mmdit, unett, vocos  # noqa: F401
from f5_tts_tpu.models.backbones import get_backbone  # noqa: F401
from f5_tts_tpu.models.configs import (  # noqa: F401
    MODEL_CONFIGS,
    DiTConfig,
    MMDiTConfig,
    ModelConfig,
    UNetTConfig,
)
