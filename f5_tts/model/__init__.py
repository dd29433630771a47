"""Alias of `f5_tts.model`: the reference exposes CFM/DiT/UNetT/MMDiT/Trainer
classes; the TPU build exposes the functional modules under the same names."""

from f5_tts_tpu.models import cfm as CFM  # noqa: F401  (module of sample/loss fns)
from f5_tts_tpu.models import dit as DiT  # noqa: F401
from f5_tts_tpu.models import mmdit as MMDiT  # noqa: F401
from f5_tts_tpu.models import unett as UNetT  # noqa: F401
from f5_tts_tpu.train.trainer import Trainer  # noqa: F401
