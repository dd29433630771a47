"""Seeding helpers (reference model/utils.py:19-26 seed_everything).

JAX is explicit-PRNG so there is no global generator to seed for model math;
this seeds the host-side generators (python random / numpy) that drive seed
selection, sampler shuffles, and noise-seed draws."""

from __future__ import annotations

import os
import random

import numpy as np


def seed_everything(seed: int = 0) -> None:
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    np.random.seed(seed)
