"""Scheduler factories for the classifier.

Parity target: vendored model/extra_model_utils.py:17-55 — the four primary
schedulers as multiplicative lr factors of epoch index:
  exponentiallr: gamma^e; multistep: gamma^(milestones passed);
  cosine: CosineAnnealingLR(T_max=3); none: constant.
(The always-on secondary ReduceLROnPlateau lives in the trainer.)
"""

from __future__ import annotations

import math
from typing import Callable


def make_scheduler(args) -> Callable[[int], float]:
    name = getattr(args, "scheduler", "none")
    gamma = getattr(args, "gamma", 0.95)
    milestones = tuple(getattr(args, "lr_decay_steps", ()))

    if name == "exponentiallr":
        return lambda e: gamma ** e
    if name == "multistep":
        return lambda e: gamma ** sum(1 for m in milestones if e >= m)
    if name == "cosine":
        t_max = 3
        return lambda e: 0.5 * (1 + math.cos(math.pi * (e % (2 * t_max)) / t_max)) \
            if (e % (2 * t_max)) <= t_max else \
            0.5 * (1 + math.cos(math.pi * (2 * t_max - (e % (2 * t_max))) / t_max))
    if name == "plat":
        # primary plateau handled as constant here; the trainer's secondary
        # plateau performs the reduction (vendored used torch's scheduler
        # object; factor composition is equivalent)
        return lambda e: 1.0
    return lambda e: 1.0
