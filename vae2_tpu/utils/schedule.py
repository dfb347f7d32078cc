"""Training schedules (reference lib/utils/utils.py:459-468)."""

from __future__ import annotations

import math


def adjust_learning_rate(base_lr: float, max_iters: int, cur_iters: int,
                         power: float = 0.9) -> float:
    """Poly LR decay (reference utils.py:459-463). The reference keeps this
    call commented out in adversarial training (function.py:525-528); provided
    for the legacy segmentation path."""
    return base_lr * ((1.0 - float(cur_iters) / max_iters) ** power)


def dynamic_coeff(max_iters: int, cur_iters: int) -> float:
    """Sin-ramp anneal multiplier in [0, 1] (reference utils.py:465-468),
    applied to the x2-recon lambda (toy) or the KL lambda (VAE_ANNEAL)."""
    return math.sin((math.pi / 2.0) * (float(cur_iters) / float(max_iters)))
