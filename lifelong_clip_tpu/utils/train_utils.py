"""Optimizer and LR-schedule factories over optax.

Counterpart of reference ``utils/train_utils.py:16-59`` +
``utils/schedulers.py:47-57``. Optimizers apply to the *trainable* pytree
only (the frozen backbone never enters the optimizer), which replaces the
reference's requires_grad filtering.
"""

from __future__ import annotations

import math
from typing import Optional

import optax


def make_schedule(sched_name: str, lr: float, *,
                  total_steps: int = 10_000,
                  warmup: int = 0):
    if sched_name in ("default", "const", "constant"):
        return lr
    if sched_name == "exp":
        return optax.exponential_decay(lr, transition_steps=1,
                                       decay_rate=0.9999)
    if sched_name in ("cos", "coslr"):
        return optax.cosine_decay_schedule(lr, decay_steps=max(total_steps,
                                                               1))
    if sched_name == "codacosine":
        # CosineSchedule from reference utils/schedulers.py:47-57:
        # lr(e) = lr * 0.5 * (1 + cos(e/K * pi)) stepped per task-epoch.
        def sched(step):
            import jax.numpy as jnp
            frac = jnp.minimum(step / max(total_steps, 1), 1.0)
            return lr * 0.5 * (1.0 + jnp.cos(frac * math.pi))
        return sched
    if sched_name == "anneal":
        return optax.exponential_decay(lr, transition_steps=max(total_steps
                                                                // 4, 1),
                                       decay_rate=0.5, staircase=True)
    if sched_name == "multistep":
        return optax.piecewise_constant_schedule(
            lr, {int(total_steps * 0.5): 0.1, int(total_steps * 0.75): 0.1})
    raise ValueError(f"unknown scheduler {sched_name!r}")


# reference select_optimizer's per-optimizer weight decays
# (utils/train_utils.py:21-28): adam 0, radam 1e-5, sgd 1e-4 (coupled L2,
# momentum 0), adamw 1e-5 (decoupled)
_REF_WD = {"adam": 0.0, "adamw": 1e-5, "radam": 1e-5, "sgd": 1e-4}


def make_optimizer(opt_name: str,
                   lr: float,
                   *,
                   sched_name: str = "default",
                   total_steps: int = 10_000,
                   weight_decay: Optional[float] = None,
                   momentum: float = 0.0,
                   grad_clip: Optional[float] = None) -> optax.GradientTransformation:
    """adam/adamw/radam/sgd over a schedule (reference train_utils.py:16-31).

    ``weight_decay=None`` resolves to the reference's per-optimizer
    default. torch's Adam-family/SGD weight decay is COUPLED L2 (added to
    the grad before the update), so adam/radam/sgd decay goes through
    ``add_decayed_weights`` in front of the transform; AdamW is decoupled
    on both sides.
    """
    if weight_decay is None:
        weight_decay = _REF_WD.get(opt_name, 0.0)
    schedule = make_schedule(sched_name, lr, total_steps=total_steps)
    pre = [optax.add_decayed_weights(weight_decay)] \
        if (weight_decay and opt_name != "adamw") else []
    if opt_name == "adam":
        tx = optax.adam(schedule)
    elif opt_name == "adamw":
        tx = optax.adamw(schedule, weight_decay=weight_decay)
    elif opt_name == "radam":
        tx = optax.radam(schedule)
    elif opt_name == "sgd":
        tx = optax.sgd(schedule, momentum=momentum or None)
    else:
        raise ValueError(f"unknown optimizer {opt_name!r}")
    if pre:
        tx = optax.chain(*pre, tx)
    if grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx
