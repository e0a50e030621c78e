"""LR and BatchNorm-momentum schedules.

The reference uses torch's CyclicLR (triangular, base 1e-5, max 1e-3,
step_size_up = max_epoch*iters_per_epoch/6, ``utils/solver.py:45-46``) and a
BN-momentum decay 0.9 * 0.5^(step/4000) clipped at 0.01
(``utils/solver.py:48-49``, ``config/ist_net_default.yaml:16-20``,
``utils/scheduler.py:284-303``). Both are pure functions of the step here —
jit-friendly, no mutable scheduler objects.
"""

from __future__ import annotations

import jax.numpy as jnp


def cyclic_triangular_lr(step, base_lr: float = 1e-5, max_lr: float = 1e-3,
                         step_size_up: int = 20000, step_size_down: int | None = None):
    """torch.optim.lr_scheduler.CyclicLR, mode='triangular', cycle_momentum=False.

    lr = base + (max-base) * max(0, 1 - |x|) where x is the position within
    the cycle scaled so x=1 at the peak.
    """
    step = jnp.asarray(step, jnp.float32)
    up = float(step_size_up)
    down = float(step_size_down if step_size_down is not None else step_size_up)
    total = up + down
    cycle = jnp.floor(1.0 + step / total)
    x = step / total - (cycle - 1.0)
    # rising for x in [0, up/total], falling after
    scale = jnp.where(x <= up / total, x * total / up, (total - x * total) / down)
    return base_lr + (max_lr - base_lr) * jnp.maximum(0.0, scale)


def bn_momentum(step, bn_mom: float = 0.9, bn_decay: float = 0.5,
                decay_step: int = 4000, clip: float = 0.01):
    """Reference BNMomentumScheduler value (torch momentum semantics:
    running = (1-m)*running + m*batch)."""
    step = jnp.asarray(step, jnp.float32)
    m = bn_mom * bn_decay ** jnp.floor(step / decay_step)
    return jnp.maximum(m, clip)
