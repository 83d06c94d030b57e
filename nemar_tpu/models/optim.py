"""Optimizer helpers shared by the model families.

torch.optim.Adam(lr, betas=(beta1, 0.999)) equivalent, with the learning
rate applied OUTSIDE the transform so the per-epoch LR schedule feeds the
jitted step as a plain scalar (no recompilation, no state surgery).
"""

from __future__ import annotations

import jax
import optax


def make_adam(beta1: float = 0.5):
    """optax.scale_by_adam matching torch Adam defaults (SURVEY A.5)."""
    return optax.scale_by_adam(b1=beta1, b2=0.999, eps=1e-8)


def apply_updates(params, updates, lr):
    """params - lr * adam_normalized_updates."""
    return jax.tree.map(lambda p, u: p - lr * u, params, updates)
