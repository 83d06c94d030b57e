"""Optimizer helpers shared by the model families.

torch.optim.Adam(lr, betas=(beta1, 0.999)) equivalent, with the learning
rate applied OUTSIDE the transform so the per-epoch LR schedule feeds the
jitted step as a plain scalar (no recompilation, no state surgery).
"""

from __future__ import annotations

import jax
import optax


def make_adam(beta1: float = 0.5, fused: bool = False):
    """optax.scale_by_adam matching torch Adam defaults (SURVEY A.5).

    fused=True routes the update through ONE flat vector: the nemar param
    tree is ~100 small leaves, and the per-leaf update lowers to ~2
    launch-bound kernels each (probe r3o: 6.2 ms for a pure Adam update
    that moves ~360 MB — ~30x off HBM speed-of-light). Raveling
    concentrates the mu/nu/normalize math into single whole-tree kernels;
    identical elementwise math, only the layout changes. NOTE: optimizer-
    state checkpoints are shape-incompatible across this flag.
    """
    base = optax.scale_by_adam(b1=beta1, b2=0.999, eps=1e-8)
    if not fused:
        return base

    from jax.flatten_util import ravel_pytree

    def init(params):
        flat, _ = ravel_pytree(params)
        return base.init(flat)

    def update(grads, state, params=None):
        flat_g, unravel = ravel_pytree(grads)
        u, state = base.update(flat_g, state, None)
        return unravel(u), state

    return optax.GradientTransformation(init, update)


def apply_updates(params, updates, lr):
    """params - lr * adam_normalized_updates."""
    return jax.tree.map(lambda p, u: p - lr * u, params, updates)
