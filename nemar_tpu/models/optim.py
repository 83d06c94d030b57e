"""Optimizer helpers shared by the model families.

torch.optim.Adam(lr, betas=(beta1, 0.999)) equivalent, with the learning
rate applied OUTSIDE the transform so the per-epoch LR schedule feeds the
jitted step as a plain scalar (no recompilation, no state surgery).
"""

from __future__ import annotations

import jax
import optax


def make_adam(beta1: float = 0.5, fused: bool = False,
              bucket_elems: int = 4_000_000):
    """optax.scale_by_adam matching torch Adam defaults (SURVEY A.5).

    fused=True routes the update through a handful of flat vectors: the
    nemar param tree is ~100 small leaves, and the per-leaf update lowers
    to ~2 launch-bound kernels each (probe r3o: 6.2 ms for a pure Adam
    update that moves ~360 MB — ~30x off HBM speed-of-light). Raveling
    concentrates the mu/nu/normalize math into whole-bucket kernels;
    identical elementwise math, only the layout changes.

    Buckets (round 4): leaves are grouped IN TREE ORDER into flat vectors
    of <= bucket_elems elements instead of one single ravel. Adam is
    elementwise, so the math is unchanged; what changes is the size of
    the concatenate the compiler must schedule — the single full-tree
    ravel is what pushed the pallas-trunk step compile over the remote
    helper's memory (probes r3q/r4d: reproducible SIGKILL). NOTE:
    optimizer-state checkpoints are shape-incompatible across this flag,
    AND across the round-4 layout change itself: --opt_fused checkpoints
    saved before the bucketing (one flat ravel) no longer restore — orbax
    raises a shape mismatch naming the old single-vector layout. Restart
    such runs from the per-net params (which are unaffected) or re-save
    with the matching code revision.
    """
    base = optax.scale_by_adam(b1=beta1, b2=0.999, eps=1e-8)
    if not fused:
        return base

    from jax.flatten_util import ravel_pytree
    from jax.tree_util import tree_flatten, tree_unflatten

    def _bucket_ix(leaves):
        groups, cur, n = [], [], 0
        for i, leaf in enumerate(leaves):
            if cur and n + leaf.size > bucket_elems:
                groups.append(cur)
                cur, n = [], 0
            cur.append(i)
            n += leaf.size
        if cur:
            groups.append(cur)
        return groups

    def init(params):
        leaves, _ = tree_flatten(params)
        states = []
        for ix in _bucket_ix(leaves):
            flat, _ = ravel_pytree([leaves[i] for i in ix])
            states.append(base.init(flat))
        return tuple(states)

    def update(grads, state, params=None):
        leaves, treedef = tree_flatten(grads)
        out = [None] * len(leaves)
        new_states = []
        for ix, st in zip(_bucket_ix(leaves), state):
            flat_g, unravel = ravel_pytree([leaves[i] for i in ix])
            u, st = base.update(flat_g, st, None)
            new_states.append(st)
            for i, leaf_u in zip(ix, unravel(u)):
                out[i] = leaf_u
        return tree_unflatten(treedef, out), tuple(new_states)

    return optax.GradientTransformation(init, update)


def apply_updates(params, updates, lr):
    """params - lr * adam_normalized_updates."""
    return jax.tree.map(lambda p, u: p - lr * u, params, updates)
