"""Functional fake-image pool (reference util/image_pool.py — CycleGAN trick).

The reference ImagePool is a stateful host-side buffer of 50 previously
generated fakes; each query returns, per image, either the incoming fake or
(50% once full) a random buffered one, swapping it out. A host-side mutable
buffer would break the single-jit training step, so here the pool is PURE
STATE: a device-resident (P, H, W, C) buffer + fill count carried in the
train state, updated inside jit with PRNG randomness.

Engaged via --pool_size (reference default 50; nemar commonly 0 —
SURVEY.md §8.4(e)); pool_size 0 bypasses it entirely.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class PoolState(NamedTuple):
    images: jax.Array  # (P, H, W, C)
    count: jax.Array   # int32 number of valid entries


def init_pool(pool_size: int, image_shape: Tuple[int, int, int],
              dtype=jnp.float32) -> PoolState:
    return PoolState(
        images=jnp.zeros((pool_size,) + tuple(image_shape), dtype),
        count=jnp.zeros((), jnp.int32),
    )


def query_pool(
    state: PoolState, fakes: jax.Array, rng: jax.Array
) -> Tuple[PoolState, jax.Array]:
    """Reference ImagePool.query semantics, vectorized and pure.

    Per incoming fake:
      * pool not yet full -> insert, return the incoming fake;
      * else with p=0.5  -> return a random buffered image and replace it
        with the incoming fake;
      * else             -> return the incoming fake (buffer unchanged).
    """
    p = state.images.shape[0]
    n = fakes.shape[0]
    r_choice, r_idx = jax.random.split(rng)
    use_old = jax.random.bernoulli(r_choice, 0.5, (n,))
    rand_idx = jax.random.randint(r_idx, (n,), 0, p)

    # Slot each incoming fake would fill while the pool is filling up.
    fill_idx = state.count + jnp.arange(n, dtype=jnp.int32)
    filling = fill_idx < p

    # returned_old reads the PRE-update buffer, so a swap is only legal
    # against slots that were valid BEFORE this batch (rand_idx < count) —
    # otherwise a batch crossing the fill boundary could hand D a
    # never-written zero image from a slot an earlier item is filling.
    swap = jnp.logical_and(
        jnp.logical_and(~filling, use_old), rand_idx < state.count
    )

    # Where to write: filling slots while not full, else the swapped slot.
    # Writes that shouldn't happen target index p (out of range -> dropped
    # by scatter with drop semantics).
    write_idx = jnp.where(
        filling, jnp.minimum(fill_idx, p - 1),
        jnp.where(swap, rand_idx, p),  # p == dropped
    )
    new_images = state.images.at[write_idx].set(fakes, mode="drop")

    returned_old = state.images[rand_idx]
    out = jnp.where(swap[:, None, None, None], returned_old, fakes)
    new_count = jnp.minimum(state.count + n, p)
    return PoolState(new_images, new_count), out
