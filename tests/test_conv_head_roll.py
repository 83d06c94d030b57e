"""Roll-kernel 7x7 head parity vs the direct XLA lowering (interpret mode).

The round-4 head kernel (ops/conv_head_roll.py): dx shifts as lane rolls,
dy taps folded into the dot's M, aligned dy-collapse. Forward and both
gradients must match the direct reflect-pad conv to float roundoff,
including the XLA-patched border columns.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nemar_tpu.ops.conv_head_roll import conv_head_roll, _direct


@pytest.mark.parametrize("shape,cout", [
    ((2, 16, 128, 8), 3),
    ((1, 8, 128, 16), 2),
    ((2, 12, 256, 4), 3),   # W=256: two 128-lane blocks
])
def test_forward_parity(shape, cout):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(shape, dtype=np.float32))
    wk = jnp.asarray(
        0.1 * rng.standard_normal((7, 7, shape[-1], cout), dtype=np.float32))
    got = np.asarray(conv_head_roll(x, wk))
    want = np.asarray(_direct(x, wk))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_grad_parity():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 8, 128, 8), dtype=np.float32))
    wk = jnp.asarray(
        0.1 * rng.standard_normal((7, 7, 8, 3), dtype=np.float32))

    def loss(fn):
        return jax.grad(
            lambda x_, w_: jnp.mean(jnp.abs(fn(x_, w_))), argnums=(0, 1))

    gx, gw = loss(conv_head_roll)(x, wk)
    rx, rw = loss(_direct)(x, wk)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), atol=2e-5)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(rw), atol=2e-5)


def test_unsupported_shapes_fall_back():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 9, 100, 4), dtype=np.float32))
    wk = jnp.asarray(
        0.1 * rng.standard_normal((7, 7, 4, 3), dtype=np.float32))
    got = np.asarray(conv_head_roll(x, wk))  # W % 128 != 0 -> direct
    want = np.asarray(_direct(x, wk))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_resnet_generator_roll_equivalence():
    """--c7_impl roll swaps freely with xla on the same param tree.

    Input sized so the head map is (8, 128) — the kernel path, not the
    fallback (head_roll_supported needs W % 128 == 0 after the two
    stride-2 downsamplings).
    """
    from nemar_tpu.models.networks import ResnetGenerator

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((1, 32, 512, 3)), jnp.float32)
    g_x = ResnetGenerator(3, 8, 2, 2, "instance", c7_impl="xla")
    g_r = ResnetGenerator(3, 8, 2, 2, "instance", c7_impl="roll")
    p = g_x.init(jax.random.key(0), x)
    np.testing.assert_allclose(
        np.asarray(g_r.apply(p, x)), np.asarray(g_x.apply(p, x)),
        rtol=5e-5, atol=5e-5)
