"""Scatter-form small-Cout conv parity vs the direct XLA conv."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nemar_tpu.ops.attic.conv_small import conv2d_small_cout

# archive tier: parity coverage for a measured-losing kernel (ops/attic)
pytestmark = pytest.mark.attic


def _direct(x, w, pad):
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    return jax.lax.conv_general_dilated(
        xp, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def test_fwd_parity(rng):
    x = jnp.asarray(rng.standard_normal((2, 24, 20, 64), dtype=np.float32))
    w = jnp.asarray(0.05 * rng.standard_normal((7, 7, 64, 3), dtype=np.float32))
    out = conv2d_small_cout(x, w, 3)
    ref = _direct(x, w, 3)
    err = float(jnp.max(jnp.abs(out - ref)))
    assert err < 1e-4, f"fwd max err {err}"


def test_bwd_parity(rng):
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 64), dtype=np.float32))
    w = jnp.asarray(0.05 * rng.standard_normal((7, 7, 64, 3), dtype=np.float32))

    gs = jax.grad(lambda x, w: jnp.mean(jnp.square(
        conv2d_small_cout(x, w, 3))), argnums=(0, 1))(x, w)
    gr = jax.grad(lambda x, w: jnp.mean(jnp.square(
        _direct(x, w, 3))), argnums=(0, 1))(x, w)
    for name, a, b in zip(("dx", "dw"), gs, gr):
        scale = float(jnp.max(jnp.abs(b))) + 1e-12
        err = float(jnp.max(jnp.abs(a - b))) / scale
        assert err < 1e-3, f"{name} rel err {err}"


def test_k3_zero_pad(rng):
    x = jnp.asarray(rng.standard_normal((1, 12, 12, 32), dtype=np.float32))
    w = jnp.asarray(0.1 * rng.standard_normal((3, 3, 32, 2), dtype=np.float32))
    out = conv2d_small_cout(x, w, 1, pad_mode="constant")
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    ref = jax.lax.conv_general_dilated(
        xp, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    err = float(jnp.max(jnp.abs(out - ref)))
    assert err < 1e-4, f"max err {err}"
