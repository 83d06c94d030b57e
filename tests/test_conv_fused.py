"""Fused ResNet-block kernel parity (interpret mode on CPU).

Oracle: resblock_reference (plain XLA composition of the identical math,
itself covered against torch semantics by tests/test_networks.py's
generator parity and tests/test_norm.py's InstanceNorm goldens).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nemar_tpu.ops.conv_fused import (
    block_kernel_supported,
    fused_resblock,
    resblock_reference,
)


def _data(rng, n=2, h=16, w=16, c=128, dtype=np.float32):
    x = rng.standard_normal((n, h, w, c), dtype=np.float32)
    w1 = 0.05 * rng.standard_normal((3, 3, c, c), dtype=np.float32)
    w2 = 0.05 * rng.standard_normal((3, 3, c, c), dtype=np.float32)
    return (jnp.asarray(x, dtype), jnp.asarray(w1, dtype), jnp.asarray(w2, dtype))


def test_supported_shapes():
    assert block_kernel_supported((32, 64, 64, 256))
    assert not block_kernel_supported((1, 63, 64, 256))
    assert not block_kernel_supported((1, 64, 64, 192))


def test_fwd_parity_fp32(rng):
    x, w1, w2 = _data(rng)
    out = fused_resblock(x, w1, w2)
    ref = resblock_reference(x, w1, w2)
    err = float(jnp.max(jnp.abs(out - ref)))
    assert err < 1e-4, f"fwd max err {err}"


def test_bwd_parity_fp32(rng):
    x, w1, w2 = _data(rng, n=2, h=8, w=16, c=128)

    def loss_fused(x, w1, w2):
        o = fused_resblock(x, w1, w2)
        return jnp.mean(o * o)

    def loss_ref(x, w1, w2):
        o = resblock_reference(x, w1, w2)
        return jnp.mean(o * o)

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, w1, w2)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, w1, w2)
    for name, a, b in zip(("dx", "dw1", "dw2"), gf, gr):
        scale = float(jnp.max(jnp.abs(b))) + 1e-12
        err = float(jnp.max(jnp.abs(a - b))) / scale
        assert err < 1e-3, f"{name} rel err {err}"


def test_fwd_parity_bf16(rng):
    x, w1, w2 = _data(rng, dtype=jnp.bfloat16)
    out = fused_resblock(x, w1, w2).astype(jnp.float32)
    ref = resblock_reference(
        x.astype(jnp.float32), w1.astype(jnp.float32), w2.astype(jnp.float32))
    err = float(jnp.max(jnp.abs(out - ref)))
    assert err < 0.15, f"bf16 fwd max err {err}"  # bf16 rounding of unit-scale


def test_bias_is_inert_through_in(rng):
    """IN(conv(x)+b) == IN(conv(x)) — the kernel's no-bias contract."""
    from nemar_tpu.ops.norm import instance_norm

    x = jnp.asarray(rng.standard_normal((1, 8, 8, 128), dtype=np.float32))
    w = jnp.asarray(0.1 * rng.standard_normal((3, 3, 128, 128), dtype=np.float32))
    b = jnp.asarray(rng.standard_normal((128,), dtype=np.float32))
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    y = jax.lax.conv_general_dilated(
        xp, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(
        np.asarray(instance_norm(y + b)), np.asarray(instance_norm(y)),
        atol=1e-5)
