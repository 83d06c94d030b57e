"""Fused ConvTranspose+IN+ReLU kernel parity (interpret mode on CPU)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nemar_tpu.ops.attic.convt_fused import (
    convt_in_reference,
    fused_convt_in,
)

# archive tier: parity coverage for a measured-losing kernel (ops/attic)
pytestmark = pytest.mark.attic


def _data(rng, n=2, h=8, w=8, ci=128, co=128, dtype=np.float32):
    x = rng.standard_normal((n, h, w, ci), dtype=np.float32)
    wk = 0.05 * rng.standard_normal((3, 3, ci, co), dtype=np.float32)
    return jnp.asarray(x, dtype), jnp.asarray(wk, dtype)


def test_reference_matches_flax(rng):
    """convt_in_reference == flax ConvTranspose(k3,s2,SAME) + IN + relu."""
    from nemar_tpu.ops.norm import instance_norm

    x, wk = _data(rng)
    mod = nn.ConvTranspose(128, (3, 3), strides=(2, 2), padding="SAME",
                           use_bias=False)
    y = mod.apply({"params": {"kernel": wk}}, x)
    ref = jnp.maximum(instance_norm(y), 0.0)
    got = convt_in_reference(x, wk)
    err = float(jnp.max(jnp.abs(got - ref)))
    assert err < 1e-5, f"reference vs flax max err {err}"


def test_fwd_parity_fp32(rng):
    x, wk = _data(rng)
    out = fused_convt_in(x, wk)
    ref = convt_in_reference(x, wk)
    assert out.shape == (2, 16, 16, 128)
    err = float(jnp.max(jnp.abs(out - ref)))
    assert err < 1e-4, f"fwd max err {err}"


def test_fwd_parity_no_act(rng):
    x, wk = _data(rng, co=256)
    out = fused_convt_in(x, wk, 1e-5, "none")
    ref = convt_in_reference(x, wk, 1e-5, "none")
    err = float(jnp.max(jnp.abs(out - ref)))
    assert err < 1e-4, f"fwd max err {err}"


def test_bwd_parity_fp32(rng):
    x, wk = _data(rng, n=2, h=8, w=8)

    def lf(x, wk):
        o = fused_convt_in(x, wk)
        return jnp.mean(o * o)

    def lr(x, wk):
        o = convt_in_reference(x, wk)
        return jnp.mean(o * o)

    gf = jax.grad(lf, argnums=(0, 1))(x, wk)
    gr = jax.grad(lr, argnums=(0, 1))(x, wk)
    for name, a, b in zip(("dx", "dw"), gf, gr):
        scale = float(jnp.max(jnp.abs(b))) + 1e-12
        err = float(jnp.max(jnp.abs(a - b))) / scale
        assert err < 1e-3, f"{name} rel err {err}"


def test_fwd_parity_bf16(rng):
    x, wk = _data(rng, dtype=jnp.bfloat16)
    out = fused_convt_in(x, wk).astype(jnp.float32)
    ref = convt_in_reference(x.astype(jnp.float32), wk.astype(jnp.float32))
    err = float(jnp.max(jnp.abs(out - ref)))
    assert err < 0.15, f"bf16 fwd max err {err}"
