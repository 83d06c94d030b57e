"""CHW head-conv kernel parity (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nemar_tpu.ops.attic.conv_head import conv_head

# archive tier: parity coverage for a measured-losing kernel (ops/attic)
pytestmark = pytest.mark.attic


def _direct(x, w):
    xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
    return jax.lax.conv_general_dilated(
        xp, w, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)


def _data(rng, n=2, h=16, w=128, ci=64, co=3, dtype=np.float32):
    x = rng.standard_normal((n, h, w, ci), dtype=np.float32)
    wk = 0.05 * rng.standard_normal((7, 7, ci, co), dtype=np.float32)
    return jnp.asarray(x, dtype), jnp.asarray(wk, dtype)


def test_fwd_parity(rng):
    x, wk = _data(rng)
    out = conv_head(x, wk)
    ref = _direct(x, wk)
    err = float(jnp.max(jnp.abs(out - ref)))
    assert err < 1e-4, f"fwd max err {err}"


def test_bwd_parity(rng):
    x, wk = _data(rng)
    gk = jax.grad(lambda x, w: jnp.mean(jnp.square(conv_head(x, w))),
                  argnums=(0, 1))(x, wk)
    gr = jax.grad(lambda x, w: jnp.mean(jnp.square(_direct(x, w))),
                  argnums=(0, 1))(x, wk)
    for name, a, b in zip(("dx", "dw"), gk, gr):
        scale = float(jnp.max(jnp.abs(b))) + 1e-12
        err = float(jnp.max(jnp.abs(a - b))) / scale
        assert err < 1e-3, f"{name} rel err {err}"


def test_unsupported_falls_back(rng):
    # w=100 not a lane multiple -> direct conv path, still correct
    x, wk = _data(rng, h=16, w=100)
    out = conv_head(x, wk)
    ref = _direct(x, wk)
    assert float(jnp.max(jnp.abs(out - ref))) < 1e-4
