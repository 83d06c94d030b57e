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

pytestmark = pytest.mark.quick  # fast confidence tier (VERDICT r4 #9)


def _data(rng, n=2, h=16, w=16, c=128, dtype=np.float32):
    x = rng.standard_normal((n, h, w, c), dtype=np.float32)
    w1 = 0.05 * rng.standard_normal((3, 3, c, c), dtype=np.float32)
    w2 = 0.05 * rng.standard_normal((3, 3, c, c), dtype=np.float32)
    return (jnp.asarray(x, dtype), jnp.asarray(w1, dtype), jnp.asarray(w2, dtype))


def test_supported_shapes():
    assert block_kernel_supported((32, 64, 64, 256))
    assert not block_kernel_supported((1, 63, 64, 256))
    assert not block_kernel_supported((1, 64, 64, 192))


@pytest.mark.parametrize("impl", ["taps", "kstack"])
def test_fwd_parity_fp32(rng, monkeypatch, impl):
    monkeypatch.setenv("NEMAR_FUSED_IMPL", impl)
    x, w1, w2 = _data(rng)
    out = fused_resblock(x, w1, w2)
    ref = resblock_reference(x, w1, w2)
    err = float(jnp.max(jnp.abs(out - ref)))
    assert err < 1e-4, f"fwd max err {err}"


# (impl, bwd): 'legacy' only dispatches on the taps path (kstack/hybrid
# have their own fused adjoint), so it is covered there — ADVICE r4 #5.
@pytest.mark.parametrize("impl,bwd", [
    ("taps", "planes"), ("taps", "legacy"), ("kstack", "planes"),
    ("hybrid", "planes")])
def test_bwd_parity_fp32(rng, monkeypatch, impl, bwd):
    monkeypatch.setenv("NEMAR_FUSED_IMPL", impl)
    monkeypatch.setenv("NEMAR_FUSED_BWD", bwd)
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


@pytest.mark.parametrize("impl", ["pallas", "pallas_all"])
def test_generator_param_interchange(rng, impl):
    """ResnetGenerator(block_impl=pallas*) loads XLA-branch params and
    reproduces its output (checkpoint compatibility + end-to-end parity).

    Uses 128-channel trunk (ngf=32, 2 downs -> C=128) at 32x32 input so
    both the fused ResNet blocks AND the fused ConvTranspose decoder run
    their Pallas kernels (interpret mode on CPU).
    """
    from nemar_tpu.models.networks import ResnetGenerator

    x = jnp.asarray(rng.standard_normal((1, 32, 32, 1), dtype=np.float32))
    g_x = ResnetGenerator(3, 32, 2, 2, "instance", False, "xla")
    g_p = ResnetGenerator(3, 32, 2, 2, "instance", False, "xla",
                          block_impl=impl)
    px = g_x.init(jax.random.key(0), x)
    pp = g_p.init(jax.random.key(0), x)
    assert jax.tree.structure(px) == jax.tree.structure(pp)
    assert [v.shape for v in jax.tree.leaves(px)] == \
        [v.shape for v in jax.tree.leaves(pp)]
    out_x = g_x.apply(px, x)
    out_p = g_p.apply(px, x)  # XLA-branch params through the Pallas path
    err = float(jnp.max(jnp.abs(out_x - out_p)))
    # bias is inert through IN, so only numeric noise differs
    assert err < 1e-3, f"generator parity err {err}"


def test_generator_param_interchange_grads(rng):
    from nemar_tpu.models.networks import ResnetGenerator

    x = jnp.asarray(rng.standard_normal((1, 32, 32, 1), dtype=np.float32))
    g_x = ResnetGenerator(3, 32, 2, 2, "instance", False, "xla")
    g_p = ResnetGenerator(3, 32, 2, 2, "instance", False, "xla",
                          block_impl="pallas_all")
    px = g_x.init(jax.random.key(0), x)

    gx = jax.grad(lambda p: jnp.mean(jnp.square(g_x.apply(p, x))))(px)
    gp = jax.grad(lambda p: jnp.mean(jnp.square(g_p.apply(p, x))))(px)
    flat_x = jax.tree.leaves_with_path(gx)
    flat_p = {jax.tree_util.keystr(k): v for k, v in jax.tree.leaves_with_path(gp)}
    for k, vx in flat_x:
        ks = jax.tree_util.keystr(k)
        vp = flat_p[ks]
        # IN-followed conv biases have ~zero grad on BOTH paths (exactly
        # zero on pallas, numeric noise on XLA); the final conv's bias
        # (tanh head, no IN) must genuinely match. The per-leaf scale
        # floor of 1e-5 absorbs the zero-grad cases.
        diff = float(jnp.max(jnp.abs(vp - vx)))
        rel = diff / (float(jnp.max(jnp.abs(vx))) + 1e-12)
        assert diff < 1e-6 or rel < 5e-3, f"{ks} grad err {diff} (rel {rel})"
