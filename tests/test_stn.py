"""STN behavior tests: identity at init, warp API shape, smoothness term."""

import numpy as np

import jax
import jax.numpy as jnp

from nemar_tpu.models.stn.affine_stn import AffineSTN
from nemar_tpu.models.stn.unet_stn import UnetSTN, smoothness_loss


class TestAffineSTN:
    def test_identity_at_init(self, rng):
        stn = AffineSTN(in_channels=2, ngf=4, n_downs=3)
        a = jnp.asarray(rng.standard_normal((1, 16, 16, 1), dtype=np.float32))
        b = jnp.asarray(rng.standard_normal((1, 16, 16, 1), dtype=np.float32))
        params = stn.init(jax.random.key(0), a, b, (a,))
        (wa,), reg, aux = stn.apply(params, a, b, (a,))
        # Zero-init head -> dtheta == 0 -> identity warp (up to fp32 grid
        # roundtrip) and zero regularizer.
        np.testing.assert_allclose(np.asarray(wa), np.asarray(a), atol=1e-5)
        assert float(reg) == 0.0
        np.testing.assert_allclose(
            np.asarray(aux["theta"])[0], [[1, 0, 0], [0, 1, 0]], atol=0
        )

    def test_warps_multiple_tensors_same_grid(self, rng):
        stn = AffineSTN(in_channels=2, ngf=4, n_downs=2)
        a = jnp.asarray(rng.standard_normal((2, 8, 8, 1), dtype=np.float32))
        b = jnp.asarray(rng.standard_normal((2, 8, 8, 1), dtype=np.float32))
        params = stn.init(jax.random.key(0), a, b, (a, b))
        (wa, wb), _, _ = stn.apply(params, a, b, (a, b))
        assert wa.shape == a.shape and wb.shape == b.shape


class TestUnetSTN:
    def test_identity_at_init(self, rng):
        stn = UnetSTN(in_channels=2, ngf=4, depth=3)
        a = jnp.asarray(rng.standard_normal((1, 16, 16, 1), dtype=np.float32))
        b = jnp.asarray(rng.standard_normal((1, 16, 16, 1), dtype=np.float32))
        params = stn.init(jax.random.key(0), a, b, (a,))
        (wa,), reg, aux = stn.apply(params, a, b, (a,))
        np.testing.assert_allclose(np.asarray(wa), np.asarray(a), atol=1e-5)
        assert float(reg) == 0.0
        np.testing.assert_array_equal(np.asarray(aux["flow"]), 0.0)

    def test_flow_shape_and_grads_flow(self, rng):
        stn = UnetSTN(in_channels=6, ngf=4, depth=3)
        a = jnp.asarray(rng.standard_normal((2, 16, 16, 3), dtype=np.float32))
        b = jnp.asarray(rng.standard_normal((2, 16, 16, 3), dtype=np.float32))
        params = stn.init(jax.random.key(0), a, b, (a,))

        def loss(p):
            (wa,), reg, _ = stn.apply(p, a, b, (a,))
            return jnp.mean(jnp.abs(wa - b)) + reg

        grads = jax.grad(loss)(params)
        total = sum(
            float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads)
        )
        assert total > 0.0  # gradients reach STN params through the warp

    def test_bounded_flow(self, rng):
        stn = UnetSTN(in_channels=2, ngf=4, depth=2, bounded_flow=0.1)
        a = jnp.asarray(rng.standard_normal((1, 8, 8, 1), dtype=np.float32))
        b = jnp.asarray(rng.standard_normal((1, 8, 8, 1), dtype=np.float32))
        params = stn.init(jax.random.key(0), a, b, ())
        _, _, aux = stn.apply(params, a, b, ())
        assert np.all(np.abs(np.asarray(aux["flow"])) <= 0.1)


class TestSmoothness:
    def test_constant_field_zero(self):
        f = jnp.full((1, 8, 8, 2), 0.3)
        assert float(smoothness_loss(f, "l1")) == 0.0
        assert float(smoothness_loss(f, "l2")) == 0.0

    def test_l1_value(self):
        f = jnp.zeros((1, 2, 2, 2)).at[:, 1, :, :].set(1.0)
        # dy: one step of size 1 across all (2 cols, 2 chan) -> mean |dy| = 1
        # dx: zero
        np.testing.assert_allclose(float(smoothness_loss(f, "l1")), 1.0)

    def test_order2_zero_for_affine_field(self):
        # An affine misalignment's flow is linear in (x, y); second
        # differences vanish, so order-2 TV must not penalize it at all
        # (the round-3 256² magnitude-suppression fix).
        ys, xs = jnp.meshgrid(jnp.arange(8.0), jnp.arange(8.0), indexing="ij")
        f = jnp.stack([0.3 * xs - 0.1 * ys + 0.7, 0.05 * xs + 0.2 * ys],
                      axis=-1)[None]
        assert float(smoothness_loss(f, "l1", order=1)) > 0.0
        np.testing.assert_allclose(
            float(smoothness_loss(f, "l1", order=2)), 0.0, atol=1e-6)
        np.testing.assert_allclose(
            float(smoothness_loss(f, "l2", order=2)), 0.0, atol=1e-12)


class TestFactHeads:
    def test_head_impl_fact_equivalence(self):
        """Same params, same flow/reg under xla vs fact heads (+ ckpt-
        compatible trees) — single-head and multiscale."""
        rng = np.random.default_rng(7)
        a = jnp.asarray(rng.standard_normal((1, 16, 16, 1), dtype=np.float32))
        b = jnp.asarray(rng.standard_normal((1, 16, 16, 1), dtype=np.float32))
        for ms in (False, True):
            s_x = UnetSTN(in_channels=2, ngf=4, depth=2, multiscale=ms)
            s_f = UnetSTN(in_channels=2, ngf=4, depth=2, multiscale=ms,
                          head_impl="fact")
            p = s_x.init(jax.random.key(0), a, b, (a,))
            p_f = s_f.init(jax.random.key(0), a, b, (a,))
            assert jax.tree.structure(p) == jax.tree.structure(p_f)
            # zero-init heads -> perturb so the comparison is non-trivial
            p = jax.tree.map(
                lambda v: v + 0.01 * np.random.default_rng(1).standard_normal(
                    v.shape).astype(v.dtype), p)
            (wx,), rx, auxx = s_x.apply(p, a, b, (a,))
            (wf,), rf, auxf = s_f.apply(p, a, b, (a,))
            np.testing.assert_allclose(np.asarray(auxf["flow"]),
                                       np.asarray(auxx["flow"]),
                                       rtol=2e-5, atol=2e-5)
            np.testing.assert_allclose(np.asarray(wf), np.asarray(wx),
                                       rtol=2e-5, atol=2e-5)
