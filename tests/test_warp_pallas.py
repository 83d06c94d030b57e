"""Pallas warp kernel tests (interpret mode on CPU) vs the XLA reference.

Shapes follow the kernel's support envelope (W % 128 == 0, rows % 8 == 0);
the torch-parity of the XLA reference is established in test_warp.py, so
agreement with it transfers torch parity to the kernel.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nemar_tpu.ops.warp import grid_sample, identity_grid, _grid_sample_xla
from nemar_tpu.ops import warp_pallas


def _mk(rng, n=2, h=32, w=128, c=3, disp=0.05):
    img = jnp.asarray(rng.standard_normal((n, h, w, c), dtype=np.float32))
    flow = jnp.asarray(
        (rng.standard_normal((n, h, w, 2)) * disp).astype(np.float32)
    )
    grid = identity_grid(h, w)[None] + flow
    return img, grid


class TestForward:
    @pytest.mark.parametrize("padding_mode", ["zeros", "border", "reflection"])
    def test_matches_xla(self, rng, padding_mode):
        img, grid = _mk(rng)
        ref = _grid_sample_xla(img, grid, "bilinear", padding_mode, False)
        got = warp_pallas.grid_sample_pallas(img, grid, padding_mode=padding_mode)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def test_align_corners(self, rng):
        img, grid = _mk(rng, c=1)
        ref = _grid_sample_xla(img, grid, "bilinear", "zeros", True)
        got = warp_pallas.grid_sample_pallas(img, grid, align_corners=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def test_identity_flow(self, rng):
        img, _ = _mk(rng)
        grid = identity_grid(32, 128)[None] + jnp.zeros((2, 32, 128, 2))
        got = warp_pallas.grid_sample_pallas(img, grid)
        np.testing.assert_allclose(np.asarray(got), np.asarray(img), atol=1e-5)

    def test_big_displacement_falls_back_exact(self, rng):
        """Rotation-scale warp exceeds the slab -> cond picks the mm branch."""
        img, _ = _mk(rng, h=64, w=128, c=1)
        theta = jnp.asarray([[[0.0, 1.0, 0.0], [-1.0, 0.0, 0.0]]] * 2)
        from nemar_tpu.ops.warp import affine_grid

        grid = affine_grid(theta, (2, 1, 64, 128))
        ref = _grid_sample_xla(img, grid, "bilinear", "zeros", False)
        got = warp_pallas.grid_sample_pallas(img, grid, max_disp_px=4)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def test_unsupported_shape_routes_to_mm(self, rng):
        img = jnp.asarray(rng.standard_normal((1, 13, 17, 2), dtype=np.float32))
        grid = identity_grid(13, 17)[None] * 0.9
        ref = _grid_sample_xla(img, grid, "bilinear", "zeros", False)
        got = warp_pallas.grid_sample_pallas(img, grid)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


class TestBackward:
    @pytest.mark.parametrize("padding_mode", ["zeros", "border"])
    def test_grads_match_xla(self, rng, padding_mode):
        img, grid = _mk(rng, n=1, h=16, w=128, c=2)
        ct = jnp.asarray(rng.standard_normal((1, 16, 128, 2), dtype=np.float32))

        def loss_pallas(i, g):
            out = warp_pallas.grid_sample_pallas(i, g, padding_mode=padding_mode)
            return jnp.sum(out * ct)

        def loss_xla(i, g):
            return jnp.sum(
                _grid_sample_xla(i, g, "bilinear", padding_mode, False) * ct
            )

        d1 = jax.grad(loss_pallas, argnums=(0, 1))(img, grid)
        d2 = jax.grad(loss_xla, argnums=(0, 1))(img, grid)
        np.testing.assert_allclose(np.asarray(d1[0]), np.asarray(d2[0]), atol=1e-4)
        np.testing.assert_allclose(np.asarray(d1[1]), np.asarray(d2[1]), atol=1e-4)

    def test_grads_through_flow_warp(self, rng):
        """Full deformable-STN-style use: grads through identity+flow grid."""
        img, _ = _mk(rng, n=1, h=16, w=128, c=1)
        flow = jnp.asarray(
            (rng.standard_normal((1, 16, 128, 2)) * 0.03).astype(np.float32)
        )

        def loss(fl, impl):
            grid = identity_grid(16, 128)[None] + fl
            out = grid_sample(img, grid, impl=impl)
            return jnp.mean(jnp.square(out))

        d1 = jax.grad(lambda f: loss(f, "pallas"))(flow)
        d2 = jax.grad(lambda f: loss(f, "xla"))(flow)
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-4)


class TestShiftForward:
    """shift-gather forward (probe r4c, VERDICT r3 item 9 adoption): lane
    rolls replace the (W x P) one-hot x-stage when displacements fit the
    bound; exactness comes from the dynamic cond + the in-frame mask."""

    @staticmethod
    def _mk_bounded(rng, n=2, h=32, w=128, c=3, max_px=6.0):
        """Uniform flow strictly inside the shift bound (a randn field's
        tail exceeds 8 px at sigma 3.2 over 8k samples — the dynamic cond
        then legitimately falls back and the test exercises nothing)."""
        img = jnp.asarray(rng.standard_normal((n, h, w, c), dtype=np.float32))
        flow = jnp.stack([
            jnp.asarray(rng.uniform(-1, 1, (n, h, w)) * max_px * 2 / w),
            jnp.asarray(rng.uniform(-1, 1, (n, h, w)) * max_px * 2 / h),
        ], axis=-1).astype(jnp.float32)
        return img, identity_grid(h, w)[None] + flow

    @pytest.mark.parametrize("padding_mode", ["zeros", "border"])
    def test_matches_xla(self, rng, padding_mode):
        img, grid = self._mk_bounded(rng)
        ref = _grid_sample_xla(img, grid, "bilinear", padding_mode, False)
        got = warp_pallas.grid_sample_pallas(
            img, grid, padding_mode=padding_mode, shift_bound=8)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5)

    def test_shift_branch_actually_runs(self, rng, monkeypatch):
        """Poison the one-hot forward: a bounded warp must still be exact,
        proving the cond selected the shift branch at runtime."""
        img, grid = self._mk_bounded(rng, c=1)
        ref = _grid_sample_xla(img, grid, "bilinear", "zeros", False)
        def poisoned(img_p, x_row, y_row, rowstart, *, s, mxu_bf16=False):
            n, c = img_p.shape[0], img_p.shape[1]
            nt, p = x_row.shape[1], x_row.shape[3]
            return jnp.zeros((n, nt, c, 1, p), jnp.float32)

        monkeypatch.setattr(warp_pallas, "_fwd_pallas", poisoned)
        got = warp_pallas.grid_sample_pallas(img, grid, shift_bound=8)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5)

    def test_border_band_exact(self, rng):
        """Constant flow just inside the bound pushes edge taps out of
        frame — the roll wraps modulo W there; the in-frame mask must
        zero the wrapped garbage to give exact 'zeros' semantics."""
        img, _ = _mk(rng, c=2)
        h, w = 32, 128
        flow = jnp.concatenate([
            jnp.full((1, h, w, 1), 6.5 * 2 / w),   # +6.5 px in x
            jnp.full((1, h, w, 1), -5.5 * 2 / h),  # -5.5 px in y
        ], axis=-1)
        grid = identity_grid(h, w)[None] + flow
        img1 = img[:1]
        ref = _grid_sample_xla(img1, grid, "bilinear", "zeros", False)
        got = warp_pallas.grid_sample_pallas(img1, grid, shift_bound=8)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5)

    def test_exceeding_bound_falls_back_exact(self, rng):
        img, _ = _mk(rng, c=1)
        h, w = 32, 128
        flow = jnp.concatenate([
            jnp.full((1, h, w, 1), 20.0 * 2 / w),  # 20 px > bound 8
            jnp.zeros((1, h, w, 1)),
        ], axis=-1)
        grid = identity_grid(h, w)[None] + flow
        ref = _grid_sample_xla(img[:1], grid, "bilinear", "zeros", False)
        got = warp_pallas.grid_sample_pallas(img[:1], grid, shift_bound=8)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5)

    def test_grads_via_shift_impl(self, rng):
        """impl='shift' end-to-end grads (round-5 shift-gather VJP)."""
        img, _ = _mk(rng, n=1, h=16, w=128, c=1)
        flow = jnp.asarray(
            (rng.uniform(-1, 1, (1, 16, 128, 2)) * 0.03).astype(np.float32)
        )

        def loss(fl, impl):
            grid = identity_grid(16, 128)[None] + fl
            out = grid_sample(img, grid, impl=impl)
            return jnp.mean(jnp.square(out))

        d1 = jax.grad(lambda f: loss(f, "shift"))(flow)
        d2 = jax.grad(lambda f: loss(f, "xla"))(flow)
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-4)


class TestShiftBackward:
    """Round-5 shift-gather VJP (VERDICT r4 item 3): the backward rides
    the same 2B+2 lane rolls as the r4c forward — no (W x P) one-hot
    builds, no MXU contractions. Parity vs BOTH the one-hot VJP and XLA
    autodiff, including the out-of-frame band and grad_channels."""

    def test_matches_onehot_vjp(self, rng):
        img, grid = TestShiftForward._mk_bounded(rng, n=1, h=16, w=128, c=3)
        ct = jnp.asarray(rng.standard_normal((1, 16, 128, 3),
                                             dtype=np.float32))

        def loss(i, g, sb):
            out = warp_pallas.grid_sample_pallas(i, g, shift_bound=sb)
            return jnp.sum(out * ct)

        d_sh = jax.grad(loss, argnums=(0, 1))(img, grid, 8)
        d_oh = jax.grad(loss, argnums=(0, 1))(img, grid, 0)
        np.testing.assert_allclose(np.asarray(d_sh[0]), np.asarray(d_oh[0]),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(d_sh[1]), np.asarray(d_oh[1]),
                                   atol=1e-5)

    def test_border_band_grads(self, rng):
        """Constant flow near the bound: edge taps leave the frame, the
        rolls wrap — the in-frame mask must zero BOTH dimg scatter and dx
        taps there (exact 'zeros' gradient semantics)."""
        img, _ = _mk(rng, n=1, c=2)
        h, w = 32, 128
        flow = jnp.concatenate([
            jnp.full((1, h, w, 1), 6.5 * 2 / w),
            jnp.full((1, h, w, 1), -5.5 * 2 / h),
        ], axis=-1)
        grid = identity_grid(h, w)[None] + flow
        ct = jnp.asarray(rng.standard_normal((1, h, w, 2), dtype=np.float32))

        def loss_sh(i, g):
            return jnp.sum(
                warp_pallas.grid_sample_pallas(i, g, shift_bound=8) * ct)

        def loss_xla(i, g):
            return jnp.sum(
                _grid_sample_xla(i, g, "bilinear", "zeros", False) * ct)

        d1 = jax.grad(loss_sh, argnums=(0, 1))(img, grid)
        d2 = jax.grad(loss_xla, argnums=(0, 1))(img, grid)
        np.testing.assert_allclose(np.asarray(d1[0]), np.asarray(d2[0]),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(d1[1]), np.asarray(d2[1]),
                                   atol=1e-4)

    def test_grad_channels_via_shift(self, rng):
        img, grid = TestShiftForward._mk_bounded(rng, n=1, h=16, w=128, c=4)
        ct = jnp.asarray(rng.standard_normal((1, 16, 128, 4),
                                             dtype=np.float32))

        def loss(i, g, gc):
            out = warp_pallas.grid_sample_pallas(i, g, grad_channels=gc,
                                                 shift_bound=8)
            return jnp.sum(out * ct)

        d_full = jax.grad(loss, argnums=(0, 1))(img, grid, -1)
        d_part = jax.grad(loss, argnums=(0, 1))(img, grid, 2)
        np.testing.assert_allclose(
            np.asarray(d_part[0][..., :2]), np.asarray(d_full[0][..., :2]),
            atol=1e-6)
        assert float(np.abs(np.asarray(d_part[0][..., 2:])).max()) == 0.0
        np.testing.assert_allclose(
            np.asarray(d_part[1]), np.asarray(d_full[1]), atol=1e-6)


class TestGradChannels:
    """grad_channels: d/dimg restricted to the first gc channels (the
    NeMAR multi-warp skips real_A's image scatter — nemar_model
    _forward_parts); grid gradients must stay complete."""

    def test_partial_img_grad(self, rng):
        img, grid = _mk(rng, n=1, h=16, w=128, c=4)
        ct = jnp.asarray(rng.standard_normal((1, 16, 128, 4), dtype=np.float32))

        def loss(i, g, gc):
            out = warp_pallas.grid_sample_pallas(i, g, grad_channels=gc)
            return jnp.sum(out * ct)

        d_full = jax.grad(loss, argnums=(0, 1))(img, grid, -1)
        d_part = jax.grad(loss, argnums=(0, 1))(img, grid, 2)
        # first 2 channels identical, rest exactly zero
        np.testing.assert_allclose(
            np.asarray(d_part[0][..., :2]), np.asarray(d_full[0][..., :2]),
            atol=1e-6)
        assert float(np.abs(np.asarray(d_part[0][..., 2:])).max()) == 0.0
        # grid gradient unaffected
        np.testing.assert_allclose(
            np.asarray(d_part[1]), np.asarray(d_full[1]), atol=1e-6)

    def test_multi_n_grad_imgs(self, rng):
        from nemar_tpu.ops.warp import grid_sample_multi

        a = jnp.asarray(rng.standard_normal((1, 16, 128, 3), dtype=np.float32))
        b = jnp.asarray(rng.standard_normal((1, 16, 128, 1), dtype=np.float32))
        _, grid = _mk(rng, n=1, h=16, w=128, c=1)

        def loss(x, impl, ng):
            wa, wb = grid_sample_multi((x, b), grid, impl=impl,
                                       n_grad_imgs=ng)
            return jnp.mean(jnp.square(wa)) + jnp.mean(jnp.square(wb))

        d_ref = jax.grad(lambda x: loss(x, "xla", -1))(a)
        d_got = jax.grad(lambda x: loss(x, "pallas", 1))(a)
        np.testing.assert_allclose(np.asarray(d_got), np.asarray(d_ref),
                                   atol=1e-4)
