"""Parity tests for the warp core against the torch CPU oracle.

Golden values in TestSurveyGoldens are the fp64 tables from SURVEY.md
Appendix A (executed against torch 2.13.0+cpu); the randomized tests call
torch directly as the oracle.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nemar_tpu.ops.warp import (
    affine_grid,
    compose_flows,
    grid_sample,
    grid_sample_nchw,
    identity_grid,
    warp_with_flow,
)

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

pytestmark = pytest.mark.quick  # fast confidence tier (VERDICT r4 #9)


GOLDEN_THETA = np.array([[[0.9, 0.1, 0.05], [-0.1, 1.1, -0.05]]], dtype=np.float64)


def _torch_gs(img, grid, mode="bilinear", padding_mode="zeros", align_corners=False):
    ti = torch.from_numpy(np.asarray(img))
    tg = torch.from_numpy(np.asarray(grid))
    return F.grid_sample(
        ti, tg, mode=mode, padding_mode=padding_mode, align_corners=align_corners
    ).numpy()


class TestAffineGrid:
    @pytest.mark.parametrize("align_corners", [False, True])
    @pytest.mark.parametrize("hw", [(4, 4), (5, 7), (16, 12)])
    def test_matches_torch(self, hw, align_corners):
        h, w = hw
        theta = GOLDEN_THETA.astype(np.float32)
        ours = affine_grid(jnp.asarray(theta), (1, 1, h, w), align_corners)
        ref = F.affine_grid(
            torch.from_numpy(theta), (1, 1, h, w), align_corners=align_corners
        ).numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-5)

    def test_identity_grid_centers(self):
        # SURVEY A.1: W=4 ac=False base coords are [-0.75, -0.25, 0.25, 0.75]
        g = identity_grid(4, 4, align_corners=False)
        np.testing.assert_allclose(
            np.asarray(g[0, :, 0]), [-0.75, -0.25, 0.25, 0.75], atol=1e-7
        )
        g = identity_grid(4, 4, align_corners=True)
        np.testing.assert_allclose(
            np.asarray(g[0, :, 0]), [-1.0, -1 / 3, 1 / 3, 1.0], atol=1e-6
        )


class TestSurveyGoldens:
    """Fixed fp64 goldens from SURVEY.md Appendix A.2/A.3."""

    def setup_method(self):
        self.img = np.arange(16, dtype=np.float64).reshape(1, 1, 4, 4)
        self.grid = F.affine_grid(
            torch.from_numpy(GOLDEN_THETA), (1, 1, 4, 4), align_corners=False
        ).numpy()
        self.grid_ac = F.affine_grid(
            torch.from_numpy(GOLDEN_THETA), (1, 1, 4, 4), align_corners=True
        ).numpy()

    def test_acF_zeros(self):
        out = grid_sample_nchw(jnp.asarray(self.img), jnp.asarray(self.grid))
        golden = np.array(
            [
                [0.09, 0.80, 1.33, 1.68],
                [4.20, 4.70, 5.20, 5.70],
                [8.70, 9.20, 9.70, 10.20],
                [9.92, 11.97, 14.20, 13.14],
            ]
        )
        np.testing.assert_allclose(np.asarray(out)[0, 0], golden, atol=1e-5)

    def test_acF_border(self):
        out = grid_sample_nchw(
            jnp.asarray(self.img), jnp.asarray(self.grid), padding_mode="border"
        )
        golden = np.array(
            [
                [0.10, 1.00, 1.90, 2.80],
                [4.20, 4.70, 5.20, 5.70],
                [8.70, 9.20, 9.70, 10.20],
                [12.40, 13.30, 14.20, 14.60],
            ]
        )
        np.testing.assert_allclose(np.asarray(out)[0, 0], golden, atol=1e-5)

    def test_acT_zeros(self):
        out = grid_sample_nchw(
            jnp.asarray(self.img), jnp.asarray(self.grid_ac), align_corners=True
        )
        golden = np.array(
            [
                [0.069375, 0.804375, 1.359375, 1.734375],
                [4.275, 4.775, 5.275, 5.775],
                [8.775, 9.275, 9.775, 10.275],
                [9.590625, 11.615625, 13.820625, 13.5975],
            ]
        )
        np.testing.assert_allclose(np.asarray(out)[0, 0], golden, atol=1e-5)

    def test_acT_border(self):
        out = grid_sample_nchw(
            jnp.asarray(self.img),
            jnp.asarray(self.grid_ac),
            padding_mode="border",
            align_corners=True,
        )
        np.testing.assert_allclose(
            np.asarray(out)[0, 0, 0], [0.075, 0.975, 1.875, 2.775], atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(out)[0, 0, 3], [12.375, 13.275, 14.175, 14.70], atol=1e-6
        )

    def test_backward_goldens(self):
        """SURVEY A.3: sum-loss gradients, ac=False, zeros."""

        def loss(img, grid):
            return jnp.sum(grid_sample_nchw(img, grid))

        dimg, dgrid = jax.grad(loss, argnums=(0, 1))(
            jnp.asarray(self.img), jnp.asarray(self.grid)
        )
        golden_dimg = np.array(
            [
                [0.81, 1.05, 0.99, 0.75],
                [0.80, 1.01, 1.05, 0.84],
                [0.63, 1.07, 1.01, 0.98],
                [0.55, 0.98, 1.07, 1.01],
            ]
        )
        np.testing.assert_allclose(np.asarray(dimg)[0, 0], golden_dimg, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(dgrid)[0, 0, :, 0], [1.8, 1.6, 1.4, 1.2], atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(dgrid)[0, 0, :, 1], [0.2, 2.0, 3.8, 5.6], atol=1e-6
        )


class TestRandomizedParity:
    @pytest.mark.parametrize("impl", ["xla", "mm"])
    @pytest.mark.parametrize("padding_mode", ["zeros", "border", "reflection"])
    @pytest.mark.parametrize("align_corners", [False, True])
    @pytest.mark.parametrize("mode", ["bilinear", "nearest"])
    def test_forward(self, rng, mode, padding_mode, align_corners, impl):
        img = rng.standard_normal((2, 3, 13, 17), dtype=np.float32)
        # Grid covering in-bounds and far out-of-bounds samples.
        grid = (rng.standard_normal((2, 9, 11, 2)) * 1.4).astype(np.float32)
        ours = grid_sample_nchw(
            jnp.asarray(img),
            jnp.asarray(grid),
            mode=mode,
            padding_mode=padding_mode,
            align_corners=align_corners,
            impl=impl,
        )
        ref = _torch_gs(img, grid, mode, padding_mode, align_corners)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=5e-6)

    @pytest.mark.parametrize("padding_mode", ["zeros", "border"])
    def test_mm_backward_matches_torch(self, rng, padding_mode):
        """The matmul path's grads (transposed matmuls) vs torch oracle."""
        img = rng.standard_normal((1, 2, 8, 8), dtype=np.float32)
        grid = (rng.standard_normal((1, 6, 6, 2)) * 0.9).astype(np.float32)
        ct = rng.standard_normal((1, 2, 6, 6), dtype=np.float32)

        def loss(i, g):
            return jnp.sum(
                grid_sample_nchw(i, g, padding_mode=padding_mode, impl="mm")
                * jnp.asarray(ct)
            )

        dimg, dgrid = jax.grad(loss, argnums=(0, 1))(
            jnp.asarray(img), jnp.asarray(grid)
        )
        ti = torch.from_numpy(img).requires_grad_(True)
        tg = torch.from_numpy(grid).requires_grad_(True)
        out = F.grid_sample(
            ti, tg, mode="bilinear", padding_mode=padding_mode, align_corners=False
        )
        (out * torch.from_numpy(ct)).sum().backward()
        np.testing.assert_allclose(np.asarray(dimg), ti.grad.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(dgrid), tg.grad.numpy(), atol=1e-5)

    @pytest.mark.parametrize("padding_mode", ["zeros", "border"])
    def test_backward_random(self, rng, padding_mode):
        img = rng.standard_normal((1, 2, 8, 8), dtype=np.float32)
        grid = (rng.standard_normal((1, 6, 6, 2)) * 0.9).astype(np.float32)
        ct = rng.standard_normal((1, 2, 6, 6), dtype=np.float32)

        def loss(i, g):
            return jnp.sum(
                grid_sample_nchw(i, g, padding_mode=padding_mode) * jnp.asarray(ct)
            )

        dimg, dgrid = jax.grad(loss, argnums=(0, 1))(
            jnp.asarray(img), jnp.asarray(grid)
        )

        ti = torch.from_numpy(img).requires_grad_(True)
        tg = torch.from_numpy(grid).requires_grad_(True)
        out = F.grid_sample(
            ti, tg, mode="bilinear", padding_mode=padding_mode, align_corners=False
        )
        (out * torch.from_numpy(ct)).sum().backward()
        np.testing.assert_allclose(np.asarray(dimg), ti.grad.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(dgrid), tg.grad.numpy(), atol=1e-5)

    def test_identity_warp_exact(self, rng):
        # SURVEY A.1: identity warp reproduces the input (exact in fp64;
        # the fp32 normalize/unnormalize roundtrip leaves ~1e-6).
        img = rng.standard_normal((1, 1, 6, 6), dtype=np.float32)
        theta = np.array([[[1.0, 0, 0], [0, 1.0, 0]]], dtype=np.float32)
        for ac in (False, True):
            g = affine_grid(jnp.asarray(theta), (1, 1, 6, 6), ac)
            out = grid_sample_nchw(jnp.asarray(img), g, align_corners=ac)
            np.testing.assert_allclose(np.asarray(out), img, atol=1e-5)


class TestFlowHelpers:
    def test_zero_flow_is_identity(self, rng):
        img = jnp.asarray(rng.standard_normal((2, 7, 9, 3), dtype=np.float32))
        flow = jnp.zeros((2, 7, 9, 2))
        out = warp_with_flow(img, flow, impl="xla")
        # fp32 normalize/unnormalize roundtrip leaves ~1e-6 residue.
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)

    def test_compose_matches_sequential_warp(self, rng):
        """warp(img, compose(f2, f1)) ≈ warp(warp(img, f1), f2) for smooth flows."""
        img = jnp.asarray(rng.standard_normal((1, 16, 16, 1), dtype=np.float32))
        # Integer-pixel constant shifts (norm 0.25 == 2 px at S=16): bilinear
        # at integer coords is exact, so sequential == composed in the
        # interior. Non-integer shifts would differ by double-resampling blur.
        f1 = jnp.full((1, 16, 16, 2), 0.25, jnp.float32)
        f2 = jnp.full((1, 16, 16, 2), -0.125, jnp.float32)
        seq = warp_with_flow(warp_with_flow(img, f1, impl="xla"), f2, impl="xla")
        composed = warp_with_flow(img, compose_flows(f2, f1), impl="xla")
        np.testing.assert_allclose(
            np.asarray(seq)[0, 2:-2, 2:-2], np.asarray(composed)[0, 2:-2, 2:-2],
            atol=1e-5,
        )
