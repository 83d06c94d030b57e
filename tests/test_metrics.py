"""Registration metric tests incl. ground-truth flow correctness."""

import numpy as np

import jax.numpy as jnp

from nemar_tpu.data import find_dataset_using_name
from nemar_tpu.options import TrainOptions
from nemar_tpu.ops.warp import identity_grid, grid_sample
from nemar_tpu.utils import metrics as M

import pytest

pytestmark = pytest.mark.quick  # fast confidence tier (VERDICT r4 #9)


class TestPhotometric:
    def test_ncc_self_is_one(self, rng):
        x = rng.standard_normal((2, 8, 8, 3))
        assert abs(M.ncc(x, x) - 1.0) < 1e-9
        assert M.ncc(x, -x) < -0.99

    def test_psnr_identical_inf(self, rng):
        x = rng.standard_normal((4, 4, 1))
        assert M.psnr(x, x) == float("inf")
        assert M.psnr(x, x + 0.1) > M.psnr(x, x + 0.5)


class TestGroundTruthFlow:
    def test_gt_flow_aligns_synthetic_pair(self, tmp_path):
        """Warping synthetic A by the GT field must recover the reference
        geometry (A's channel 0 == 1 - B's channel 0 up to resampling)."""
        args = [
            "--dataroot", "__synthetic__", "--name", "m", "--model", "nemar",
            "--checkpoints_dir", str(tmp_path), "--dataset_mode", "synthetic",
            "--crop_size", "64", "--load_size", "64",
            "--synthetic_size", "4", "--synthetic_misalign", "0.08",
        ]
        opt = TrainOptions().parse(args)
        ds = find_dataset_using_name("synthetic")(opt)
        item = ds[1]
        a = jnp.asarray(item["A"])[None]           # misaligned
        b = np.asarray(item["B"])                   # reference geometry
        gt = M.registration_gt_flow(item["theta_gt"], 64, 64)

        grid = identity_grid(64, 64)[None] + jnp.asarray(gt)[None]
        warped = np.asarray(
            grid_sample(a, grid, padding_mode="border", impl="xla")
        )[0]
        # scene recovered: A channel0 == 1 - B channel0 (interior)
        target = -b[..., 0]  # (1 - scene)*2-1 negated == scene*2-1
        err_aligned = np.abs(warped[8:-8, 8:-8, 0] - target[8:-8, 8:-8]).mean()
        err_unaligned = np.abs(
            np.asarray(a)[0, 8:-8, 8:-8, 0] - target[8:-8, 8:-8]
        ).mean()
        assert err_aligned < 0.05, f"gt flow failed to align: {err_aligned}"
        assert err_aligned < err_unaligned / 3

    def test_epe_zero_for_same_field(self, rng):
        f = rng.standard_normal((8, 8, 2)).astype(np.float32)
        assert M.epe_px(f, f, 8, 8) == 0.0
        f2 = f.copy()
        f2[..., 0] += 2.0 / 8  # one pixel in x
        assert abs(M.epe_px(f, f2, 8, 8) - 1.0) < 1e-5
