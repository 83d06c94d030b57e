"""Data-layer tests: registry, synthetic pairs, aligned split, loader."""

import numpy as np
import pytest
from PIL import Image

from nemar_tpu.data import create_dataset, find_dataset_using_name
from nemar_tpu.options import TrainOptions

pytestmark = pytest.mark.quick  # fast confidence tier (VERDICT r4 #9)


def _opt(tmp_path, extra=None):
    extra = extra or []
    args = [
        "--dataroot", str(tmp_path / "data"), "--name", "t", "--model", "nemar",
        "--checkpoints_dir", str(tmp_path / "ckpt"),
        "--dataset_mode", "synthetic", "--crop_size", "32", "--load_size", "36",
        "--batch_size", "2",
    ] + extra
    if "--dataset_mode" not in extra:
        args += ["--synthetic_size", "6"]  # flag only exists for synthetic
    return TrainOptions().parse(args)


class TestRegistry:
    def test_find_by_name(self):
        for mode in ["aligned", "unaligned", "single", "synthetic", "multimodal"]:
            assert find_dataset_using_name(mode) is not None

    def test_unknown_raises(self):
        with pytest.raises(ModuleNotFoundError):
            find_dataset_using_name("nope")


class TestSyntheticDataset:
    def test_batches(self, tmp_path):
        opt = _opt(tmp_path)
        loader = create_dataset(opt)
        assert len(loader) == 6
        batches = list(loader)
        assert len(batches) == 3
        b = batches[0]
        assert b["A"].shape == (2, 32, 32, 1)  # nemar default input_nc=1
        assert b["B"].shape == (2, 32, 32, 3)
        assert b["A"].dtype == np.float32
        assert b["A"].min() >= -1.0 and b["A"].max() <= 1.0

    def test_deterministic_per_index(self, tmp_path):
        opt = _opt(tmp_path)
        ds = find_dataset_using_name("synthetic")(opt)
        x1, x2 = ds[3], ds[3]
        np.testing.assert_array_equal(x1["A"], x2["A"])

    def test_misalignment_exists(self, tmp_path):
        opt = _opt(tmp_path)
        ds = find_dataset_using_name("synthetic")(opt)
        item = ds[0]
        # A is the (misaligned, differently-colored) scene; B channel 0 is
        # inverted scene. Without misalignment A[...,0] == 1 - B[...,0].
        a0 = (item["A"][:, :, 0] + 1) / 2
        b0 = (item["B"][:, :, 0] + 1) / 2
        assert np.abs(a0 - (1 - b0)).mean() > 0.01


class TestAlignedDataset:
    def test_split_and_shared_params(self, tmp_path):
        root = tmp_path / "data" / "train"
        root.mkdir(parents=True)
        # AB image: left half bright, right half dark gradient
        ab = np.zeros((40, 80, 3), np.uint8)
        ab[:, :40] = 200
        ab[:, 40:] = np.linspace(0, 100, 40, dtype=np.uint8)[None, :, None]
        Image.fromarray(ab).save(root / "x.png")
        opt = _opt(tmp_path, ["--dataset_mode", "aligned", "--input_nc", "3",
                              "--output_nc", "3", "--crop_size", "32",
                              "--load_size", "36"])
        ds = find_dataset_using_name("aligned")(opt)
        assert len(ds) == 1
        item = ds[0]
        assert item["A"].shape == (32, 32, 3)
        assert item["B"].shape == (32, 32, 3)
        # A comes from the bright half
        assert item["A"].mean() > item["B"].mean()


class TestMultimodalDataset:
    def test_pairs_by_filename(self, tmp_path):
        for side, val in [("trainA", 30), ("trainB", 220)]:
            d = tmp_path / "data" / side
            d.mkdir(parents=True)
            for i in range(3):
                Image.fromarray(
                    np.full((40, 40, 3), val + i, np.uint8)
                ).save(d / f"p{i}.png")
        opt = _opt(tmp_path, ["--dataset_mode", "multimodal", "--crop_size", "32",
                              "--load_size", "36"])
        ds = find_dataset_using_name("multimodal")(opt)
        assert len(ds) == 3
        item = ds[1]
        assert item["A"].shape[-1] == 1  # multimodal defaults input_nc=1
        assert item["B"].shape[-1] == 3
        assert item["B"].mean() > item["A"].mean()


class TestGrainLoader:
    def test_grain_batches_match_contract(self, tmp_path):
        opt = _opt(tmp_path, ["--loader", "grain", "--num_threads", "0"])
        loader = create_dataset(opt)
        batches = list(loader)
        assert len(batches) == 3
        b = batches[0]
        assert b["A"].shape == (2, 32, 32, 1)
        assert b["B"].shape == (2, 32, 32, 3)
        assert b["A"].dtype == np.float32
