"""pix2pix / cycle_gan / test model family coverage."""

import numpy as np
import pytest

import jax.numpy as jnp

from nemar_tpu.models import create_model, find_model_using_name
from nemar_tpu.options import TrainOptions, TestOptions


def _opt(tmp_path, model, extra=None):
    args = [
        "--dataroot", "__synthetic__", "--name", f"t_{model}", "--model", model,
        "--checkpoints_dir", str(tmp_path / "ckpt"),
        "--dataset_mode", "synthetic",
        "--crop_size", "32", "--load_size", "32",
        "--batch_size", "8", "--ngf", "8", "--ndf", "8",
        "--synthetic_size", "8",
    ] + (extra or [])
    return TrainOptions().parse(args)


def _batch(opt, rng, nc_a=None, nc_b=None):
    n, s = opt.batch_size, opt.crop_size
    return {
        "A": rng.standard_normal((n, s, s, nc_a or opt.input_nc), dtype=np.float32) * 0.5,
        "B": rng.standard_normal((n, s, s, nc_b or opt.output_nc), dtype=np.float32) * 0.5,
        "A_paths": ["x"] * n,
    }


def test_registry_finds_all_families():
    for name in ["nemar", "pix2pix", "cycle_gan", "test"]:
        assert find_model_using_name(name) is not None


def test_pix2pix_step(tmp_path, rng):
    opt = _opt(tmp_path, "pix2pix", ["--input_nc", "1", "--output_nc", "3"])
    assert opt.netG == "unet_256" and opt.gan_mode == "vanilla"  # template defaults
    opt.netG = "resnet_6blocks"  # small net for the test
    model = create_model(opt)
    model.setup(opt)
    model.set_input(_batch(opt, rng))
    model.optimize_parameters()
    losses = model.get_current_losses()
    assert set(losses) == {"G_GAN", "G_L1", "D_real", "D_fake"}
    assert all(np.isfinite(v) for v in losses.values())
    model.forward()
    assert model.get_current_visuals()["fake_B"].shape == (8, 32, 32, 3)


def test_cycle_gan_step_and_pool(tmp_path, rng):
    opt = _opt(tmp_path, "cycle_gan",
               ["--input_nc", "3", "--output_nc", "3", "--pool_size", "16",
                "--netG", "resnet_6blocks"])
    model = create_model(opt)
    model.setup(opt)
    model.set_input(_batch(opt, rng))
    model.optimize_parameters()
    losses = model.get_current_losses()
    assert set(losses) == {"D_A", "G_A", "cycle_A", "idt_A",
                           "D_B", "G_B", "cycle_B", "idt_B"}
    assert all(np.isfinite(v) for v in losses.values())
    assert int(model.state.pool_A.count) == 8
    model.forward()
    vis = model.get_current_visuals()
    assert set(vis) == {"real_A", "fake_B", "rec_A", "real_B", "fake_A", "rec_B"}


def test_cycle_gan_rejects_mismatched_nc(tmp_path):
    opt = _opt(tmp_path, "cycle_gan", ["--input_nc", "1", "--output_nc", "3"])
    with pytest.raises(ValueError):
        create_model(opt)


def test_test_model_inference(tmp_path, rng):
    # train a pix2pix G briefly, then run it through --model test
    opt = _opt(tmp_path, "pix2pix", ["--input_nc", "3", "--output_nc", "3",
                                     "--name", "p2p", "--netG", "resnet_6blocks"])
    # (explicit --netG overrides the unet_256 template default here)
    model = create_model(opt)
    model.setup(opt)
    model.set_input(_batch(opt, rng))
    model.optimize_parameters()
    model.save_networks("latest")

    targs = [
        "--dataroot", "__synthetic__", "--name", "p2p", "--model", "test",
        "--checkpoints_dir", str(tmp_path / "ckpt"),
        "--dataset_mode", "synthetic", "--crop_size", "32", "--load_size", "32",
        "--ngf", "8", "--netG", "resnet_6blocks",
        "--input_nc", "3", "--output_nc", "3", "--synthetic_size", "4",
    ]
    topt = TestOptions().parse(targs)
    tmodel = create_model(topt)
    tmodel.setup(topt)
    # params came from the pix2pix checkpoint
    np.testing.assert_allclose(
        np.asarray(jnp.ravel(
            list(tmodel.state.params_G["params"].values())[0]["kernel"])[:5]),
        np.asarray(jnp.ravel(
            list(model.state.params_G["params"].values())[0]["kernel"])[:5]),
    )
    tmodel.set_input({"A": rng.standard_normal((1, 32, 32, 3), dtype=np.float32),
                      "A_paths": ["x"]})
    tmodel.test()
    assert tmodel.get_current_visuals()["fake"].shape == (1, 32, 32, 3)
