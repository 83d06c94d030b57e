"""Shape/behavior tests for the network zoo (reference had none — SURVEY §5)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nemar_tpu.models.networks import (
    NLayerDiscriminator,
    PixelDiscriminator,
    ResnetGenerator,
    UnetGenerator,
    define_D,
    define_G,
    gan_loss,
    get_lr_multiplier_fn,
)


class TestGenerators:
    def test_resnet_shapes(self):
        g = ResnetGenerator(output_nc=3, ngf=8, n_blocks=2)
        x = jnp.zeros((2, 32, 32, 1))
        params = g.init(jax.random.key(0), x)
        y = g.apply(params, x)
        assert y.shape == (2, 32, 32, 3)
        assert np.all(np.abs(np.asarray(y)) <= 1.0)  # tanh head

    def test_unet_shapes(self):
        g = UnetGenerator(output_nc=3, num_downs=5, ngf=8)
        x = jnp.zeros((1, 32, 32, 3))
        params = g.init(jax.random.key(0), x)
        y = g.apply(params, x)
        assert y.shape == (1, 32, 32, 3)

    def test_define_g_registry(self):
        for name in ["resnet_9blocks", "resnet_6blocks", "unet_128", "unet_256"]:
            assert define_G(3, 3, 4, name) is not None
        with pytest.raises(NotImplementedError):
            define_G(3, 3, 4, "nope")


class TestDiscriminators:
    def test_patchgan_shapes(self):
        d = NLayerDiscriminator(ndf=8, n_layers=3)
        x = jnp.zeros((2, 64, 64, 3))
        params = d.init(jax.random.key(0), x)
        y = d.apply(params, x)
        # strides 2,2,2,1,1 with k=4 p=1: 64 -> 32 -> 16 -> 8 -> 7 -> 6
        assert y.shape == (2, 6, 6, 1)

    def test_pixel_d(self):
        d = PixelDiscriminator(ndf=8)
        x = jnp.zeros((1, 16, 16, 3))
        params = d.init(jax.random.key(0), x)
        assert d.apply(params, x).shape == (1, 16, 16, 1)

    def test_define_d_registry(self):
        for name in ["basic", "n_layers", "pixel"]:
            assert define_D(3, 4, name) is not None


class TestGanLoss:
    def test_lsgan_is_mse(self):
        pred = jnp.asarray([0.3, 0.7])
        np.testing.assert_allclose(
            float(gan_loss(pred, True, "lsgan")),
            float(jnp.mean((pred - 1.0) ** 2)),
            rtol=1e-6,
        )
        np.testing.assert_allclose(
            float(gan_loss(pred, False, "lsgan")),
            float(jnp.mean(pred**2)),
            rtol=1e-6,
        )

    def test_vanilla_matches_torch_bce(self):
        torch = pytest.importorskip("torch")
        pred = np.asarray([-1.2, 0.0, 2.5], dtype=np.float32)
        ref = torch.nn.BCEWithLogitsLoss()(
            torch.from_numpy(pred), torch.ones(3)
        ).item()
        np.testing.assert_allclose(
            float(gan_loss(jnp.asarray(pred), True, "vanilla")), ref, rtol=1e-4
        )


class TestSchedulers:
    def test_linear_formula(self):
        class Opt:
            lr_policy = "linear"
            n_epochs = 100
            n_epochs_decay = 100
            epoch_count = 1

        fn = get_lr_multiplier_fn(Opt())
        # template: 1 - max(0, epoch + epoch_count - n_epochs) / (n_decay + 1)
        assert fn(1) == 1.0
        assert fn(99) == 1.0
        np.testing.assert_allclose(fn(100), 1.0 - 1 / 101)
        np.testing.assert_allclose(fn(199), 1.0 - 100 / 101)
