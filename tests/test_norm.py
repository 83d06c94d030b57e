"""Instance-norm parity vs torch InstanceNorm2d + Pallas fused-kernel check."""

import numpy as np
import pytest

import jax.numpy as jnp

from nemar_tpu.ops.norm import instance_norm, instance_norm_act

pytestmark = pytest.mark.quick  # fast confidence tier (VERDICT r4 #9)

torch = pytest.importorskip("torch")


class TestInstanceNorm:
    def test_survey_goldens(self):
        # SURVEY A.4 golden channels.
        x = jnp.asarray([[1.0, 2.0], [3.0, 4.0]]).reshape(1, 2, 2, 1)
        out = instance_norm(x)
        np.testing.assert_allclose(
            np.asarray(out).reshape(2, 2),
            [[-1.3416, -0.4472], [0.4472, 1.3416]],
            atol=1e-4,
        )
        x = jnp.asarray([[0.0, 0.0], [1.0, 3.0]]).reshape(1, 2, 2, 1)
        out = instance_norm(x)
        np.testing.assert_allclose(
            np.asarray(out).reshape(2, 2),
            [[-0.8165, -0.8165], [0.0, 1.6330]],
            atol=1e-4,
        )

    def test_matches_torch(self, rng):
        x = rng.standard_normal((2, 5, 7, 6), dtype=np.float32) * 3 + 1
        ours = instance_norm(jnp.asarray(x))
        # torch is NCHW, affine=False, track_running_stats=False, eps=1e-5
        tx = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        ref = torch.nn.InstanceNorm2d(6)(tx).numpy()
        np.testing.assert_allclose(
            np.asarray(ours), np.transpose(ref, (0, 2, 3, 1)), atol=1e-5
        )

    @pytest.mark.parametrize("act", ["none", "relu", "leaky_relu"])
    def test_pallas_fused_matches_xla(self, rng, act):
        # Interpret-friendly CPU check; shapes chosen to exercise chunking.
        x = jnp.asarray(rng.standard_normal((2, 16, 24, 8), dtype=np.float32))
        ref = instance_norm_act(x, act=act, impl="xla")
        got = instance_norm_act(x, act=act, impl="pallas")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    @pytest.mark.parametrize("act", ["none", "relu", "leaky_relu"])
    def test_pallas_backward_matches_xla(self, rng, act):
        import jax

        x = jnp.asarray(rng.standard_normal((2, 8, 12, 4), dtype=np.float32) * 2)
        ct = jnp.asarray(rng.standard_normal((2, 8, 12, 4), dtype=np.float32))

        def loss(v, impl):
            return jnp.sum(instance_norm_act(v, act=act, impl=impl) * ct)

        d_p = jax.grad(lambda v: loss(v, "pallas"))(x)
        d_x = jax.grad(lambda v: loss(v, "xla"))(x)
        np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_x), atol=1e-4)
