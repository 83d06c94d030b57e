"""Utility-layer tests: image pool semantics, tensor2im, html, mesh."""

import os

import numpy as np

import jax
import jax.numpy as jnp

from nemar_tpu.parallel import make_mesh, shard_batch, batch_sharding
from nemar_tpu.utils.html import HTML
from nemar_tpu.utils.image_pool import init_pool, query_pool
from nemar_tpu.utils.util import tensor2im, save_image, mkdirs

import pytest

pytestmark = pytest.mark.quick  # fast confidence tier (VERDICT r4 #9)


class TestImagePool:
    def test_filling_phase_returns_inputs(self, rng):
        pool = init_pool(8, (4, 4, 1))
        fakes = jnp.asarray(rng.standard_normal((4, 4, 4, 1), dtype=np.float32))
        pool, out = query_pool(pool, fakes, jax.random.key(0))
        np.testing.assert_array_equal(np.asarray(out), np.asarray(fakes))
        assert int(pool.count) == 4
        np.testing.assert_array_equal(np.asarray(pool.images[:4]), np.asarray(fakes))

    def test_full_pool_mixes(self, rng):
        pool = init_pool(4, (2, 2, 1))
        first = jnp.asarray(rng.standard_normal((4, 2, 2, 1), dtype=np.float32))
        pool, _ = query_pool(pool, first, jax.random.key(0))
        assert int(pool.count) == 4
        second = jnp.asarray(rng.standard_normal((4, 2, 2, 1), dtype=np.float32))
        # with many draws, some outputs must come from the old buffer
        seen_old = False
        key = jax.random.key(1)
        for i in range(8):
            key, k = jax.random.split(key)
            _, out = query_pool(pool, second, k)
            for j in range(4):
                o = np.asarray(out[j])
                if not np.allclose(o, np.asarray(second[j])):
                    seen_old = True
                    # returned image must be SOME buffered image
                    matches = [
                        np.allclose(o, np.asarray(pool.images[m])) for m in range(4)
                    ]
                    assert any(matches)
        assert seen_old

    def test_count_caps_at_pool_size(self, rng):
        pool = init_pool(4, (2, 2, 1))
        fakes = jnp.asarray(rng.standard_normal((4, 2, 2, 1), dtype=np.float32))
        key = jax.random.key(0)
        for i in range(3):
            key, k = jax.random.split(key)
            pool, _ = query_pool(pool, fakes, k)
        assert int(pool.count) == 4


class TestTensor2Im:
    def test_range_and_layout(self):
        x = np.zeros((2, 4, 4, 3), np.float32)
        x[0, :, :, 0] = 1.0   # red channel max
        img = tensor2im(x)
        assert img.shape == (4, 4, 3) and img.dtype == np.uint8
        assert img[0, 0, 0] == 255 and img[0, 0, 1] == 127

    def test_grayscale_replicated(self):
        x = np.full((1, 4, 4, 1), -1.0, np.float32)
        img = tensor2im(x)
        assert img.shape == (4, 4, 3)
        assert (img == 0).all()


class TestHtml:
    def test_gallery_roundtrip(self, tmp_path, rng):
        web = tmp_path / "web"
        page = HTML(str(web), "t")
        img = tensor2im(rng.standard_normal((1, 8, 8, 3)).astype(np.float32))
        save_image(img, os.path.join(page.get_image_dir(), "a.png"))
        page.add_header("hdr")
        page.add_images(["a.png"], ["label"], ["a.png"])
        page.save()
        html = (web / "index.html").read_text()
        assert "hdr" in html and "images/a.png" in html


class TestMesh:
    def test_mesh_shapes(self):
        m = make_mesh(-1)
        assert m.shape["data"] == 8 and m.shape["spatial"] == 1
        m = make_mesh(-1, spatial=2)
        assert m.shape["data"] == 4 and m.shape["spatial"] == 2

    def test_spatial_batch_sharding(self, rng):
        m = make_mesh(-1, spatial=2)
        batch = {"A": rng.standard_normal((8, 16, 16, 1), dtype=np.float32)}
        out = shard_batch(m, batch, shard_spatial=True)
        shapes = {s.data.shape for s in out["A"].addressable_shards}
        assert shapes == {(2, 8, 16, 1)}  # batch/4, H/2

    def test_indivisible_batch_replicates(self, rng):
        m = make_mesh(-1)
        out = shard_batch(m, {"A": rng.standard_normal((3, 4, 4, 1), dtype=np.float32)})
        assert out["A"].is_fully_replicated
