#!/usr/bin/env python
"""TPU-mode numerical parity: shift VJP vs one-hot VJP vs XLA autodiff.

Interpret-mode parity (tests) exercises the math; this one-off exercises
the MOSAIC LOWERING on the real chip (pltpu.roll semantics, lane fold,
dynamic-slice accumulation). Bounded affine warp at the config-#1 shape.
"""
import os, sys, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from nemar_tpu.utils.compile_cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
from nemar_tpu.ops.warp import affine_grid, grid_sample, _grid_sample_xla

rng = np.random.default_rng(0)
img = jnp.asarray(rng.standard_normal((4, 256, 256, 3), dtype=np.float32))
theta = jnp.asarray([[[0.98, 0.02, 0.01], [-0.02, 1.02, -0.01]]] * 4)
grid = affine_grid(theta, (4, 3, 256, 256))

def loss(i, g, impl):
    return jnp.mean(jnp.square(grid_sample(i, g, impl=impl)))

grads = {}
for impl in ("shift", "pallas", "xla"):
    di, dg = jax.jit(jax.grad(lambda i, g, impl=impl: loss(i, g, impl),
                              argnums=(0, 1)))(img, grid)
    grads[impl] = (np.asarray(di), np.asarray(dg))

out = {}
for a, b in (("shift", "pallas"), ("shift", "xla")):
    ei = float(np.abs(grads[a][0] - grads[b][0]).max())
    eg = float(np.abs(grads[a][1] - grads[b][1]).max())
    out[f"{a}_vs_{b}"] = {"dimg_max_err": ei, "dgrid_max_err": eg}
    assert ei < 1e-4 and eg < 1e-4, (a, b, ei, eg)
print("TPU_PARITY_OK " + json.dumps(out))
