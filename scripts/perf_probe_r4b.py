#!/usr/bin/env python
"""Probe r4b: STN-decoder small-channel convs — im2col-dot vs direct.

r3p measured the UNet decoder at ~3x its conv-FLOP floor (k3 convs at
32-64 channels on 128-256^2 maps quarter-fill the MXU's 128 lanes).
r3r killed the conv-then-d2s rewrite. The remaining layout idea: im2col
via lax.conv_general_dilated_patches (XLA materializes the 9x patch
tensor once, HBM-bandwidth cost) followed by ONE fat dot with
K = 9*Cin = 288-576 (full contraction lanes) and M = Cout.

Measures fwd and fwd+bwd (grad wrt x and w) at the two shallow decoder
shapes, direct vs patches, one window, scalar readbacks.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nemar_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()


def timeit(f, args, steps=32, trials=3, label=""):
    g = jax.jit(f)
    g(*args).block_until_ready()
    float(g(*args))
    best = float("inf")
    for _ in range(trials):
        t0 = time.time()
        s = 0.0
        for _ in range(steps):
            s = g(*args)
        float(s)
        best = min(best, (time.time() - t0) / steps)
    print(f"{label}: {best * 1e3:.3f} ms", flush=True)
    return best


def conv_direct(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_patches(x, w):
    n, h, wd, ci = x.shape
    co = w.shape[-1]
    p = jax.lax.conv_general_dilated_patches(
        x, (3, 3), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))  # (N,H,W,9*Ci)
    # patches order: Ci-major then tap (lax docs: feature dim = ci*9? it is
    # spatial-major: [ci, kh, kw] flattened with ci slowest) — match by
    # reshaping w accordingly; parity is asserted below before timing.
    wf = jnp.transpose(w, (2, 0, 1, 3)).reshape(9 * ci, co)
    return jax.lax.dot_general(
        p.reshape(n * h * wd, 9 * ci), wf, (((1,), (0,)), ((), ())),
        preferred_element_type=x.dtype).reshape(n, h, wd, co)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.RandomState(0)
    shapes = [
        (48, 256, 256, 64, 32),   # shallowest decoder conv (skip-concat in)
        (48, 128, 128, 96, 32),   # second level (64+32 concat)
        (48, 64, 64, 192, 64),    # third level
    ]
    out = {}
    for (n, h, wd, ci, co) in shapes:
        x = jnp.asarray(rng.randn(n, h, wd, ci), jnp.bfloat16)
        w = jnp.asarray(rng.randn(3, 3, ci, co) * 0.05, jnp.bfloat16)
        # parity check (fp32, small slice)
        xa = x[:1].astype(jnp.float32)
        wa = w.astype(jnp.float32)
        d = np.abs(np.asarray(conv_direct(xa, wa))
                   - np.asarray(conv_patches(xa, wa))).max()
        print(f"shape {n}x{h}x{wd}x{ci}->{co}: parity {d:.2e}", flush=True)
        assert d < 1e-2, d

        key = f"{h}x{ci}to{co}"
        fd = lambda x_, w_: jnp.sum(conv_direct(x_, w_).astype(jnp.float32))
        fp = lambda x_, w_: jnp.sum(conv_patches(x_, w_).astype(jnp.float32))
        out[key] = {
            "direct_fwd": timeit(fd, (x, w), label=f"{key} direct fwd") * 1e3,
            "patch_fwd": timeit(fp, (x, w), label=f"{key} patches fwd") * 1e3,
            "direct_fb": timeit(
                lambda x_, w_: sum(jnp.sum(jnp.square(t).astype(jnp.float32))
                                   for t in jax.grad(fd, argnums=(0, 1))(x_, w_)),
                (x, w), label=f"{key} direct fwd+bwd") * 1e3,
            "patch_fb": timeit(
                lambda x_, w_: sum(jnp.sum(jnp.square(t).astype(jnp.float32))
                                   for t in jax.grad(fp, argnums=(0, 1))(x_, w_)),
                (x, w), label=f"{key} patches fwd+bwd") * 1e3,
        }

    import json
    print(json.dumps(out))


if __name__ == "__main__":
    main()
