#!/usr/bin/env python
"""Probe 9: convT vs exact subpixel rewrite — INTERLEAVED A/B.

The pooled chip's load oscillates 10-100x within minutes, so sequential
best-of-3 probes are garbage. This probe compiles all variants first,
then interleaves single-shot timings round-robin for many rounds and
reports per-variant BEST — both variants sample the same windows.

Run: python scripts/perf_probe_r2i.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from scripts.perf_probe_r2 import log


def main():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    log(f"backend: {jax.default_backend()}")
    B = 32
    rng = np.random.default_rng(0)

    def tsum(t):
        return sum(jnp.sum(v.astype(jnp.float32)) for v in jax.tree.leaves(t))

    def rb(x):
        return np.asarray(jax.tree.leaves(x)[0].astype("float32")).ravel()[:1]

    variants = {}  # name -> (fn, args)
    for cin, cout, hw in ((256, 128, 64), (128, 64, 128)):
        h = jnp.asarray(
            rng.standard_normal((B, hw, hw, cin), dtype=np.float32), jnp.bfloat16
        )
        ct = nn.ConvTranspose(cout, (3, 3), strides=(2, 2), padding="SAME")
        pct = jax.tree.map(
            lambda v: v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v,
            ct.init(jax.random.key(1), h),
        )
        w = np.asarray(pct["params"]["kernel"])  # (3,3,cin,cout) HWIO

        def subpix(w, h):
            def conv(wk, pad_i, pad_j):
                return jax.lax.conv_general_dilated(
                    h, wk, (1, 1), [pad_i, pad_j],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )

            o00 = conv(w[np.ix_([0, 2], [0, 2])], (1, 0), (1, 0))
            o01 = conv(w[np.ix_([0, 2], [1])], (1, 0), (0, 0))
            o10 = conv(w[np.ix_([1], [0, 2])], (0, 0), (1, 0))
            o11 = conv(w[np.ix_([1], [1])], (0, 0), (0, 0))
            n, H, W, c = o00.shape
            top = jnp.stack([o00, o01], axis=3).reshape(n, H, W * 2, c)
            bot = jnp.stack([o10, o11], axis=3).reshape(n, H, W * 2, c)
            return jnp.stack([top, bot], axis=2).reshape(n, H * 2, W * 2, c)

        variants[f"convT{hw}_f"] = (jax.jit(lambda p, h, _ct=ct: _ct.apply(p, h)), (pct, h))
        variants[f"convT{hw}_fb"] = (
            jax.jit(jax.grad(lambda p, _ct=ct, _h=h: tsum(_ct.apply(p, _h)))), (pct,))
        wj = jnp.asarray(w)
        variants[f"subpix{hw}_f"] = (
            jax.jit(lambda w, h, _s=subpix: _s(w, h)), (wj, h))
        variants[f"subpix{hw}_fb"] = (
            jax.jit(jax.grad(lambda w, _s=subpix, _h=h: tsum(_s(w, _h)))), (wj,))

    # compile all
    for name, (f, args) in variants.items():
        t0 = time.time()
        rb(f(*args))
        log(f"compiled {name} in {time.time()-t0:.0f}s")

    best = {k: float("inf") for k in variants}
    ROUNDS = 8
    for r in range(ROUNDS):
        for name, (f, args) in variants.items():
            t0 = time.time()
            o = f(*args)
            for _ in range(4):
                o = f(*args)
            rb(o)
            best[name] = min(best[name], (time.time() - t0) / 5)
        if r % 4 == 3:
            log(f"round {r}: " + " ".join(
                f"{k}={v*1e3:.1f}ms" for k, v in best.items()))
    print(json.dumps({k: round(v * 1e3, 2) for k, v in best.items()}, indent=2))


if __name__ == "__main__":
    main()
