#!/usr/bin/env python
"""Probe 8: where do G's 99 ms go? IN cost in-graph, fwd/bwd split, and
whether XLA's lhs-dilated lowering of ConvTranspose(3x3, s2) loses to an
exact subpixel decomposition (4 dense sub-convs + interleave).

Run: python scripts/perf_probe_r2h.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from scripts.perf_probe_r2 import log, matmul_control


def timeit(f, args, steps=10, trials=3, label=""):
    import jax

    def rb(x):
        return np.asarray(jax.tree.leaves(x)[0].astype("float32")).ravel()[:1]

    t0 = time.time()
    rb(f(*args))
    log(f"  {label} compile: {time.time()-t0:.0f}s")
    best = float("inf")
    for _ in range(trials):
        t0 = time.time()
        o = f(*args)
        for _ in range(steps - 1):
            o = f(*args)
        rb(o)
        best = min(best, (time.time() - t0) / steps)
    log(f"  {label}: {best*1e3:.2f} ms")
    return round(best * 1e3, 2)


def main():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from nemar_tpu.models.networks import ResnetGenerator

    log(f"backend: {jax.default_backend()}")
    results = {"ctl0": round(matmul_control(), 2)}
    B = 32
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((B, 256, 256, 1), dtype=np.float32), jnp.bfloat16
    )

    def tsum(t):
        return sum(jnp.sum(v.astype(jnp.float32)) for v in jax.tree.leaves(t))

    for norm in ("instance", "none"):
        g = ResnetGenerator(output_nc=3, ngf=64, n_blocks=6, norm=norm)
        p = jax.tree.map(
            lambda v: v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v,
            g.init(jax.random.key(0), x),
        )
        fwd = jax.jit(lambda p, x: g.apply(p, x))
        results[f"G_fwd_{norm}"] = timeit(fwd, (p, x), label=f"G fwd {norm}")
        gb = jax.jit(jax.grad(lambda p: tsum(g.apply(p, x))))
        results[f"G_fwdbwd_{norm}"] = timeit(gb, (p,), label=f"G fwd+bwd {norm}")

    # ConvTranspose vs exact subpixel decomposition, both decoder shapes
    for cin, cout, hw in ((256, 128, 64), (128, 64, 128)):
        h = jnp.asarray(
            rng.standard_normal((B, hw, hw, cin), dtype=np.float32), jnp.bfloat16
        )
        ct = nn.ConvTranspose(cout, (3, 3), strides=(2, 2), padding="SAME")
        pct = jax.tree.map(
            lambda v: v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v,
            ct.init(jax.random.key(1), h),
        )
        f1 = jax.jit(lambda p, h: ct.apply(p, h))
        results[f"convT_{hw}"] = timeit(f1, (pct, h), label=f"convT {hw}")
        g1 = jax.jit(jax.grad(lambda p: tsum(ct.apply(p, h))))
        results[f"convT_{hw}_bwd"] = timeit(g1, (pct,), label=f"convT {hw} f+b")

        # subpixel: flax ConvTranspose(3x3, s2, SAME) == lhs-dilated conv
        # pad (2,1), no kernel flip. Output parity (p%2, q%2) selects tap
        # subsets; each class is a DENSE 2x2/2x1/1x2/1x1 conv of x +
        # interleave (CPU-validated exact, 4.8e-7 fp32).
        w = pct["params"]["kernel"]  # (3, 3, cin, cout) HWIO

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

        wnp = np.asarray(pct["params"]["kernel"])
        f2 = jax.jit(lambda h: subpix(wnp, h))
        ref = np.asarray(f1(pct, h).astype(jnp.float32))
        got = np.asarray(f2(h).astype(jnp.float32))
        err = float(np.abs(ref - got).max())
        log(f"  subpix exactness {hw}: {err:.2e}")
        results[f"subpix_{hw}_err"] = err
        results[f"subpix_{hw}"] = timeit(f2, (h,), label=f"subpix {hw}")
        g2 = jax.jit(jax.grad(lambda w: tsum(subpix(w, h))))
        results[f"subpix_{hw}_bwd"] = timeit(
            g2, (jnp.asarray(wnp),), label=f"subpix {hw} f+b"
        )

    results["ctl1"] = round(matmul_control(), 2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
