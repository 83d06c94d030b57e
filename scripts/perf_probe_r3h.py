"""Round-3 probe H: dissect the 7x7 head's fwd+bwd cost.

head_x measured ~27 ms (probe r3g) and the s2d rewrite did NOT move it,
so the cost is NOT the 3-lane MXU forward alone. Variants isolate each
piece (all at (32,256,256,64) bf16, scalar readback, best-of-trials):

  fwd        direct conv fwd only (no grad)
  fwd_s2d    s2d conv fwd only
  gw         grad wrt kernel only (d/dW path: correlation conv)
  gx         grad wrt input only (d/dx path: transposed conv to 64ch)
  gw_s2d     s2d: grad wrt kernel only
  gx_s2d     s2d: grad wrt input only
  pad        reflect-pad + its adjoint alone (grad of sum(pad(x)*c))
  tanh       tanh+mse head on a (32,256,256,3) tensor, fwd+grad
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from nemar_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


B, H, W = 32, 256, 256
bf = jnp.bfloat16


def timeit(f, args, steps=8, trials=3, label=""):
    @jax.jit
    def g(*a):
        o = f(*a)
        return jnp.stack([x.astype(jnp.float32).mean()
                          for x in jax.tree.leaves(o)]).mean()

    t0 = time.time()
    float(g(*args))
    log(f"{label}: compile+first {time.time() - t0:.1f}s")
    best = float("inf")
    for _ in range(trials):
        t0 = time.time()
        for _ in range(steps):
            o = g(*args)
        float(o)
        best = min(best, (time.time() - t0) / steps)
    log(f"{label}: best {best * 1e3:.2f} ms")
    return best * 1e3


def _conv(xx, kk, s2d):
    if s2d:
        from nemar_tpu.ops.conv_s2d import conv7_s2d

        return conv7_s2d(xx, kk)
    hp = jnp.pad(xx, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
    return jax.lax.conv_general_dilated(
        hp, kk, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    log(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, 64), dtype=np.float32)).astype(bf)
    k = jnp.asarray(rng.standard_normal((7, 7, 64, 3)) * 0.02,
                    np.float32).astype(bf)
    y3 = jnp.asarray(rng.standard_normal((B, H, W, 3), dtype=np.float32)).astype(bf)

    def loss(kk, xx, s2d):
        return jnp.mean(jnp.square(
            jnp.tanh(_conv(xx, kk, s2d)).astype(jnp.float32)))

    out = {}
    table = {
        "fwd": lambda: timeit(lambda kk, xx: loss(kk, xx, False), (k, x),
                              label="fwd"),
        "fwd_s2d": lambda: timeit(lambda kk, xx: loss(kk, xx, True), (k, x),
                                  label="fwd_s2d"),
        "gw": lambda: timeit(jax.grad(lambda kk, xx: loss(kk, xx, False),
                                      argnums=0), (k, x), label="gw"),
        "gx": lambda: timeit(jax.grad(lambda kk, xx: loss(kk, xx, False),
                                      argnums=1), (k, x), label="gx"),
        "gw_s2d": lambda: timeit(jax.grad(lambda kk, xx: loss(kk, xx, True),
                                          argnums=0), (k, x), label="gw_s2d"),
        "gx_s2d": lambda: timeit(jax.grad(lambda kk, xx: loss(kk, xx, True),
                                          argnums=1), (k, x), label="gx_s2d"),
        "pad": lambda: timeit(
            jax.grad(lambda xx: jnp.mean(jnp.square(jnp.pad(
                xx, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect"
            ).astype(jnp.float32)))), (x,), label="pad"),
        "tanh": lambda: timeit(
            jax.grad(lambda yy: jnp.mean(jnp.square(
                jnp.tanh(yy).astype(jnp.float32)))), (y3,), label="tanh"),
    }
    for name, fn in table.items():
        if only and name not in only:
            continue
        try:
            out[name] = round(fn(), 2)
        except Exception as e:
            log(f"{name} FAILED: {type(e).__name__}: {e}")
            out[name] = None
    print(json.dumps(out))


if __name__ == "__main__":
    main()
