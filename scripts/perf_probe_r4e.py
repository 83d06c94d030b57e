#!/usr/bin/env python
"""Probe r4e: roll-kernel head (ops/conv_head_roll) vs fact vs direct.

Same-window fwd and fwd+bwd at the production head shape (b32/b48 256²
ngf64 -> 3, bf16). The r4a ladder predicts ~2x from streamed-volume
arithmetic (29M vs fact's 60M values/image); this is the decision probe
for making 'roll' the --c7_impl auto head.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nemar_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from nemar_tpu.ops.conv_fact import conv7_fact
from nemar_tpu.ops.conv_head_roll import conv_head_roll, _direct


def timeit(f, args, steps=32, trials=3, label=""):
    g = jax.jit(lambda *a: jnp.sum(f(*a).astype(jnp.float32)))
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


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.RandomState(0)
    out = {}
    for nb in (32, 48):
        x = jnp.asarray(rng.randn(nb, 256, 256, 64) * 0.1, jnp.bfloat16)
        wk = jnp.asarray(rng.randn(7, 7, 64, 3) * 0.05, jnp.bfloat16)
        # on-TPU parity spot check (bf16 bar 1e-2)
        if nb == 32:
            d = np.abs(np.asarray(conv_head_roll(x[:2], wk), np.float32)
                       - np.asarray(_direct(x[:2], wk), np.float32)).max()
            print(f"tpu bf16 parity roll vs direct: {d:.3e}", flush=True)
            assert d < 5e-2, d
        for name, fn in (("roll", conv_head_roll), ("fact", conv7_fact)):
            f_ = (lambda fn_: lambda x_, w_: jnp.sum(
                fn_(x_, w_).astype(jnp.float32)))(fn)
            dtf = timeit(f_, (x, wk), label=f"b{nb} head {name} fwd")
            g_ = (lambda f2: lambda x_, w_: sum(
                jnp.sum(jnp.square(t).astype(jnp.float32))
                for t in jax.grad(f2, argnums=(0, 1))(x_, w_)))(f_)
            dtb = timeit(g_, (x, wk), label=f"b{nb} head {name} fwd+bwd")
            out[f"b{nb}_{name}"] = {"fwd_ms": round(dtf * 1e3, 3),
                                    "fb_ms": round(dtb * 1e3, 3)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
