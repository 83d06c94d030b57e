#!/usr/bin/env python
"""Probe r4a: is the 7x7->3ch head's cost the MXU's skinny-matmul wall?

The head conv is, in any layout, a matmul with output rows M = Cout = 3.
If the MXU's throughput is load-bound at small M (stationary 128x128 tile
reload dominates, M rows stream in M cycles), then NO kernel that keeps
M=3 can beat XLA materially, and the only head levers left fatten M
(space-to-depth: M = 16*Co = 48) or reduce FLOPs (Winograd). This probe
measures dot(M,448)@(448,N) bf16 for an M ladder at the head's FLOP
budget, plus the s2d-shaped dot (M=48, K=3136/16*... see below), in ONE
window with scalar readbacks (CLAUDE.md relay rules).

Head @ b48 256^2 ngf64: fwd FLOPs = 48*65536*49*64*3*2 = 59.2 GFLOP.
Equivalent matmul: (3, 3136) @ (3136, 48*65536). We hold K=448 (the
dx-stacked row form, 7 dy-dots) and N = 48*65536 and scale FLOPs by 7
to match one dy-dot; the ladder varies M only.
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
    # scalar readback forces completion under the relay
    g = jax.jit(lambda *a: jnp.sum(f(*a).astype(jnp.float32)))
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


def main():
    print("backend:", jax.default_backend(), flush=True)
    out = {}
    K = 448
    N = 48 * 65536 // 8  # N/8 so each point is quick; report scaled
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(K, N), jnp.bfloat16)

    for M in (3, 8, 16, 32, 48, 64, 128, 256):
        w = jnp.asarray(rng.randn(M, K), jnp.bfloat16)
        f = lambda w_, x_: jax.lax.dot_general(
            w_, x_, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dt = timeit(f, (w, x), label=f"dot M={M} K={K} N={N}")
        flops = 2 * M * K * N
        out[f"M{M}"] = {"ms": dt * 1e3, "tflops": flops / dt / 1e12}
        print(f"  -> {flops / dt / 1e12:.2f} TFLOP/s", flush=True)

    # The s2d-shaped head: s2d(4) -> kernel 3x3ish taps over Ci*16=1024,
    # Cout*16=48, positions N/16. Model it as dot (48, 1024)@(1024, N/16*?).
    # FLOP-equivalent check at the real s2d FLOP blowup is separate; here
    # we just want the M=48/K=1024 throughput point.
    w = jnp.asarray(rng.randn(48, 1024), jnp.bfloat16)
    x2 = jnp.asarray(rng.randn(1024, N // 4), jnp.bfloat16)
    f = lambda w_, x_: jax.lax.dot_general(
        w_, x_, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dt = timeit(f, (w, x2), label=f"dot M=48 K=1024 N={N // 4} (s2d shape)")
    out["s2d_shape"] = {"ms": dt * 1e3,
                        "tflops": 2 * 48 * 1024 * (N // 4) / dt / 1e12}

    import json
    print(json.dumps(out))


if __name__ == "__main__":
    main()
