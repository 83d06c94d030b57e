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


def head_direct(x_, wk_):
    xp = jnp.pad(x_, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
    return jax.lax.conv_general_dilated(
        xp, wk_, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def head_x7(x_, wk_):
    n_, h_, w_, c_ = x_.shape
    co = wk_.shape[-1]
    # rows reflect-padded; flat (N, Ci, (H+6)*W); 3 zero lanes each side
    # absorb the dx offsets (conv_head.py layout, but PURE XLA)
    xr = jnp.pad(x_, ((0, 0), (3, 3), (0, 0), (0, 0)), mode="reflect")
    xf = jnp.transpose(xr, (0, 3, 1, 2)).reshape(n_, c_, (h_ + 6) * w_)
    xf = jnp.pad(xf, ((0, 0), (0, 0), (3, 3)))
    L = h_ * w_
    # X7: dx-shifted copies stacked into the contraction -> K = 7*Ci
    x7 = jnp.stack([xf[:, :, dx:dx + (h_ + 6) * w_] for dx in range(7)],
                   axis=1)
    acc = jnp.zeros((n_, co, L), jnp.float32)
    for dy in range(7):
        sl = jax.lax.dynamic_slice_in_dim(x7, dy * w_, L, axis=3)
        k2 = sl.reshape(n_, 7 * c_, L)
        wd = wk_[dy].reshape(7 * c_, co)  # (dx, ci) major
        acc = acc + jax.lax.dot_general(
            k2, wd, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).transpose(0, 2, 1)
    out_ = acc.reshape(n_, co, h_, w_).transpose(0, 2, 3, 1)
    # column taps wrap through rows: recompute 3 cols each side exactly
    strip = 10
    bl = head_direct(x_[:, :, :strip, :], wk_)[:, :, :3, :]
    br = head_direct(x_[:, :, -strip:, :], wk_)[:, :, -3:, :]
    return jnp.concatenate(
        [bl.astype(out_.dtype), out_[:, :, 3:w_ - 3, :],
         br.astype(out_.dtype)], axis=2)


def check_x7_parity(n_, h_, w_, ci_, co_):
    rng = np.random.RandomState(7)
    x = jnp.asarray(rng.randn(n_, h_, w_, ci_).astype(np.float32))
    wk = jnp.asarray((rng.randn(7, 7, ci_, co_) * 0.05).astype(np.float32))
    da = np.asarray(head_direct(x, wk))
    db = np.asarray(head_x7(x, wk))
    err = np.abs(da - db).max()
    print(f"x7 head parity vs direct ({n_},{h_},{w_},{ci_}->{co_}): "
          f"{err:.2e}", flush=True)
    assert err < 1e-3, err


def main():
    print("backend:", jax.default_backend(), flush=True)
    if jax.default_backend() != "tpu":
        check_x7_parity(2, 32, 128, 8, 3)
        print("cpu: parity only")
        return
    check_x7_parity(2, 256, 256, 16, 3)
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

    from nemar_tpu.ops.conv_fact import conv7_fact

    nb, hh, ww, ci, co = 32, 256, 256, 64, 3
    x = jnp.asarray(rng.randn(nb, hh, ww, ci) * 0.1, jnp.bfloat16)
    wk = jnp.asarray(rng.randn(7, 7, ci, co) * 0.05, jnp.bfloat16)

    for name, fn in (("direct", head_direct), ("fact", conv7_fact),
                     ("x7", head_x7)):
        if name == "fact":
            f_ = lambda x_, w_: jnp.sum(conv7_fact(x_, w_).astype(jnp.float32))
        else:
            f_ = (lambda fn_: lambda x_, w_: jnp.sum(
                fn_(x_, w_).astype(jnp.float32)))(fn)
        dtf = timeit(f_, (x, wk), label=f"head {name} fwd")
        g_ = (lambda f2: lambda x_, w_: sum(
            jnp.sum(jnp.square(t).astype(jnp.float32))
            for t in jax.grad(f2, argnums=(0, 1))(x_, w_)))(f_)
        dtb = timeit(g_, (x, wk), label=f"head {name} fwd+bwd")
        out[f"head_{name}"] = {"fwd_ms": dtf * 1e3, "fb_ms": dtb * 1e3}

    import json
    print(json.dumps(out))


if __name__ == "__main__":
    main()
