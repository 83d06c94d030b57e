#!/usr/bin/env python
"""Probe 3: 512 b32 via grad_accum + component-level step timing (one window)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from scripts.perf_probe_r2 import build, log, matmul_control


def readback(x):
    import jax

    return np.asarray(jax.tree.leaves(x)[0].astype("float32")).ravel()[:1]


def timeit(f, args, steps=6, trials=3, label=""):
    t0 = time.time()
    o = f(*args)
    readback(o)
    log(f"  {label} compile: {time.time()-t0:.0f}s")
    best = float("inf")
    for _ in range(trials):
        t0 = time.time()
        o = args
        for _ in range(steps):
            o = f(*args)
        readback(o)
        best = min(best, (time.time() - t0) / steps)
    log(f"  {label}: {best*1e3:.1f} ms")
    return round(best * 1e3, 1)


def main():
    import jax
    import jax.numpy as jnp

    results = {"ctl0": round(matmul_control(), 1)}
    B = 32

    # components at 256^2 bf16 (the bench config)
    model, opt = build(B, [])
    st = model.state
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((B, 256, 256, 1), dtype=np.float32))
    b = jnp.asarray(rng.standard_normal((B, 256, 256, 3), dtype=np.float32))

    def tsum(t):
        return sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(t))

    cast = model._cast
    # G fwd+bwd
    gG = jax.jit(jax.grad(lambda p: tsum(model.netG.apply(cast(p), cast(a)))))
    results["G_fwd_bwd_ms"] = timeit(gG, (st.params_G,), label="G fwd+bwd")
    # D fwd+bwd
    gD = jax.jit(jax.grad(lambda p: tsum(model.netD.apply(cast(p), cast(b)))))
    results["D_fwd_bwd_ms"] = timeit(gD, (st.params_D,), label="D fwd+bwd")
    # STN fwd+bwd (2 warps, pallas path)
    def stn_loss(p):
        (w1, w2), reg, _ = model.netR.apply(cast(p), cast(a), cast(b), (cast(b), cast(a)))
        return tsum(w1) + tsum(w2) + reg
    gR = jax.jit(jax.grad(stn_loss))
    results["STN_fwd_bwd_ms"] = timeit(gR, (st.params_R,), label="STN fwd+bwd (2 warps)")
    # optimizer only
    zeros = jax.tree.map(jnp.zeros_like, {"G": st.params_G, "R": st.params_R})
    def opt_only(g, o):
        u, o2 = model.tx.update(g["G"], o["G"], st.params_G)
        u2, o3 = model.tx_R.update(g["R"], o["R"], st.params_R)
        return tsum(u) + tsum(u2)
    jopt = jax.jit(opt_only)
    results["optimizer_ms"] = timeit(jopt, (zeros, st.opt_G), label="adam G+R")
    # full step reference
    model.set_input({"A": np.asarray(a), "B": np.asarray(b), "A_paths": ["x"]*B})
    t0 = time.time()
    model.optimize_parameters(); float(model.get_current_losses()["G"])
    log(f"  step compile: {time.time()-t0:.0f}s")
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(6):
            model.optimize_parameters()
        float(model.get_current_losses()["G"])
        best = min(best, (time.time() - t0) / 6)
    results["full_step_ms"] = round(best * 1e3, 1)
    log(f"  full step: {best*1e3:.1f} ms")
    results["ctl_mid"] = round(matmul_control(), 1)
    del model

    # 512^2 batch 32 via grad_accum
    for acc in (2, 4):
        try:
            model, _ = build(B, ["--crop_size", "512", "--load_size", "512",
                                 "--remat", "--grad_accum", str(acc)])
            data = {
                "A": rng.standard_normal((B, 512, 512, 1), dtype=np.float32),
                "B": rng.standard_normal((B, 512, 512, 3), dtype=np.float32),
                "A_paths": ["x"] * B,
            }
            model.set_input(data)
            t0 = time.time()
            model.optimize_parameters()
            float(model.get_current_losses()["G"])
            log(f"  512 acc{acc} compile: {time.time()-t0:.0f}s")
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                for _ in range(3):
                    model.optimize_parameters()
                float(model.get_current_losses()["G"])
                best = min(best, (time.time() - t0) / 3)
            results[f"512_b32_acc{acc}"] = {
                "ms": round(best * 1e3, 1), "pairs_per_s": round(B / best, 1)}
            log(f"[512 b32 acc{acc}] {best*1e3:.1f} ms = {B/best:.1f} pairs/s")
            del model
            break
        except Exception as e:
            results[f"512_b32_acc{acc}"] = {"error": f"{type(e).__name__}: {e}"[:200]}
            log(f"[512 b32 acc{acc}] FAILED {type(e).__name__}")
    results["ctl_end"] = round(matmul_control(), 1)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
