#!/usr/bin/env python
"""Probe r4l: component dissection of the CURRENT headline step (b56,
pallas trunk + planes backward, c7 auto, bf16).

The last full split was r2c (b32, xla trunk, pre-planes): G 99 / STN 47 /
D 10 / adam 6 of a 262 ms step. Every lever since was aimed off that map;
after banking the trunk-bwd planes win the residual distribution is
unknown. One window, scalar readbacks, components jitted standalone:

  G fwd+bwd (ONE pass — the step runs two G passes per pair),
  D fwd+bwd (one batched 2N pass — the step runs that plus an N pass),
  STN fwd+bwd (2 warps, n_grad_imgs=1 production routing),
  Adam (G+R trees), and the full per-step program as the reference.

Sum-vs-step residual = head-loss D pass + pool + recon pyramid + LSGAN
glue. Emits one JSON line.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench
from bench import _timeit, log


def main():
    import jax
    import jax.numpy as jnp

    B = 56
    model, opt = bench.build_model(B, "pallas", "auto", False, False, "auto")
    st = model.state
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((B, 256, 256, opt.input_nc),
                                        dtype=np.float32))
    b = jnp.asarray(rng.standard_normal((B, 256, 256, opt.output_nc),
                                        dtype=np.float32))
    cast = model._cast
    results = {"batch": B}

    def tsum(t):
        return sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(t))

    gG = jax.grad(lambda p: tsum(model.netG.apply(cast(p), cast(a))))
    results["G_fwd_bwd_ms"] = round(_timeit(
        gG, (st.params_G,), label="G fwd+bwd (one pass)") * 1e3, 2)

    two_n = jnp.concatenate([cast(b), cast(b)], axis=0)
    gD = jax.grad(lambda p: tsum(model.netD.apply(cast(p), two_n)))
    results["D_fwd_bwd_2N_ms"] = round(_timeit(
        gD, (st.params_D,), label="D fwd+bwd (2N pass)") * 1e3, 2)

    def stn_loss(p):
        (w1, w2), reg, _ = model.netR.apply(
            cast(p), cast(a), cast(b), (cast(b), cast(a)), n_grad_imgs=1)
        return tsum(w1) + tsum(w2) + reg
    gR = jax.grad(stn_loss)
    results["STN_fwd_bwd_ms"] = round(_timeit(
        gR, (st.params_R,), label="STN fwd+bwd (2 warps)") * 1e3, 2)

    zeros = jax.tree.map(jnp.zeros_like, {"G": st.params_G, "R": st.params_R})
    def opt_only(g, o):
        u, _ = model.tx.update(g["G"], o["G"], st.params_G)
        u2, _ = model.tx_R.update(g["R"], o["R"], st.params_R)
        return tsum(u) + tsum(u2)
    results["adam_GR_ms"] = round(_timeit(
        opt_only, (zeros, st.opt_G), label="adam G+R") * 1e3, 2)

    import time
    model.set_input({"A": np.asarray(a), "B": np.asarray(b),
                     "A_paths": ["x"] * B})
    t0 = time.time()
    model.optimize_parameters()
    float(model.get_current_losses()["G"])
    log(f"step compile+first: {time.time() - t0:.1f}s")
    best = float("inf")
    for _ in range(4):
        t0 = time.time()
        for _ in range(8):
            model.optimize_parameters()
        float(model.get_current_losses()["G"])
        best = min(best, (time.time() - t0) / 8)
    results["full_step_ms"] = round(best * 1e3, 2)
    results["pairs_per_s"] = round(B / best, 2)
    known = (2 * results["G_fwd_bwd_ms"] + results["D_fwd_bwd_2N_ms"]
             + results["STN_fwd_bwd_ms"] + results["adam_GR_ms"])
    results["accounted_ms"] = round(known, 2)
    results["residual_ms"] = round(results["full_step_ms"] - known, 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
