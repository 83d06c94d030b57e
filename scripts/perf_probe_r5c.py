#!/usr/bin/env python
"""Probe r5c: config #3 dissection — the b1 full step (VERDICT r4 item 4).

Config #3 measured 56.1 pairs/s (17.8 ms/step) at b1, 1.87x baseline —
the only throughput config far below 5x, with no attribution. Hypotheses:
(a) per-step dispatch/launch overhead (the b1 scan chain already amortizes
    the relay, but the per-step program itself may be launch-bound);
(b) lane/sublane starvation at n=1 (IN stats per (n,c), small D maps);
(c) fixed per-program cost that batch amortizes (compare per-PAIR cost at
    b1/b2/b4/b8 — launch-bound signature: pairs/s ~ linear in batch).

One window: r4l-style component split at b1 (G/D/STN/adam standalone) +
a batch mini-ladder of the FULL scan-path step. Emits one JSON line.
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

    results = {}

    # --- component split at b1 (mirrors r4l at b56) ---
    B = 1
    model, opt = bench.build_model(B, "pallas", "auto", False, False, "auto")
    st = model.state
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((B, 256, 256, opt.input_nc),
                                        dtype=np.float32))
    b = jnp.asarray(rng.standard_normal((B, 256, 256, opt.output_nc),
                                        dtype=np.float32))
    cast = model._cast

    def tsum(t):
        return sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(t))

    gG = jax.grad(lambda p: tsum(model.netG.apply(cast(p), cast(a))))
    results["G_fwd_bwd_ms"] = round(_timeit(
        gG, (st.params_G,), steps=32, label="G fwd+bwd b1") * 1e3, 2)

    two_n = jnp.concatenate([cast(b), cast(b)], axis=0)
    gD = jax.grad(lambda p: tsum(model.netD.apply(cast(p), two_n)))
    results["D_fwd_bwd_2N_ms"] = round(_timeit(
        gD, (st.params_D,), steps=32, label="D fwd+bwd 2N b1") * 1e3, 2)

    def stn_loss(p):
        (w1, w2), reg, _ = model.netR.apply(
            cast(p), cast(a), cast(b), (cast(b), cast(a)), n_grad_imgs=1)
        return tsum(w1) + tsum(w2) + reg

    gR = jax.grad(stn_loss)
    results["STN_fwd_bwd_ms"] = round(_timeit(
        gR, (st.params_R,), steps=32, label="STN fwd+bwd b1") * 1e3, 2)

    # --- full-step batch mini-ladder (scan path, per-pair cost) ---
    for bsz in (1, 2, 4, 8):
        try:
            pairs = bench.bench_train_step(bsz, steps=32, trials=3,
                                           block_impl="pallas",
                                           c7_impl="auto")
            results[f"step_pairs_per_s_b{bsz}"] = round(pairs, 2)
            results[f"step_ms_b{bsz}"] = round(bsz / pairs * 1e3, 2)
        except Exception as e:
            log(f"b{bsz} failed: {type(e).__name__}: {e}")
            results[f"step_pairs_per_s_b{bsz}"] = None

    print(json.dumps(results))


if __name__ == "__main__":
    main()
