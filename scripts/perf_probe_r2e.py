#!/usr/bin/env python
"""Probe 5: split relay round-trip latency from marginal per-step cost.

Times chains of K in-place train steps (device-resident batch, one scalar
readback at the end) for K = 1..32. T(K) = R + K*c under the relay; the
slope c is the chip's true steady-state step time, R is tunnel latency
that any real deployment (local host) would not pay per step.

Run: python scripts/perf_probe_r2e.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from scripts.perf_probe_r2 import build, log


def main():
    import jax

    log(f"backend: {jax.default_backend()}")
    batch = 32
    model, _ = build(batch, [])
    rng = np.random.default_rng(0)
    model.set_input({
        "A": rng.standard_normal((batch, 256, 256, 1), dtype=np.float32),
        "B": rng.standard_normal((batch, 256, 256, 3), dtype=np.float32),
        "A_paths": ["x"] * batch,
    })
    t0 = time.time()
    model.optimize_parameters()
    float(model.get_current_losses()["G"])
    log(f"compile+first: {time.time() - t0:.1f}s")

    results = {}
    for K in (1, 2, 4, 8, 16, 32):
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            for _ in range(K):
                model.optimize_parameters()
            float(model.get_current_losses()["G"])
            best = min(best, time.time() - t0)
        results[K] = round(best, 4)
        log(f"K={K}: {best:.3f}s total, {best/K*1e3:.1f} ms/step, "
            f"{batch*K/best:.1f} pairs/s")

    ks = sorted(results)
    # least-squares fit T = R + K*c
    A = np.stack([np.ones(len(ks)), np.asarray(ks, float)], 1)
    y = np.asarray([results[k] for k in ks])
    (R, c), *_ = np.linalg.lstsq(A, y, rcond=None)
    out = {"T": results, "fixed_latency_s": round(float(R), 4),
           "marginal_step_ms": round(float(c) * 1e3, 2),
           "marginal_pairs_per_s": round(batch / float(c), 1)}
    log(str(out))
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
