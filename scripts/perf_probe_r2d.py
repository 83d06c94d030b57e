#!/usr/bin/env python
"""Probe 4: close the 4.1x -> 5x gap. One TPU window, matmul-normalized.

Variants: pallas IN in the full step, steps_per_execution fusion, both.
Run: python scripts/perf_probe_r2d.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from scripts.perf_probe_r2 import build, log, matmul_control, time_step


def time_scan(model, batch, spe, reps=3, trials=3):
    rng = np.random.default_rng(0)
    batches = [
        {
            "A": rng.standard_normal((batch, 256, 256, 1), dtype=np.float32),
            "B": rng.standard_normal((batch, 256, 256, 3), dtype=np.float32),
            "A_paths": ["x"] * batch,
        }
        for _ in range(spe)
    ]
    t0 = time.time()
    model.optimize_parameters_scan(batches)
    float(model.get_current_losses()["G"])
    log(f"  scan compile+first: {time.time() - t0:.1f}s")
    best = float("inf")
    for _ in range(trials):
        t0 = time.time()
        for _ in range(reps):
            model.optimize_parameters_scan(batches)
        float(model.get_current_losses()["G"])
        best = min(best, (time.time() - t0) / (reps * spe))
    return best


def main():
    import jax

    log(f"backend: {jax.default_backend()}")
    batch = 32
    results = {}

    def record(name, dt, c0, c1):
        results[name] = {
            "ms": round(dt * 1e3, 1),
            "pairs_per_s": round(batch / dt, 1),
            "ctl_tflops": [round(c0, 1), round(c1, 1)],
        }
        log(f"[{name}] {dt*1e3:.1f} ms/step = {batch/dt:.1f} pairs/s "
            f"(ctl {c0:.0f}/{c1:.0f} TF)")

    # plain step variants
    for name, extra in [("base", []), ("norm_pallas", ["--norm_impl", "pallas"])]:
        c0 = matmul_control()
        model, _ = build(batch, extra)
        dt = time_step(model, batch)
        record(name, dt, c0, matmul_control())
        del model

    # scan-fused variants
    for name, extra, spe in [
        ("spe4", [], 4),
        ("norm_pallas_spe4", ["--norm_impl", "pallas"], 4),
        ("spe8", [], 8),
    ]:
        c0 = matmul_control()
        model, _ = build(batch, extra)
        dt = time_scan(model, batch, spe)
        record(name, dt, c0, matmul_control())
        del model

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
