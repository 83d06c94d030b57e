#!/usr/bin/env python
"""Probe 2: vjp-restructured step throughput + spe + 512 b32 memory check."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from scripts.perf_probe_r2 import build, log, matmul_control, time_step


def time_scan(model, batch, spe=4, reps=2, trials=3):
    rng = np.random.default_rng(0)
    mk = lambda: {
        "A": rng.standard_normal((batch, 256, 256, 1), dtype=np.float32),
        "B": rng.standard_normal((batch, 256, 256, 3), dtype=np.float32),
        "A_paths": ["x"] * batch,
    }
    batches = [mk() for _ in range(spe)]
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
    results = {}

    c0 = matmul_control()
    model, _ = build(32, [])
    dt = time_step(model, 32)
    results["restructured_b32"] = {"ms": round(dt * 1e3, 1),
                                   "pairs_per_s": round(32 / dt, 1),
                                   "ctl": round(c0, 1)}
    log(f"[restructured] {dt*1e3:.1f} ms = {32/dt:.1f} pairs/s")

    dt = time_scan(model, 32, spe=4)
    results["restructured_b32_spe4"] = {"ms": round(dt * 1e3, 1),
                                        "pairs_per_s": round(32 / dt, 1)}
    log(f"[restructured spe4] {dt*1e3:.1f} ms = {32/dt:.1f} pairs/s")
    del model

    # 512x512 batch 32 with remat: does it fit now?
    try:
        model, opt = build(32, ["--crop_size", "512", "--load_size", "512",
                                "--remat"])
        rng = np.random.default_rng(0)
        data = {
            "A": rng.standard_normal((32, 512, 512, 1), dtype=np.float32),
            "B": rng.standard_normal((32, 512, 512, 3), dtype=np.float32),
            "A_paths": ["x"] * 32,
        }
        model.set_input(data)
        t0 = time.time()
        model.optimize_parameters()
        float(model.get_current_losses()["G"])
        log(f"  512 compile+first: {time.time() - t0:.1f}s")
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            for _ in range(3):
                model.optimize_parameters()
            float(model.get_current_losses()["G"])
            best = min(best, (time.time() - t0) / 3)
        results["512_b32_remat"] = {"ms": round(best * 1e3, 1),
                                    "pairs_per_s": round(32 / best, 1)}
        log(f"[512 b32 remat] {best*1e3:.1f} ms = {32/best:.1f} pairs/s")
    except Exception as e:
        results["512_b32_remat"] = {"error": f"{type(e).__name__}: {e}"[:300]}
        log(f"[512 b32 remat] FAILED {type(e).__name__}: {e}")

    results["ctl_end"] = round(matmul_control(), 1)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
