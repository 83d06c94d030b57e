#!/usr/bin/env python
"""Probe 6: batch scaling + warp impl + vmem flag on the full step.

255 ms/step at b32 is real compute (probe r2e: fixed latency 47 ms).
G work dominates (probe r2c: 99 ms of 262 is one G fwd+bwd; the step does
~2x fwd + 2x bwd of G). Levers that don't change the model: batch size
(per-pair efficiency), warp kernel routing, scoped-vmem fusion headroom.

Run: python scripts/perf_probe_r2f.py [--vmem KIB]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from scripts.perf_probe_r2 import build, log


def time_step_b(model, batch, steps=8, trials=3):
    rng = np.random.default_rng(0)
    model.set_input({
        "A": rng.standard_normal((batch, 256, 256, 1), dtype=np.float32),
        "B": rng.standard_normal((batch, 256, 256, 3), dtype=np.float32),
        "A_paths": ["x"] * batch,
    })
    t0 = time.time()
    model.optimize_parameters()
    float(model.get_current_losses()["G"])
    log(f"  compile+first: {time.time() - t0:.1f}s")
    best = float("inf")
    for _ in range(trials):
        t0 = time.time()
        for _ in range(steps):
            model.optimize_parameters()
        float(model.get_current_losses()["G"])
        best = min(best, (time.time() - t0) / steps)
    return best


def main():
    import jax

    log(f"backend: {jax.default_backend()}")
    results = {}
    for name, batch, extra in [
        ("b32", 32, []),
        ("b64", 64, []),
        ("b48", 48, []),
        ("b32_warp_mm", 32, ["--warp_impl", "mm"]),
        ("b64_warp_mm", 64, ["--warp_impl", "mm"]),
    ]:
        try:
            model, _ = build(batch, extra)
            dt = time_step_b(model, batch)
            results[name] = {"ms": round(dt * 1e3, 1),
                             "pairs_per_s": round(batch / dt, 1)}
            log(f"[{name}] {dt*1e3:.1f} ms = {batch/dt:.1f} pairs/s")
            del model
        except Exception as e:
            results[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
            log(f"[{name}] FAILED {type(e).__name__}: {e}")
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
