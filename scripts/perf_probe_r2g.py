#!/usr/bin/env python
"""Probe 7: batched-G vs two-pass A/B + b48, matmul-controlled, one window.

Run: python scripts/perf_probe_r2g.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.perf_probe_r2 import build, log, matmul_control
from scripts.perf_probe_r2f import time_step_b


def main():
    import jax

    log(f"backend: {jax.default_backend()}")
    results = {}
    for name, batch, extra in [
        ("two_pass_b32", 32, []),
        ("batched_b32", 32, ["--g_batch"]),
        ("two_pass_b48", 48, []),
        ("two_pass_b64", 64, []),
    ]:
        c0 = matmul_control()
        try:
            model, _ = build(batch, extra)
            dt = time_step_b(model, batch)
            c1 = matmul_control()
            results[name] = {"ms": round(dt * 1e3, 1),
                             "pairs_per_s": round(batch / dt, 1),
                             "ctl_tflops": [round(c0, 1), round(c1, 1)]}
            log(f"[{name}] {dt*1e3:.1f} ms = {batch/dt:.1f} pairs/s "
                f"(ctl {c0:.1f}/{c1:.1f})")
            del model
        except Exception as e:
            results[name] = {"error": f"{type(e).__name__}: {e}"[:160]}
            log(f"[{name}] FAILED {type(e).__name__}")
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
