#!/usr/bin/env python
"""Probe r4d: ladder-head A/Bs — scan-chain dispatch and batch 64.

One window, in order (all through bench.bench_train_step, which round-4
routes through the production --steps_per_execution scan program with
device-resident input stacks):

  1. b48 pallas trunk + c7 auto, scan chains   (round-4 candidate head)
  2. b48 pallas trunk + c7 auto, per-step      (round-3 head, for the
     same-window scan-vs-dispatch delta)
  3. b64 pallas trunk + c7 auto, scan chains   (r2 measured b64 LOSING at
     xla two-pass 115.5 vs 123.5; never retested on the pallas trunk
     standalone — r3 only saw it OOM under probe contention)

Emits one JSON line with all three pairs/s.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def main():
    out = {}
    out["b48_scan"] = round(bench.bench_train_step(
        48, steps=32, trials=4, block_impl="pallas", c7_impl="auto"), 2)

    # per-step A/B: disable the scan body so bench's fallback loop runs
    # (bench_train_step builds a fresh model, whose __init__ re-binds
    # jit(self._train_scan_impl) from the patched class)
    import nemar_tpu.models.nemar_model as nm
    saved = nm.NEMARModel._train_scan_impl

    def boom(self, *a):
        raise RuntimeError("per-step A/B: scan disabled")

    nm.NEMARModel._train_scan_impl = boom
    try:
        out["b48_per_step"] = round(bench.bench_train_step(
            48, steps=32, trials=4, block_impl="pallas", c7_impl="auto"), 2)
    finally:
        nm.NEMARModel._train_scan_impl = saved

    try:
        out["b64_scan"] = round(bench.bench_train_step(
            64, steps=32, trials=3, block_impl="pallas", c7_impl="auto"), 2)
    except Exception as e:
        out["b64_scan"] = f"failed: {type(e).__name__}: {e}"

    print(json.dumps(out))


if __name__ == "__main__":
    main()
