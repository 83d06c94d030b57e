#!/usr/bin/env python
"""Probe r4d: ladder-head A/Bs — scan-chain dispatch and batch 64.

Each config runs in its OWN subprocess: the first r4d run died when the
pallas-trunk + scan-program compile SIGKILLed the remote compile helper
(the same failure mode as pallas + opt_fused, probe r3q) and took the
whole probe with it. Subprocess isolation turns that into one "failed"
row instead.

Configs (one window, in order):
  1. b48 pallas trunk + c7 auto, scan chains   (round-4 candidate head)
  2. b48 pallas trunk + c7 auto, per-step      (round-3 head, for the
     same-window scan-vs-dispatch delta)
  3. b48 xla trunk + c7 auto, scan chains      (is the scan win trunk-
     independent? also the fallback head if pallas+scan can't compile)
  4. b64 pallas trunk + c7 auto, scan chains   (r2 measured b64 LOSING at
     xla two-pass 115.5 vs 123.5; never retested on the pallas trunk
     standalone — r3 only saw it OOM under probe contention)
  5. b48 pallas trunk + c7 auto + opt_fused, scan chains — the round-4
     BUCKETED flat Adam (optim.py bucket_elems). The single-ravel version
     reproducibly SIGKILLed the compile helper with the pallas trunk
     (r3q/r3f); buckets shrink the concatenate the compiler must
     schedule. If this compiles AND wins, it tops the ladder.

Emits one JSON line with all pairs/s.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys
sys.path.insert(0, {repo!r})
import bench
{patch}
v = bench.bench_train_step({batch}, steps=32, trials={trials},
                           block_impl={block!r}, c7_impl={c7!r},
                           opt_fused={fused!r})
print("RESULT " + json.dumps(round(v, 2)))
"""

PATCH_PER_STEP = r"""
import nemar_tpu.models.nemar_model as nm
def boom(self, *a):
    raise RuntimeError("per-step A/B: scan disabled")
nm.NEMARModel._train_scan_impl = boom
"""


def run_cfg(label, batch, block, c7, trials=4, per_step=False,
            fused=False):
    code = CHILD.format(repo=REPO, batch=batch, trials=trials,
                        block=block, c7=c7, fused=fused,
                        patch=PATCH_PER_STEP if per_step else "")
    try:
        p = subprocess.run([sys.executable, "-c", code], capture_output=True,
                           text=True, timeout=3000)
    except subprocess.TimeoutExpired:
        print(f"{label}: TIMEOUT", flush=True)
        return "timeout"
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            v = json.loads(line[7:])
            print(f"{label}: {v} pairs/s", flush=True)
            return v
    dump = f"/tmp/r4d_{label.replace(' ', '_')}.err"
    with open(dump, "w") as fh:
        fh.write("== STDOUT ==\n" + p.stdout + "\n== STDERR ==\n" + p.stderr)
    tail = (p.stderr or p.stdout).strip().splitlines()[-3:]
    print(f"{label}: FAILED rc={p.returncode} (full log {dump}) :: "
          f"{' | '.join(tail)}", flush=True)
    return f"failed rc={p.returncode}"


def main():
    out = {}
    out["b48_pallas_scan"] = run_cfg(
        "b48 pallas scan", 48, "pallas", "auto")
    out["b48_pallas_per_step"] = run_cfg(
        "b48 pallas per-step", 48, "pallas", "auto", per_step=True)
    out["b48_xla_scan"] = run_cfg(
        "b48 xla scan", 48, "xla", "auto")
    out["b64_pallas_scan"] = run_cfg(
        "b64 pallas scan", 64, "pallas", "auto", trials=3)
    out["b48_pallas_scan_bucketed_adam"] = run_cfg(
        "b48 pallas scan bucketed-adam", 48, "pallas", "auto", fused=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
