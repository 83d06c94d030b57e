#!/usr/bin/env python
"""Probe r4g: last two untried ladder levers, same window.

  1. b48 pallas + warp_impl shift — the adopted r4c roll forward inside
     the production step. At bench time the zero-init flow head keeps
     every displacement << 8 px, so the dynamic cond rides the shift
     branch (exactly the regime a fresh training run starts in; the cond
     falls back per-call if the field outgrows the bound mid-training).
  2. b48 pallas baseline — same-window reference.
  3. b56 pallas — the b32/b48/b64 curve (123.5 / 142.3 / 139.1) brackets
     the knee; b56 is the only untested point between.

Subprocess-isolated like r4d/r4f. Emits one JSON line.
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
v = bench.bench_train_step({batch}, steps=32, trials={trials},
                           block_impl={block!r}, c7_impl={c7!r},
                           warp_impl={warp!r})
print("RESULT " + json.dumps(round(v, 2)))
"""


def run_cfg(label, batch, block, c7, warp="auto", trials=4):
    code = CHILD.format(repo=REPO, batch=batch, trials=trials,
                        block=block, c7=c7, warp=warp)
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
    dump = f"/tmp/r4g_{label.replace(' ', '_')}.err"
    with open(dump, "w") as fh:
        fh.write("== STDOUT ==\n" + p.stdout + "\n== STDERR ==\n" + p.stderr)
    tail = (p.stderr or p.stdout).strip().splitlines()[-3:]
    print(f"{label}: FAILED rc={p.returncode} (full log {dump}) :: "
          f"{' | '.join(tail)}", flush=True)
    return f"failed rc={p.returncode}"


def main():
    out = {}
    out["b48_pallas_shift_warp"] = run_cfg(
        "b48 pallas shift-warp", 48, "pallas", "auto", warp="shift")
    out["b48_pallas_baseline"] = run_cfg(
        "b48 pallas baseline", 48, "pallas", "auto")
    out["b56_pallas"] = run_cfg(
        "b56 pallas", 56, "pallas", "auto", trials=3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
