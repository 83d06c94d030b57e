#!/usr/bin/env python
"""Probe r4f: split-program Adam (--opt_split) in-step A/B.

VERDICT r3 weak #1's untried lever: the flat Adam could never ride in the
SAME program as the pallas trunk (compile-helper SIGKILL, probes r3q/r4d
— even bucketed). --opt_split compiles the G/R flat-bucket Adam as its
own program: the step pays one extra dispatch but drops ~80 per-leaf
update kernels (probe r3o: 6.2 ms standalone for the full per-leaf
update).

Same-window, subprocess-isolated configs:
  1. b48 pallas per-step              (baseline; r4d: ties scan at 142.4)
  2. b48 pallas per-step + opt_split  (the candidate)
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
import nemar_tpu.models.nemar_model as nm
def boom(self, *a):
    raise RuntimeError("per-step A/B: scan disabled")
nm.NEMARModel._train_scan_impl = boom
v = bench.bench_train_step({batch}, steps=32, trials={trials},
                           block_impl={block!r}, c7_impl={c7!r},
                           opt_split={split!r})
print("RESULT " + json.dumps(round(v, 2)))
"""


def run_cfg(label, batch, block, c7, trials=4, split=False):
    code = CHILD.format(repo=REPO, batch=batch, trials=trials,
                        block=block, c7=c7, split=split)
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
    dump = f"/tmp/r4f_{label.replace(' ', '_')}.err"
    with open(dump, "w") as fh:
        fh.write("== STDOUT ==\n" + p.stdout + "\n== STDERR ==\n" + p.stderr)
    tail = (p.stderr or p.stdout).strip().splitlines()[-3:]
    print(f"{label}: FAILED rc={p.returncode} (full log {dump}) :: "
          f"{' | '.join(tail)}", flush=True)
    return f"failed rc={p.returncode}"


def main():
    out = {}
    out["b48_pallas_per_step"] = run_cfg(
        "b48 pallas per-step", 48, "pallas", "auto")
    out["b48_pallas_opt_split"] = run_cfg(
        "b48 pallas opt-split", 48, "pallas", "auto", split=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
