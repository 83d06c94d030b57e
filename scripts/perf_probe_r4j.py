#!/usr/bin/env python
"""Probe r4j: batch-knee ladder with the r4h planes backward.

The b48-vs-b56 knee was measured with the legacy backward (r4g:
142.87 vs 142.52); the planes backward shifts the trunk's bwd cost
~19%, so the knee may move. One window: b48 / b56 / b64, all planes,
pallas trunk. Emits one JSON line.
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
                           block_impl="pallas", c7_impl="auto")
print("RESULT " + json.dumps(round(v, 2)))
"""


def run_cfg(label, batch, trials=4):
    code = CHILD.format(repo=REPO, batch=batch, trials=trials)
    try:
        p = subprocess.run([sys.executable, "-c", code], capture_output=True,
                           text=True, timeout=3600, env=dict(os.environ))
    except subprocess.TimeoutExpired:
        print(f"{label}: TIMEOUT", flush=True)
        return "timeout"
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            v = json.loads(line[7:])
            print(f"{label}: {v} pairs/s", flush=True)
            return v
    dump = f"/tmp/r4j_{label.replace(' ', '_')}.err"
    with open(dump, "w") as fh:
        fh.write("== STDOUT ==\n" + p.stdout + "\n== STDERR ==\n" + p.stderr)
    tail = (p.stderr or p.stdout).strip().splitlines()[-3:]
    print(f"{label}: FAILED rc={p.returncode} (full log {dump}) :: "
          f"{' | '.join(tail)}", flush=True)
    return f"failed rc={p.returncode}"


def main():
    out = {}
    for b in (48, 56, 64):
        out[f"b{b}_planes"] = run_cfg(f"b{b} planes", b)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
