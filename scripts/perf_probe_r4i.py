#!/usr/bin/env python
"""Probe r4i: the r4h preshifted-planes backward IN THE STEP.

Same-window A/B of the full b56 pallas-trunk training step with
NEMAR_FUSED_BWD=planes (new default) vs =legacy. r4h measured the
isolated block bwd at 7.53 vs 9.27 ms (b48); the step contains 12
block-backwards (2 G passes x 6 blocks), so the predicted step win is
~12-20 ms on ~330 ms -> the 5x north star (150.4 pairs/s) is in range.

Both arms recompile (the conv_fused.py edit moved line numbers). Emits
one JSON line.
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


def run_cfg(label, batch, bwd, trials=4):
    code = CHILD.format(repo=REPO, batch=batch, trials=trials)
    env = dict(os.environ, NEMAR_FUSED_BWD=bwd)
    try:
        p = subprocess.run([sys.executable, "-c", code], capture_output=True,
                           text=True, timeout=3600, env=env)
    except subprocess.TimeoutExpired:
        print(f"{label}: TIMEOUT", flush=True)
        return "timeout"
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            v = json.loads(line[7:])
            print(f"{label}: {v} pairs/s", flush=True)
            return v
    dump = f"/tmp/r4i_{label.replace(' ', '_')}.err"
    with open(dump, "w") as fh:
        fh.write("== STDOUT ==\n" + p.stdout + "\n== STDERR ==\n" + p.stderr)
    tail = (p.stderr or p.stdout).strip().splitlines()[-3:]
    print(f"{label}: FAILED rc={p.returncode} (full log {dump}) :: "
          f"{' | '.join(tail)}", flush=True)
    return f"failed rc={p.returncode}"


def main():
    out = {}
    out["b56_planes_bwd"] = run_cfg("b56 planes-bwd", 56, "planes")
    out["b56_legacy_bwd"] = run_cfg("b56 legacy-bwd", 56, "legacy")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
