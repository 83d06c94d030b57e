#!/usr/bin/env python
"""Probe r5d: batch-knee re-sweep after the trunk-backward change lands
(VERDICT r4 item 2: the b56 knee was selected under the taps/planes
backward; a cheaper trunk moves the HBM/compute balance).

One window, subprocess-isolated, FUSED impl fixed to the winner of r5a
(pass it as argv[1]; default hybrid): full bench_train_step at
b48/b56/b64. Emits one JSON line.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

STEP_CHILD = r"""
import json, sys
sys.path.insert(0, {repo!r})
import bench
v = bench.bench_train_step({bsz}, steps=32, trials=4,
                           block_impl="pallas", c7_impl="auto")
print("RESULT " + json.dumps(round(v, 2)))
"""


def run_cfg(label, code, impl):
    env = dict(os.environ)
    env["NEMAR_FUSED_IMPL"] = impl
    try:
        p = subprocess.run([sys.executable, "-c", code], capture_output=True,
                           text=True, timeout=3600, env=env)
    except subprocess.TimeoutExpired:
        print(f"{label}: TIMEOUT", flush=True)
        return "timeout"
    for line in p.stdout.splitlines():
        if line.startswith("RESULT "):
            v = json.loads(line[7:])
            print(f"{label}: {v}", flush=True)
            return v
    dump = f"/tmp/r5d_{label}.err"
    with open(dump, "w") as fh:
        fh.write("== STDOUT ==\n" + p.stdout + "\n== STDERR ==\n" + p.stderr)
    tail = (p.stderr or p.stdout).strip().splitlines()[-3:]
    print(f"{label}: FAILED rc={p.returncode} (full log {dump}) :: "
          f"{' | '.join(tail)}", flush=True)
    return f"failed rc={p.returncode}"


def main():
    impl = sys.argv[1] if len(sys.argv) > 1 else "hybrid"
    out = {"impl": impl}
    for bsz in (48, 56, 64):
        code = STEP_CHILD.format(repo=REPO, bsz=bsz)
        out[f"step_b{bsz}"] = run_cfg(f"step_b{bsz}", code, impl)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
