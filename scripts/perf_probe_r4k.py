#!/usr/bin/env python
"""Probe r4k: TPU backend compiler-option sweep on the headline step.

Every layout-level lever is measured dead (head r4e, decoder r4b/r3r,
Adam r4f, warp r4g); the one untouched axis is the XLA TPU backend's own
knobs. XLA_FLAGS cannot reach the relay's env-cleared compile helper, so
this rides the new $NEMAR_XLA_OPTS -> jax.jit(compiler_options=...) hook
(nemar_tpu/utils/xla_opts.py) which serializes into the PJRT
CompileOptions proto. One window, b56 pallas planes (the r4j knee),
subprocess-isolated; each option set is a fresh compile (the persistent
cache keys on CompileOptions). Invalid option names are logged and
skipped, not fatal. Emits one JSON line.
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
v = bench.bench_train_step(56, steps=32, trials={trials},
                           block_impl="pallas", c7_impl="auto")
print("RESULT " + json.dumps(round(v, 2)))
"""

CONFIGS = [
    ("baseline", ""),
    ("vmem64m", "xla_tpu_scoped_vmem_limit_kib=65536"),
    ("vmem32m", "xla_tpu_scoped_vmem_limit_kib=32768"),
    ("lhs", "xla_tpu_enable_latency_hiding_scheduler=true"),
]


def run_cfg(label, opts, trials=4):
    env = dict(os.environ)
    if opts:
        env["NEMAR_XLA_OPTS"] = opts
    else:
        env.pop("NEMAR_XLA_OPTS", None)
    code = CHILD.format(repo=REPO, trials=trials)
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
    dump = f"/tmp/r4k_{label}.err"
    with open(dump, "w") as fh:
        fh.write("== STDOUT ==\n" + p.stdout + "\n== STDERR ==\n" + p.stderr)
    tail = (p.stderr or p.stdout).strip().splitlines()[-3:]
    print(f"{label}: FAILED rc={p.returncode} (full log {dump}) :: "
          f"{' | '.join(tail)}", flush=True)
    return f"failed rc={p.returncode}"


def main():
    out = {}
    for label, opts in CONFIGS:
        out[label] = run_cfg(label, opts)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
