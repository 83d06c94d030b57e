#!/usr/bin/env python
"""Probe r5a: HYBRID fused block (taps fwd + kstack bwd) — the r4m verdict.

r4m (one window, b56 trunk shape): taps fwd 5.113 / f+b 14.118 ms;
kstack fwd 5.258 / f+b 13.801. Neither direction wins both halves — the
taps forward and the kstack backward are each the better half. Hybrid
should land ~13.65 ms (−3.3%); in-step that is ~+1.5% on the 149.32
pairs/s headline, i.e. across the 5.0x bar.

Stage 1: isolated block f+b for taps / kstack / hybrid (one window).
Stage 2: in-step A/B taps vs hybrid (b56 pallas ladder head).
Subprocess-isolated (NEMAR_FUSED_IMPL is trace-time). One JSON line.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BLOCK_CHILD = r"""
import json, sys
sys.path.insert(0, {repo!r})
import numpy as np
import jax, jax.numpy as jnp
from nemar_tpu.utils.compile_cache import enable_compilation_cache
enable_compilation_cache()
import bench
from nemar_tpu.ops.conv_fused import fused_resblock

rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((56, 64, 64, 256)), jnp.bfloat16)
w1 = jnp.asarray(0.05 * rng.standard_normal((3, 3, 256, 256)), jnp.bfloat16)
w2 = jnp.asarray(0.05 * rng.standard_normal((3, 3, 256, 256)), jnp.bfloat16)

fwd = bench._timeit(fused_resblock, (x, w1, w2), steps=16, trials=3,
                    label="block fwd")
g = jax.grad(lambda a, b, c: jnp.sum(jnp.square(
    fused_resblock(a, b, c).astype(jnp.float32))), argnums=(0, 1, 2))
fb = bench._timeit(g, (x, w1, w2), steps=16, trials=3, label="block f+b")
print("RESULT " + json.dumps({{"fwd_ms": round(fwd * 1e3, 3),
                               "fwd_bwd_ms": round(fb * 1e3, 3)}}))
"""

STEP_CHILD = r"""
import json, sys
sys.path.insert(0, {repo!r})
import bench
v = bench.bench_train_step(56, steps=32, trials=4,
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
    dump = f"/tmp/r5a_{label}.err"
    with open(dump, "w") as fh:
        fh.write("== STDOUT ==\n" + p.stdout + "\n== STDERR ==\n" + p.stderr)
    tail = (p.stderr or p.stdout).strip().splitlines()[-3:]
    print(f"{label}: FAILED rc={p.returncode} (full log {dump}) :: "
          f"{' | '.join(tail)}", flush=True)
    return f"failed rc={p.returncode}"


def main():
    block = BLOCK_CHILD.format(repo=REPO)
    step = STEP_CHILD.format(repo=REPO)
    out = {}
    out["block_taps"] = run_cfg("block_taps", block, "taps")
    out["block_hybrid"] = run_cfg("block_hybrid", block, "hybrid")
    out["step_taps"] = run_cfg("step_taps", step, "taps")
    out["step_hybrid"] = run_cfg("step_hybrid", step, "hybrid")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
