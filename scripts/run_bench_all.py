"""Run the headline + all 5 BASELINE configs in ONE TPU session and commit
the results (VERDICT r2 item 5: 'it should fit now' is not a number).

Each config is bench.bench_config / the headline loop called in-process so
compiled programs and the persistent cache are shared; results land in
BENCH_configs_r4.json with per-config wall time.

Usage: python scripts/run_bench_all.py [--configs 0,1,2,3,4,5]
(0 = headline)
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402  (enables the compilation cache on import)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", type=str, default="0,1,2,3,4,5")
    ap.add_argument("--out", type=str, default="/root/repo/BENCH_configs_r5.json")
    args = ap.parse_args()

    import jax

    results = {"backend": jax.default_backend(), "results": {}}
    for c in [int(x) for x in args.configs.split(",")]:
        t0 = time.time()
        try:
            if c == 0:
                # the SAME ladder bench.py main uses (b48 pallas head)
                r = bench.headline()
            else:
                r = bench.bench_config(c)
        except Exception as e:
            r = {"error": f"{type(e).__name__}: {e}"}
        r["wall_s"] = round(time.time() - t0, 1)
        results["results"][str(c)] = r
        bench.log(f"config {c}: {r}")
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
