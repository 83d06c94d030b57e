"""bench.py contract tests (CPU): config functions run, JSON shape correct."""

import json
import subprocess
import sys
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_bench(args):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")] + args,
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
    )


@pytest.mark.slow
def test_config1_json_contract():
    r = _run_bench(["--config", "1"])
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [l for l in r.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, f"stdout must be ONE json line, got: {r.stdout!r}"
    payload = json.loads(lines[0])
    assert {"metric", "value", "unit", "vs_baseline"} <= set(payload)
    assert payload["value"] > 0
