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


@pytest.mark.quick
def test_outage_watchdog_emits_honest_zero():
    """Relay-outage watchdog: one JSON line, value 0, exit 3 (round 5)."""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["NEMAR_BENCH_TIMEOUT"] = "2"
    code = (
        "import os, sys, time; os.chdir(%r); sys.path.insert(0, %r);\n"
        "import bench; bench._outage_watchdog(0); time.sleep(30);\n"
        "print('UNREACHED')" % (REPO, REPO))
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=120, env=env, cwd=REPO)
    assert r.returncode == 3, (r.returncode, r.stdout, r.stderr[-500:])
    lines = [l for l in r.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1 and "UNREACHED" not in r.stdout
    payload = json.loads(lines[0])
    assert payload["value"] == 0.0 and payload["relay_outage"] is True
    assert payload["vs_baseline"] == 0.0
