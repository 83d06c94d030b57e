"""Production pod-shape dryrun: 16 virtual devices, DATA-ONLY mesh.

Round-4's config #5 attribution (BENCH_configs_r4.json) recommends the
data-only mesh as the production shape on real pods (spatial halos are the
dominant virtual-device artifact; mesh_spatial stays a memory lever for
512²+). The driver only exercises the (data=4, spatial=2) x 8-device shape,
so this test pins the RECOMMENDED shape in CI (VERDICT r4 #8): full jitted
NeMAR train step over Mesh({'data': 16}) with tiny nets at 32², one
optimizer step, finite losses.

Runs in a subprocess because the suite's conftest pins the 8-device
virtual platform for this process.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.quick  # fast confidence tier (VERDICT r4 #9)


def test_dryrun_16dev_data_only_mesh():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # keep the TPU out of tests
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "").replace(
            "--xla_force_host_platform_device_count=8", "")
        + " --xla_force_host_platform_device_count=16"
    ).strip()
    p = subprocess.run(
        [sys.executable, os.path.join(REPO, "__graft_entry__.py"),
         "dryrun", "16", "1"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=600,
    )
    assert p.returncode == 0, f"stdout:\n{p.stdout}\nstderr:\n{p.stderr}"
    assert "dryrun_multichip(16) ok" in p.stdout, p.stdout
    assert "'data': 16" in p.stdout, p.stdout
