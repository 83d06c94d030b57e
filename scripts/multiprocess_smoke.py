#!/usr/bin/env python
"""Multi-PROCESS (simulated multi-host) training smoke.

Spawns 2 processes, each with 4 virtual CPU devices (= a 2-host, 8-chip
"pod"), initializes jax.distributed, builds the global ('data','spatial')
mesh over ALL devices, and runs one full NeMAR train step with each host
feeding only its local batch shard (jax.make_array_from_process_local_data)
— the real multi-host pattern for a v5e-16: per-host data loading (grain
ShardOptions) + global pjit step + cross-host collectives.

Run (no args: spawns both workers):  python scripts/multiprocess_smoke.py
Exit 0 = both workers ran the sharded step with finite losses.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_PROC = 2
LOCAL_DEVICES = 4
PORT = 12357


def worker(pid: int):
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={LOCAL_DEVICES}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{PORT}",
        num_processes=N_PROC,
        process_id=pid,
    )
    assert jax.process_count() == N_PROC
    assert len(jax.devices()) == N_PROC * LOCAL_DEVICES, jax.devices()

    import numpy as np

    from nemar_tpu.models import create_model
    from nemar_tpu.options import TrainOptions

    global_batch = 8
    opt = TrainOptions().parse([
        "--dataroot", "__synthetic__", "--name", f"mp{pid}", "--model", "nemar",
        "--dataset_mode", "synthetic", "--checkpoints_dir", f"/tmp/mp_ckpt_{pid}",
        "--crop_size", "32", "--load_size", "32",
        "--batch_size", str(global_batch),
        "--ngf", "8", "--ndf", "8", "--stn_ngf", "8", "--stn_depth", "3",
        "--num_devices", str(N_PROC * LOCAL_DEVICES), "--mesh_spatial", "2",
    ])
    model = create_model(opt)
    model.setup(opt)

    # each "host" materializes only ITS slice of the global batch (what a
    # per-host grain shard would deliver), then assembles the global array
    from jax.sharding import NamedSharding, PartitionSpec as P

    rng = np.random.default_rng(0)  # same stream; each host keeps its slice
    full_a = rng.standard_normal((global_batch, 32, 32, 1), dtype=np.float32)
    full_b = rng.standard_normal((global_batch, 32, 32, 3), dtype=np.float32)
    per = global_batch // N_PROC
    sd = NamedSharding(model.mesh, P("data"))
    a = jax.make_array_from_process_local_data(
        sd, full_a[pid * per:(pid + 1) * per], full_a.shape)
    b = jax.make_array_from_process_local_data(
        sd, full_b[pid * per:(pid + 1) * per], full_b.shape)
    model.real_A, model.real_B = a, b
    model.image_paths = ["mp"] * global_batch
    model.optimize_parameters()
    losses = model.get_current_losses()
    assert all(np.isfinite(v) for v in losses.values()), losses
    print(f"[proc {pid}] sharded step ok over {jax.device_count()} devices "
          f"({jax.process_count()} hosts): {dict(losses)}", flush=True)


def main():
    if len(sys.argv) > 1:
        worker(int(sys.argv[1]))
        return
    procs = [
        subprocess.Popen([sys.executable, os.path.abspath(__file__), str(i)],
                         cwd=REPO)
        for i in range(N_PROC)
    ]
    rcs = [p.wait(timeout=900) for p in procs]
    if any(rcs):
        raise SystemExit(f"worker rcs: {rcs}")
    print("multiprocess smoke: OK")


if __name__ == "__main__":
    main()
