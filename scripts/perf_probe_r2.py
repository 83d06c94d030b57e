#!/usr/bin/env python
"""Round-2 perf probe: time full NeMAR step variants in ONE TPU window.

The pooled chip is contended; every variant is interleaved with a matmul
control so we can normalize by the window's effective speed. Timing forces
a host readback (block_until_ready is a no-op under the relay).

Run: python scripts/perf_probe_r2.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


def readback(x):
    import jax

    return np.asarray(jax.tree.leaves(x)[0].astype("float32")).ravel()[:1]


def matmul_control():
    import jax
    import jax.numpy as jnp

    k = jax.random.key(0)
    a = jax.random.normal(k, (4096, 4096), jnp.bfloat16)
    f = jax.jit(lambda x: x @ x)
    readback(f(a))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        o = f(a)
        for _ in range(4):
            o = f(o)
        readback(o)
        best = min(best, (time.time() - t0) / 5)
    tflops = 2 * 4096**3 / best / 1e12
    return tflops


def build(batch, extra):
    from nemar_tpu.models import create_model
    from nemar_tpu.options import TrainOptions

    args = [
        "--dataroot", "__synthetic__", "--name", "__probe__", "--model", "nemar",
        "--dataset_mode", "synthetic", "--checkpoints_dir", "/tmp/__probe_ckpt__",
        "--crop_size", "256", "--load_size", "256",
        "--batch_size", str(batch),
        "--netG", "resnet_6blocks", "--stn_type", "unet",
        "--gan_mode", "lsgan", "--pool_size", "0", "--bf16",
    ] + extra
    old = sys.stdout
    sys.stdout = sys.stderr
    try:
        opt = TrainOptions().parse(args)
        model = create_model(opt)
        model.setup(opt)
    finally:
        sys.stdout = old
    return model, opt


def time_step(model, batch, steps=8, trials=3):
    rng = np.random.default_rng(0)
    data = {
        "A": rng.standard_normal((batch, 256, 256, 1), dtype=np.float32),
        "B": rng.standard_normal((batch, 256, 256, 3), dtype=np.float32),
        "A_paths": ["x"] * batch,
    }
    model.set_input(data)
    t0 = time.time()
    model.optimize_parameters()
    float(model.get_current_losses()["G"])
    log(f"  compile+first: {time.time() - t0:.1f}s")
    best = float("inf")
    for _ in range(trials):
        t0 = time.time()
        for _ in range(steps):
            model.optimize_parameters()
        float(model.get_current_losses()["G"])
        best = min(best, (time.time() - t0) / steps)
    return best


def main():
    import jax

    log(f"backend: {jax.default_backend()}")
    batch = 32
    variants = [
        ("base_r1", []),                                   # warp auto(pallas), norm xla
        ("norm_pallas", ["--norm_impl", "pallas"]),
        ("warp_mm", ["--warp_impl", "mm"]),
        ("norm_pallas_warp_mm", ["--norm_impl", "pallas", "--warp_impl", "mm"]),
    ]
    results = {}
    for name, extra in variants:
        c0 = matmul_control()
        log(f"[{name}] control {c0:.1f} TFLOP/s")
        model, _ = build(batch, extra)
        dt = time_step(model, batch)
        c1 = matmul_control()
        pairs = batch / dt
        results[name] = {
            "ms": round(dt * 1e3, 1), "pairs_per_s": round(pairs, 1),
            "ctl_tflops": [round(c0, 1), round(c1, 1)],
        }
        log(f"[{name}] {dt*1e3:.1f} ms/step = {pairs:.1f} pairs/s "
            f"(ctl {c0:.0f}/{c1:.0f} TF)")
        del model
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
