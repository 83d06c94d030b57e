#!/usr/bin/env python
"""Headline benchmark: full NeMAR training step throughput on one TPU chip.

Measures registered image pairs/sec/chip at 256² (BASELINE.json metric) on
the flagship config: ResNet-6 generator (ngf 64), UNet deformable STN,
70×70 PatchGAN, LSGAN+L1+smoothness — the complete alternating D / G+R
adam step as ONE jitted program, bf16 compute / fp32 params.

vs_baseline: ratio to an ESTIMATED PyTorch A100 reference of 30 pairs/s.
No published baseline exists (BASELINE.md: reference repo publishes no
throughput numbers; its dataset is private). Estimate basis: the full step
is ~250 GFLOPs/pair (G fwd ×2 + bwd, UNet STN, PatchGAN ×2); research-grade
fp32 torch training typically sustains ~20-25% of A100's 19.5 fp32 TFLOPs
→ ~4-5 TFLOPs → ~16-20 pairs/s; with channels-last + TF32 autocast a
well-tuned run reaches ~2x that. 30 pairs/s is the generous midpoint.

stdout = exactly ONE JSON line (driver contract); progress goes to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


A100_REF_PAIRS_PER_SEC = 30.0


def build_model(batch_size: int):
    from nemar_tpu.models import create_model
    from nemar_tpu.options import TrainOptions

    args = [
        "--dataroot", "__synthetic__", "--name", "__bench__", "--model", "nemar",
        "--dataset_mode", "synthetic", "--checkpoints_dir", "/tmp/__bench_ckpt__",
        "--crop_size", "256", "--load_size", "256",
        "--batch_size", str(batch_size),
        "--netG", "resnet_6blocks", "--stn_type", "unet",
        "--gan_mode", "lsgan", "--pool_size", "0",
        "--bf16",
    ]
    opt = TrainOptions().parse(args)
    model = create_model(opt)
    model.setup(opt)
    return model, opt


def bench_train_step(batch_size: int, steps: int = 10, trials: int = 5):
    import jax

    model, opt = build_model(batch_size)
    rng = np.random.default_rng(0)
    batch = {
        "A": rng.standard_normal((batch_size, 256, 256, opt.input_nc), dtype=np.float32),
        "B": rng.standard_normal((batch_size, 256, 256, opt.output_nc), dtype=np.float32),
        "A_paths": ["x"] * batch_size,
    }
    model.set_input(batch)
    log(f"compiling train step (batch {batch_size})...")
    t0 = time.time()
    model.optimize_parameters()
    # NOTE: under the axon relay block_until_ready does NOT wait for remote
    # execution; a host readback is the only honest sync. Each step's state
    # depends on the previous one, so reading the final loss forces the
    # whole chain.
    float(model.get_current_losses()["G"])
    log(f"compile+first step: {time.time() - t0:.1f}s")
    # warmup
    model.optimize_parameters()
    float(model.get_current_losses()["G"])

    # The pooled TPU is time-shared: contention can cost 10-100x on any
    # given window. Take the BEST of several trials — it reflects the
    # framework's capability rather than the neighbors' load.
    best = 0.0
    for trial in range(trials):
        t0 = time.time()
        for _ in range(steps):
            model.optimize_parameters()
        float(model.get_current_losses()["G"])
        dt = time.time() - t0
        pairs_per_sec = batch_size * steps / dt
        log(f"trial {trial}: {steps} steps in {dt:.3f}s -> {pairs_per_sec:.2f} pairs/s")
        best = max(best, pairs_per_sec)
        time.sleep(1)
    return best


def main():
    # Make sure we are on the TPU (bench contract) — no CPU fallback fibs.
    import jax

    backend = jax.default_backend()
    log(f"backend: {backend}, devices: {jax.devices()}")

    pairs = None
    for batch in (32, 16, 8):
        try:
            pairs = bench_train_step(batch)
            break
        except Exception as e:  # OOM etc: try smaller batch
            log(f"batch {batch} failed: {type(e).__name__}: {e}")
    if pairs is None:
        print(json.dumps({
            "metric": "nemar_train_pairs_per_sec_per_chip_256",
            "value": 0.0, "unit": "pairs/s/chip", "vs_baseline": 0.0,
        }))
        return

    print(json.dumps({
        "metric": "nemar_train_pairs_per_sec_per_chip_256",
        "value": round(pairs, 2),
        "unit": "pairs/s/chip",
        "vs_baseline": round(pairs / A100_REF_PAIRS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
