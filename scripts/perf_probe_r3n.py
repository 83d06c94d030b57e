"""Round-3 probe N: Pallas fused-block trunk + c7 rewrites, in-step retry.

The trunk (6 ResNet blocks, 64² C=256) runs TWICE per step — ~104 ms of
the 233 ms b32 step at ~55% MFU under XLA. The fused Pallas block kernel
measured 129 TFLOPs (~66% MFU) isolated (probe r3d) — a ~17 ms/step
upside — but probe r3f saw no in-step win, and combining it with the c7
rewrites SIGKILLed the remote compile helper. Round-3 session-2 finding:
that helper runs ON THIS HOST and dies under concurrent CPU load — the
earlier OOM may have been contention, not the program. Host is idle now;
retry the combination and re-A/B the trunk in-step, interleaved.

  step_xa    b32 xla trunk + c7 auto (production baseline)
  step_pa    b32 pallas trunk + c7 auto (the blocked combination)
  step_px    b32 pallas trunk + c7 xla (r3f's shape, re-measured)
  step_pa48  b48 pallas trunk + c7 auto
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from nemar_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

import jax
import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


H = W = 256


def make_step(batch: int, block_impl: str, c7: str):
    from nemar_tpu.models import create_model
    from nemar_tpu.options import TrainOptions

    args = [
        "--dataroot", "__synthetic__", "--name", "__probe__",
        "--model", "nemar", "--dataset_mode", "synthetic",
        "--checkpoints_dir", "/tmp/__probe__",
        "--crop_size", "256", "--load_size", "256",
        "--batch_size", str(batch),
        "--netG", "resnet_6blocks", "--stn_type", "unet",
        "--gan_mode", "lsgan", "--pool_size", "0", "--bf16",
        "--block_impl", block_impl, "--c7_impl", c7,
    ]
    old = sys.stdout
    sys.stdout = sys.stderr
    try:
        opt = TrainOptions().parse(args)
        model = create_model(opt)
        model.setup(opt)
    finally:
        sys.stdout = old
    rng = np.random.default_rng(0)
    b = {
        "A": rng.standard_normal((batch, H, W, opt.input_nc),
                                 dtype=np.float32),
        "B": rng.standard_normal((batch, H, W, opt.output_nc),
                                 dtype=np.float32),
        "A_paths": ["x"] * batch,
    }
    model.set_input(b)

    def chain(steps):
        t0 = time.time()
        for _ in range(steps):
            model.optimize_parameters()
        float(model.get_current_losses()["G"])
        return (time.time() - t0) / steps * 1e3

    return chain


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", type=str, default="")
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--steps", type=int, default=16)
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    log(f"backend: {jax.default_backend()}")
    builders = {
        "step_xa": lambda: make_step(32, "xla", "auto"),
        "step_pa": lambda: make_step(32, "pallas", "auto"),
        "step_px": lambda: make_step(32, "pallas", "xla"),
        "step_pa48": lambda: make_step(48, "pallas", "auto"),
    }
    chains = {}
    for name, mk in builders.items():
        if only and name not in only:
            continue
        try:
            t0 = time.time()
            ch = mk()
            ch(1)
            log(f"{name}: compile+first {time.time() - t0:.1f}s")
            chains[name] = ch
        except Exception as e:
            log(f"{name} BUILD FAILED: {type(e).__name__}: {e}")

    best = {k: float("inf") for k in chains}
    for r in range(args.rounds):
        for name, ch in chains.items():
            try:
                dt = ch(args.steps)
            except Exception as e:
                log(f"round {r} {name} FAILED: {type(e).__name__}")
                continue
            best[name] = min(best[name], dt)
            log(f"round {r} {name}: {dt:.1f} ms (best {best[name]:.1f})")
    out = {k: (round(v, 2) if v < float("inf") else None)
           for k, v in best.items()}
    for k, v in out.items():
        if v:
            b = 48 if k.endswith("48") else 32
            log(f"{k}: {v} ms -> {b / v * 1e3:.1f} pairs/s")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
