"""Round-3 probe Q: the b48 headline candidates, one window.

r3n/r3o: b48 pallas trunk 338.5 ms vs b48 xla 347.8/348.3 (adjacent
windows). This probe settles the bench ladder head with all contenders
interleaved in ONE window, including the new flat Adam (--opt_fused,
probe r3o: the per-leaf update costs 6.2 ms standalone).

  pa48     b48 pallas trunk + c7 auto
  pa48f    b48 pallas trunk + c7 auto + opt_fused
  xa48f    b48 xla trunk + c7 auto + opt_fused
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


def make_step(batch, block_impl, c7, opt_fused):
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
    ] + (["--opt_fused"] if opt_fused else [])
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
    ap.add_argument("--steps", type=int, default=24)
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    log(f"backend: {jax.default_backend()}")
    builders = {
        "pa48": lambda: make_step(48, "pallas", "auto", False),
        "pa48f": lambda: make_step(48, "pallas", "auto", True),
        "xa48f": lambda: make_step(48, "xla", "auto", True),
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
            log(f"round {r} {name}: {dt:.2f} ms (best {best[name]:.2f}"
                f" -> {48 / best[name] * 1e3:.1f} pairs/s)")
    print(json.dumps({k: (round(v, 2) if v < float("inf") else None)
                      for k, v in best.items()}))


if __name__ == "__main__":
    main()
