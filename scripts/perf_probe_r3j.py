"""Round-3 probe J: (7x1)∘(1x7) factorized head A/B (ops/conv_fact.py).

  head_x     direct 7x7 64->3 + tanh fwd+bwd (r3g: 26.9 ms incl ~6 ms
             relay amortization)
  head_fact  factorized head, same math
  step_s2d   full b32 256² bf16 step, --c7_impl s2d (in-window baseline)
  step_auto  full step, --c7_impl auto (s2d encoder + fact head)
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
import jax.numpy as jnp
import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


B, H, W = 32, 256, 256
bf = jnp.bfloat16


def timeit(f, args, steps=16, trials=3, label=""):
    @jax.jit
    def g(*a):
        o = f(*a)
        return jnp.stack([x.astype(jnp.float32).mean()
                          for x in jax.tree.leaves(o)]).mean()

    t0 = time.time()
    float(g(*args))
    log(f"{label}: compile+first {time.time() - t0:.1f}s")
    best = float("inf")
    for _ in range(trials):
        t0 = time.time()
        for _ in range(steps):
            o = g(*args)
        float(o)
        best = min(best, (time.time() - t0) / steps)
    log(f"{label}: best {best * 1e3:.2f} ms")
    return best * 1e3


def bench_head(fact: bool):
    from nemar_tpu.ops.conv_fact import conv7_fact

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, 64), dtype=np.float32)).astype(bf)
    k = jnp.asarray(rng.standard_normal((7, 7, 64, 3)) * 0.02,
                    np.float32).astype(bf)

    def loss(kk, xx):
        if fact:
            h = conv7_fact(xx, kk)
        else:
            hp = jnp.pad(xx, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
            h = jax.lax.conv_general_dilated(
                hp, kk, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.mean(jnp.square(jnp.tanh(h).astype(jnp.float32)))

    f = jax.grad(loss, argnums=(0, 1))
    return timeit(f, (k, x), label=f"head_{'fact' if fact else 'x'}")


def bench_step(c7: str):
    from nemar_tpu.models import create_model
    from nemar_tpu.options import TrainOptions

    args = [
        "--dataroot", "__synthetic__", "--name", "__probe__", "--model", "nemar",
        "--dataset_mode", "synthetic", "--checkpoints_dir", "/tmp/__probe__",
        "--crop_size", "256", "--load_size", "256", "--batch_size", str(B),
        "--netG", "resnet_6blocks", "--stn_type", "unet",
        "--gan_mode", "lsgan", "--pool_size", "0", "--bf16",
        "--c7_impl", c7,
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
    batch = {
        "A": rng.standard_normal((B, 256, 256, opt.input_nc), dtype=np.float32),
        "B": rng.standard_normal((B, 256, 256, opt.output_nc), dtype=np.float32),
        "A_paths": ["x"] * B,
    }
    model.set_input(batch)
    t0 = time.time()
    model.optimize_parameters()
    float(model.get_current_losses()["G"])
    log(f"step_{c7}: compile+first {time.time() - t0:.1f}s")
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(16):
            model.optimize_parameters()
        float(model.get_current_losses()["G"])
        best = min(best, (time.time() - t0) / 16)
    log(f"step_{c7}: best {best * 1e3:.1f} ms -> {B / best:.1f} pairs/s")
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    log(f"backend: {jax.default_backend()}")
    out = {}
    table = {
        "head_x": lambda: bench_head(False),
        "head_fact": lambda: bench_head(True),
        "step_s2d": lambda: bench_step("s2d"),
        "step_auto": lambda: bench_step("auto"),
    }
    for name, fn in table.items():
        if only and name not in only:
            continue
        try:
            out[name] = round(fn(), 2)
        except Exception as e:
            log(f"{name} FAILED: {type(e).__name__}: {e}")
            out[name] = None
    print(json.dumps(out))


if __name__ == "__main__":
    main()
