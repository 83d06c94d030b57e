"""Round-3 probe G: s2d c7s1 rewrite A/B (isolated + full step).

Variants (run any subset with --only, comma-separated):

  head_x     7x7 64->3 + tanh @256² fwd+bwd, direct lowering (r3d: 21 ms)
  head_s2d   same math via ops/conv_s2d.py (blocked, MXU-aligned)
  c7in_x     encoder c7s1: 7x7 1->64 + IN + relu @256² fwd+bwd, direct
  c7in_s2d   same with the s2d conv
  step_x     full NeMAR step b32 256² bf16 (production XLA baseline)
  step_s2d   full step with --c7_impl s2d
  step_ps2d  full step with --block_impl pallas --c7_impl s2d

Adjacent-variant ordering keeps each A/B inside one contention window;
scalar-readback timing per CLAUDE.md.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from nemar_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


B, H, W = 32, 256, 256
bf = jnp.bfloat16


def timeit(f, args, steps=8, trials=3, label=""):
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


def bench_step(block_impl: str = "xla", c7_impl: str = "xla", tag=""):
    from nemar_tpu.models import create_model
    from nemar_tpu.options import TrainOptions

    args = [
        "--dataroot", "__synthetic__", "--name", "__probe__", "--model", "nemar",
        "--dataset_mode", "synthetic", "--checkpoints_dir", "/tmp/__probe__",
        "--crop_size", "256", "--load_size", "256", "--batch_size", str(B),
        "--netG", "resnet_6blocks", "--stn_type", "unet",
        "--gan_mode", "lsgan", "--pool_size", "0", "--bf16",
        "--block_impl", block_impl, "--c7_impl", c7_impl,
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
    log(f"{tag}: compile+first {time.time() - t0:.1f}s")
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(8):
            model.optimize_parameters()
        float(model.get_current_losses()["G"])
        best = min(best, (time.time() - t0) / 8)
    log(f"{tag}: best {best * 1e3:.1f} ms -> {B / best:.1f} pairs/s")
    return best * 1e3


def _head_params(cin, cout, key=0):
    rng = np.random.default_rng(key)
    k = jnp.asarray(rng.standard_normal((7, 7, cin, cout)) * 0.02,
                    np.float32).astype(bf)
    b = jnp.zeros((cout,), bf)
    return k, b


def bench_head(s2d: bool):
    from nemar_tpu.ops.conv_s2d import conv7_s2d

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, 64), dtype=np.float32)).astype(bf)
    k, b = _head_params(64, 3)

    def loss(kk, bb, xx):
        if s2d:
            h = conv7_s2d(xx, kk) + bb
        else:
            hp = jnp.pad(xx, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
            h = jax.lax.conv_general_dilated(
                hp, kk, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + bb
        return jnp.mean(jnp.square(jnp.tanh(h).astype(jnp.float32)))

    f = jax.grad(loss, argnums=(0, 1, 2))
    return timeit(f, (k, b, x), label=f"head_{'s2d' if s2d else 'x'}")


def bench_c7in(s2d: bool):
    from nemar_tpu.ops.conv_s2d import conv7_s2d
    from nemar_tpu.ops.norm import instance_norm_act

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, 1), dtype=np.float32)).astype(bf)
    k, b = _head_params(1, 64)

    def loss(kk, bb, xx):
        if s2d:
            h = conv7_s2d(xx, kk) + bb
        else:
            hp = jnp.pad(xx, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
            h = jax.lax.conv_general_dilated(
                hp, kk, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + bb
        h = instance_norm_act(h, act="relu")
        return jnp.mean(jnp.square(h.astype(jnp.float32)))

    f = jax.grad(loss, argnums=(0, 1, 2))
    return timeit(f, (k, b, x), label=f"c7in_{'s2d' if s2d else 'x'}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    log(f"backend: {jax.default_backend()}")
    out = {}
    table = {
        "head_x": lambda: bench_head(False),
        "head_s2d": lambda: bench_head(True),
        "c7in_x": lambda: bench_c7in(False),
        "c7in_s2d": lambda: bench_c7in(True),
        "step_x": lambda: bench_step("xla", "xla", tag="step_x"),
        "step_s2d": lambda: bench_step("xla", "s2d", tag="step_s2d"),
        "step_ps2d": lambda: bench_step("pallas", "s2d", tag="step_ps2d"),
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
