"""Round-3 probe I: step-level levers toward the 5x north star.

Variants:

  step        b32 256² bf16 step, --c7_impl s2d (new baseline, r3g winner)
  step_gb     + --g_batch (one 2N G pass; round-2 measured +26 ms BEFORE
              the warp backward learned to skip data-channel d/dimg —
              retest with the cheaper re-tap)
  step_vmem   baseline under --xla_tpu_scoped_vmem_limit_kib=65536
  head_nchw   head conv via NCHW dimension_numbers (+boundary transposes):
              does the TPU conv emitter pick a spatial-lane layout for
              3-feature outputs when the logical layout is channel-major?

Flag variants re-exec the script with XLA_FLAGS set (proto-backed flags
forward through the axon remote compiler).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
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


def bench_step(extra=(), tag="step"):
    from nemar_tpu.models import create_model
    from nemar_tpu.options import TrainOptions

    args = [
        "--dataroot", "__synthetic__", "--name", "__probe__", "--model", "nemar",
        "--dataset_mode", "synthetic", "--checkpoints_dir", "/tmp/__probe__",
        "--crop_size", "256", "--load_size", "256", "--batch_size", str(B),
        "--netG", "resnet_6blocks", "--stn_type", "unet",
        "--gan_mode", "lsgan", "--pool_size", "0", "--bf16",
        "--c7_impl", "s2d",
    ] + list(extra)
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
        for _ in range(16):
            model.optimize_parameters()
        float(model.get_current_losses()["G"])
        best = min(best, (time.time() - t0) / 16)
    log(f"{tag}: best {best * 1e3:.1f} ms -> {B / best:.1f} pairs/s")
    return best * 1e3


def bench_head_nchw():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, 64), dtype=np.float32)).astype(bf)
    k = jnp.asarray(rng.standard_normal((7, 7, 64, 3)) * 0.02,
                    np.float32).astype(bf)

    def loss(kk, xx):
        xt = jnp.transpose(xx, (0, 3, 1, 2))
        xt = jnp.pad(xt, ((0, 0), (0, 0), (3, 3), (3, 3)), mode="reflect")
        ko = jnp.transpose(kk, (3, 2, 0, 1))  # OIHW
        y = jax.lax.conv_general_dilated(
            xt, ko, (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        y = jnp.transpose(y, (0, 2, 3, 1))
        return jnp.mean(jnp.square(jnp.tanh(y).astype(jnp.float32)))

    f = jax.grad(loss, argnums=(0, 1))
    return timeit(f, (k, x), label="head_nchw")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    log(f"backend: {jax.default_backend()} XLA_FLAGS={os.environ.get('XLA_FLAGS', '')}")
    out = {}
    table = {
        "step": lambda: bench_step(tag="step"),
        "step_gb": lambda: bench_step(("--g_batch",), tag="step_gb"),
        "head_nchw": bench_head_nchw,
        "step_vmem": None,  # handled below (re-exec with XLA_FLAGS)
    }
    for name, fn in table.items():
        if only and name not in only:
            continue
        if name == "step_vmem":
            env = dict(os.environ)
            env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") +
                                " --xla_tpu_scoped_vmem_limit_kib=65536")
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--only", "step"],
                capture_output=True, text=True, env=env)
            sys.stderr.write(r.stderr[-2000:])
            try:
                out["step_vmem"] = json.loads(r.stdout.strip().splitlines()[-1])["step"]
            except Exception as e:
                log(f"step_vmem FAILED: {e}")
                out["step_vmem"] = None
            continue
        try:
            out[name] = round(fn(), 2)
        except Exception as e:
            log(f"{name} FAILED: {type(e).__name__}: {e}")
            out[name] = None
    print(json.dumps(out))


if __name__ == "__main__":
    main()
