"""Round-3 probe K: warp/STN true costs + fact STN heads in-step.

32-step chains cut the relay's per-chain ~47 ms to ~1.5 ms/step of bias
(r3h post-mortem: 8-step chains carried ~6 ms/step of it).

  warp1_f      pallas grid_sample fwd, (32,256,256,3), production flow
  warpm_fb     multi-warp (3ch grad + 1ch data) fwd+bwd — the step's call
  warpm_x_fb   same via impl=xla (one-hot mm path)
  stn_fb       full UnetSTN (ngf32 d5, in 1+3) apply incl warp, fwd+bwd
  step_auto    b32 256² bf16 step, --c7_impl auto (baseline)
  step_sf      + --stn_head_impl fact
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


def timeit(f, args, steps=32, trials=3, label=""):
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


def _flow():
    rng = np.random.default_rng(0)
    from nemar_tpu.ops.warp import identity_grid

    flow = jnp.asarray(
        np.clip(rng.standard_normal((B, H, W, 2)) * 0.02, -0.05, 0.05
                ).astype(np.float32))
    return identity_grid(H, W, False, jnp.float32)[None] + flow


def bench_warp1_f():
    from nemar_tpu.ops.warp import grid_sample

    rng = np.random.default_rng(0)
    img = jnp.asarray(
        rng.standard_normal((B, H, W, 3), dtype=np.float32)).astype(bf)
    grid = _flow()
    return timeit(lambda i, g: grid_sample(i, g, impl="pallas"),
                  (img, grid), label="warp1_f")


def bench_warpm(impl: str):
    from nemar_tpu.ops.warp import grid_sample_multi

    rng = np.random.default_rng(0)
    fake = jnp.asarray(
        rng.standard_normal((B, H, W, 3), dtype=np.float32)).astype(bf)
    a = jnp.asarray(
        rng.standard_normal((B, H, W, 1), dtype=np.float32)).astype(bf)
    grid = _flow()

    def loss(f_, g_):
        wf, wa = grid_sample_multi((f_, a), g_, impl=impl, n_grad_imgs=1)
        return (jnp.mean(jnp.abs(wf.astype(jnp.float32)))
                + jnp.mean(jnp.abs(wa.astype(jnp.float32))))

    f = jax.grad(loss, argnums=(0, 1))
    return timeit(f, (fake, grid),
                  label=f"warpm_{'x_' if impl == 'xla' else ''}fb")


def bench_stn():
    from nemar_tpu.models.stn.unet_stn import UnetSTN

    rng = np.random.default_rng(0)
    a = jnp.asarray(
        rng.standard_normal((B, H, W, 1), dtype=np.float32)).astype(bf)
    b = jnp.asarray(
        rng.standard_normal((B, H, W, 3), dtype=np.float32)).astype(bf)
    fake = jnp.asarray(
        rng.standard_normal((B, H, W, 3), dtype=np.float32)).astype(bf)
    stn = UnetSTN(in_channels=4, ngf=32, depth=5, warp_impl="pallas")
    p = stn.init(jax.random.key(0), a, b, (fake, a))
    p = jax.tree.map(
        lambda v: v.astype(bf) if v.dtype == jnp.float32 else v, p)

    def loss(pp, f_):
        (wf, wa), reg, aux = stn.apply(pp, a, b, (f_, a), n_grad_imgs=1)
        return (jnp.mean(jnp.abs(wf.astype(jnp.float32)))
                + jnp.mean(jnp.abs(wa.astype(jnp.float32)))
                + reg.astype(jnp.float32))

    f = jax.grad(loss, argnums=(0, 1))
    return timeit(f, (p, fake), label="stn_fb")


def bench_step(extra=(), tag="step"):
    from nemar_tpu.models import create_model
    from nemar_tpu.options import TrainOptions

    args = [
        "--dataroot", "__synthetic__", "--name", "__probe__", "--model", "nemar",
        "--dataset_mode", "synthetic", "--checkpoints_dir", "/tmp/__probe__",
        "--crop_size", "256", "--load_size", "256", "--batch_size", str(B),
        "--netG", "resnet_6blocks", "--stn_type", "unet",
        "--gan_mode", "lsgan", "--pool_size", "0", "--bf16",
        "--c7_impl", "auto",
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    log(f"backend: {jax.default_backend()}")
    out = {}
    table = {
        "warp1_f": bench_warp1_f,
        "warpm_fb": lambda: bench_warpm("pallas"),
        "warpm_x_fb": lambda: bench_warpm("xla"),
        "stn_fb": bench_stn,
        "step_auto": lambda: bench_step(tag="step_auto"),
        "step_sf": lambda: bench_step(("--stn_head_impl", "fact"),
                                      tag="step_sf"),
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
