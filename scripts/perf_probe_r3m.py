"""Round-3 probe M: fused conv+d2s STN decoder (ops/up_conv.py) in-step.

The STN block was 43.6 ms of the 232.9 ms b32 step (r3k), dominated by the
decoder's full-res resize+conv stages (~200 GFLOP fwd at ~10% MFU). The
fused rewrite computes each stage as a low-res 2x2 conv + depth-to-space
(2.25x fewer MACs, 4x lanes, no upsampled intermediate).

Variants are INTERLEAVED round-robin with per-variant best-of-rounds (the
r2i protocol: the pooled chip's contention oscillates within minutes, so
sequential best-of-3 per variant is garbage). 16-step chains leave ~3 ms
relay bias per step, identical across variants.

  stn_fused / stn_xla   UnetSTN fwd+bwd module-level A/B
  step_f32 / step_x32   full b32 256² bf16 step, fused vs xla decoder
  step_f48              fused decoder at b48
  step_f64              fused decoder at b64 (OOM-guarded)
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


H = W = 256
bf = jnp.bfloat16


def make_stn(up_impl: str):
    from nemar_tpu.models.stn.unet_stn import UnetSTN

    B = 32
    rng = np.random.default_rng(0)
    a = jnp.asarray(
        rng.standard_normal((B, H, W, 1), dtype=np.float32)).astype(bf)
    b = jnp.asarray(
        rng.standard_normal((B, H, W, 3), dtype=np.float32)).astype(bf)
    fake = jnp.asarray(
        rng.standard_normal((B, H, W, 3), dtype=np.float32)).astype(bf)
    stn = UnetSTN(in_channels=4, ngf=32, depth=5, warp_impl="pallas",
                  up_impl=up_impl)
    p = stn.init(jax.random.key(0), a, b, (fake, a))
    p = jax.tree.map(
        lambda v: v.astype(bf) if v.dtype == jnp.float32 else v, p)

    def loss(pp, f_):
        (wf, wa), reg, aux = stn.apply(pp, a, b, (f_, a), n_grad_imgs=1)
        return (jnp.mean(jnp.abs(wf.astype(jnp.float32)))
                + jnp.mean(jnp.abs(wa.astype(jnp.float32)))
                + reg.astype(jnp.float32))

    g = jax.jit(jax.grad(loss, argnums=(0, 1)))

    @jax.jit
    def red(o):
        return jnp.stack([x.astype(jnp.float32).mean()
                          for x in jax.tree.leaves(o)]).mean()

    def chain(steps):
        o = None
        t0 = time.time()
        for _ in range(steps):
            o = g(p, fake)
        float(red(o))
        return (time.time() - t0) / steps * 1e3

    return chain


def make_step(batch: int, extra=()):
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
        "stn_fused": lambda: make_stn("fused"),
        "stn_xla": lambda: make_stn("xla"),
        "step_f32": lambda: make_step(32),
        "step_x32": lambda: make_step(32, ("--stn_up_impl", "xla")),
        "step_f48": lambda: make_step(48),
        "step_f64": lambda: make_step(64),
    }
    chains = {}
    for name, mk in builders.items():
        if only and name not in only:
            continue
        try:
            t0 = time.time()
            ch = mk()
            ch(1)  # compile
            log(f"{name}: compile+first {time.time() - t0:.1f}s")
            chains[name] = ch
        except Exception as e:
            log(f"{name} BUILD FAILED: {type(e).__name__}: {e}")

    best = {k: float("inf") for k in chains}
    for r in range(args.rounds):
        for name, ch in chains.items():
            dt = ch(args.steps)
            best[name] = min(best[name], dt)
            log(f"round {r} {name}: {dt:.1f} ms (best {best[name]:.1f})")
    out = {k: round(v, 2) for k, v in best.items()}
    for k, v in out.items():
        if k.startswith("step_"):
            b = int(k[-2:])
            log(f"{k}: {v} ms -> {b / v * 1e3:.1f} pairs/s")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
