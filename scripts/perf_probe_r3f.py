"""Round-3 probe F: post-fusion step breakdown + warp grad_channels A/B.

Variants (run any subset with --only, comma-separated):

  step_p     full NeMAR step b32 256² bf16, --block_impl pallas (production)
  warp_full  multi-warp C=3+3 fwd+bwd, d/dimg for ALL channels (old behavior)
  warp_gc    same with n_grad_imgs=1 (production: real_A scatter skipped)
  enc        generator encoder (c7s1-64 on 1ch + d128 + d256, IN+relu)
             fwd+bwd @256²
  c7in       first conv alone: 7x7 1->64 + IN + relu @256² fwd+bwd
  head       decoder head: 7x7 64->3 + tanh @256² fwd+bwd (r3d: 21 ms)
  trunkf     fused Pallas ResNet trunk (6 blocks, 64² C256) fwd+bwd

All timings scalar-readback (CLAUDE.md measurement rule), best-of-trials.
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


def bench_step(impl: str = "pallas"):
    from nemar_tpu.models import create_model
    from nemar_tpu.options import TrainOptions

    args = [
        "--dataroot", "__synthetic__", "--name", "__probe__", "--model", "nemar",
        "--dataset_mode", "synthetic", "--checkpoints_dir", "/tmp/__probe__",
        "--crop_size", "256", "--load_size", "256", "--batch_size", str(B),
        "--netG", "resnet_6blocks", "--stn_type", "unet",
        "--gan_mode", "lsgan", "--pool_size", "0", "--bf16",
        "--block_impl", impl,
    ]
    old = sys.stdout
    sys.stdout = sys.stderr
    try:
        opt = TrainOptions().parse(args)
        from nemar_tpu.models import create_model as cm

        model = cm(opt)
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
    log(f"step_{impl[0]}: compile+first {time.time() - t0:.1f}s")
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(8):
            model.optimize_parameters()
        float(model.get_current_losses()["G"])
        best = min(best, (time.time() - t0) / 8)
    log(f"step_{impl[0]}: best {best * 1e3:.1f} ms -> {B / best:.1f} pairs/s")
    return best * 1e3


def bench_warp(gc: bool):
    from nemar_tpu.ops.warp import grid_sample_multi, identity_grid

    rng = np.random.default_rng(0)
    fake = jnp.asarray(rng.standard_normal((B, H, W, 3), dtype=np.float32)).astype(bf)
    a = jnp.asarray(rng.standard_normal((B, H, W, 3), dtype=np.float32)).astype(bf)
    flow = jnp.asarray(
        np.clip(rng.standard_normal((B, H, W, 2)) * 0.02, -0.05, 0.05
                ).astype(np.float32))
    grid = identity_grid(H, W, False, jnp.float32)[None] + flow

    def loss(f_, g_):
        wf, wa = grid_sample_multi((f_, a), g_, impl="pallas",
                                   n_grad_imgs=(1 if gc else -1))
        return (jnp.mean(jnp.abs(wf.astype(jnp.float32)))
                + jnp.mean(jnp.abs(wa.astype(jnp.float32))))

    f = jax.grad(loss, argnums=(0, 1))
    return timeit(f, (fake, grid), label=f"warp_{'gc' if gc else 'full'}")


class _Enc(nn.Module):
    first_only: bool = False

    @nn.compact
    def __call__(self, x):
        from nemar_tpu.ops.norm import instance_norm_act

        h = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        h = nn.Conv(64, (7, 7), padding="VALID", use_bias=True)(h)
        h = instance_norm_act(h, act="relu")
        if self.first_only:
            return h
        for ch in (128, 256):
            h = nn.Conv(ch, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)), use_bias=True)(h)
            h = instance_norm_act(h, act="relu")
        return h


def bench_enc(first_only: bool):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, 1), dtype=np.float32)).astype(bf)
    m = _Enc(first_only=first_only)
    p = m.init(jax.random.key(0), x)
    p = jax.tree.map(lambda v: v.astype(bf) if v.dtype == jnp.float32 else v, p)

    def loss(pp, xx):
        return jnp.mean(jnp.square(m.apply(pp, xx).astype(jnp.float32)))

    f = jax.grad(loss, argnums=(0,))
    return timeit(f, (p, x), label="c7in" if first_only else "enc")


class _Head(nn.Module):
    @nn.compact
    def __call__(self, x):
        h = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        h = nn.Conv(3, (7, 7), padding="VALID", use_bias=True)(h)
        return jnp.tanh(h)


def bench_head():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, 64), dtype=np.float32)).astype(bf)
    m = _Head()
    p = m.init(jax.random.key(0), x)
    p = jax.tree.map(lambda v: v.astype(bf) if v.dtype == jnp.float32 else v, p)

    def loss(pp, xx):
        return jnp.mean(jnp.square(m.apply(pp, xx).astype(jnp.float32)))

    f = jax.grad(loss, argnums=(0, 1))
    return timeit(f, (p, x), label="head")


def bench_trunkf():
    from nemar_tpu.ops.conv_fused import fused_resblock

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((B, 64, 64, 256), dtype=np.float32)).astype(bf)
    ws = [
        (jnp.asarray(rng.standard_normal((3, 3, 256, 256), dtype=np.float32))
         .astype(bf) * 0.02,
         jnp.asarray(rng.standard_normal((3, 3, 256, 256), dtype=np.float32))
         .astype(bf) * 0.02)
        for _ in range(6)
    ]

    def loss(xx, wlist):
        h = xx
        for w1, w2 in wlist:
            h = fused_resblock(h, w1, w2)
        return jnp.mean(jnp.square(h.astype(jnp.float32)))

    f = jax.grad(loss, argnums=(0, 1))
    return timeit(f, (x, ws), label="trunkf")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    log(f"backend: {jax.default_backend()}")
    out = {}
    table = {
        "warp_full": lambda: bench_warp(False),
        "warp_gc": lambda: bench_warp(True),
        "head": bench_head,
        "c7in": lambda: bench_enc(True),
        "enc": lambda: bench_enc(False),
        "trunkf": bench_trunkf,
        "step_p": bench_step,
        "step_x": lambda: bench_step("xla"),
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
