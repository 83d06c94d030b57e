#!/usr/bin/env python
"""Probe r4c: bounded-displacement SHIFT-gather warp forward vs the
production one-hot-contraction Pallas kernel (VERDICT r3 item 9).

The production kernel's x-stage builds a (W x P) one-hot and contracts it
on the MXU. When the displacement is bounded (|dx| <= B px — guaranteed
under --stn_bounded_flow), the x-gather is instead expressible as
2B+2 lane-ROLLS of the row-repeated slab with per-lane select masks
(pltpu.roll is a vector-permute, no MXU, no W x P build):

    xs[s,p] = sum_k coeff_k[p] * roll(repeat(slab[s]), -k)
    coeff_k = (1-ax)*[fx-x==k] + ax*[fx-x==k-1]

The y-stage (one-hot over the S-row slab, VPU) is IDENTICAL to the
production kernel, so the A/B isolates the x-stage. Borders (within B px
of the frame) wrap through the roll; the comparison masks them out — a
production version would patch borders exactly like conv_head does.

Forward-only, fp32 and bf16, (32,256,256,4), |disp| <= 8 px. Reports ms
and effective GB/s (bytes = in+out+grid). Win >= 2x -> productionize;
else document in ROADMAP and stop (judge's scope).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nemar_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

B = 8          # displacement bound in px (both axes)
R = 8          # output rows per tile
S = 24         # slab rows: covers fy in [8t-8, 8t+15] for |dy|<=8


def _interpret():
    return jax.default_backend() != "tpu"


def _kernel(img_ref, gx_ref, gy_ref, out_ref, *, c, h, w):
    t = pl.program_id(1)
    p = R * w
    # slab rows [8t-8, 8t+16) clamped into [0, h-S]. Mosaic's divisibility
    # prover can't see through clip(8t-8, 0, h-S) (first TPU run failed on
    # "index in dimension 2 is a multiple of 8"); factor the 8 OUT of the
    # clip so the index is literally 8*x. Requires B % R == 0 and S, h
    # multiples of R (all true: B=R=8, S=24).
    # pl.multiple_of asserts the alignment the prover can't derive through
    # the clip (second TPU run still failed with the factored form at
    # h=256: the mul-of-8 canonicalizes away before the divisibility check)
    row0 = pl.multiple_of(R * jnp.clip(t - B // R, 0, (h - S) // R), R)
    gx = gx_ref[0, 0]         # (1, P) absolute source x (pixels)
    gy = gy_ref[0, 0]
    ix = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1) & (w - 1)  # p mod W
    fx = jnp.floor(gx)
    ax = (gx - fx).astype(jnp.float32)
    dxi = fx.astype(jnp.int32) - ix           # in [-B-1, B+1]
    fy = jnp.floor(gy)
    ay = (gy - fy).astype(jnp.float32)
    ys = fy.astype(jnp.int32) - row0          # slab-row index, (1, P)
    is_ = jax.lax.broadcasted_iota(jnp.int32, (S, p), 0)
    aym = (jnp.where(is_ == ys, 1.0 - ay, 0.0)
           + jnp.where(is_ == ys + 1, ay, 0.0)).astype(jnp.float32)

    rows = []
    for ci in range(c):
        slab = img_ref[0, ci, pl.ds(row0, S), :]       # (S, W)
        xrep = pltpu.repeat(slab, R, axis=1)           # (S, P): p -> p mod W
        xs = jnp.zeros((S, p), jnp.float32)
        for k in range(-B, B + 2):
            coeff = (jnp.where(dxi == k, 1.0 - ax, 0.0)
                     + jnp.where(dxi == k - 1, ax, 0.0))
            rolled = pltpu.roll(xrep, -k % p, 1)
            xs = xs + coeff.astype(jnp.float32) * rolled.astype(jnp.float32)
        rows.append(jnp.sum(aym * xs, axis=0, keepdims=True))
    out_ref[0, 0] = jnp.concatenate(rows, axis=0).astype(out_ref.dtype)


def warp_shift(img, gx, gy):
    """img (N, C, H, W); gx/gy (N, H*W) absolute source coords in px."""
    n, c, h, w = img.shape
    t = h // R
    p = R * w
    gx2 = gx.reshape(n, t, 1, p)
    gy2 = gy.reshape(n, t, 1, p)
    out = pl.pallas_call(
        functools.partial(_kernel, c=c, h=h, w=w),
        grid=(n, t),
        in_specs=[
            pl.BlockSpec((1, c, h, w), lambda i, j: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, p), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, p), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # out laid out (n, t, c, p): the block's last two dims are then
        # exactly (c, p) — the (1, c, 1, p) block violated Mosaic's
        # 8/128 rule on the second-to-last dim (first r4c run)
        out_specs=pl.BlockSpec((1, 1, c, p), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, t, c, p), img.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(img, gx2, gy2)
    return out.reshape(n, t, c, R, w).transpose(0, 2, 1, 3, 4).reshape(
        n, c, h, w)


def reference(img, gx, gy):
    # bilinear, zero handling irrelevant (interior-only compare)
    n, c, h, w = img.shape
    fx = np.floor(gx).astype(int)
    fy = np.floor(gy).astype(int)
    ax = (gx - fx)[:, None]
    ay = (gy - fy)[:, None]
    fx0 = np.clip(fx, 0, w - 1)
    fx1 = np.clip(fx + 1, 0, w - 1)
    fy0 = np.clip(fy, 0, h - 1)
    fy1 = np.clip(fy + 1, 0, h - 1)
    flat = img.reshape(n, c, h * w)
    ni = np.arange(n)[:, None, None]
    g = lambda yy, xx: flat[ni, np.arange(c)[None, :, None],
                            (yy * w + xx)[:, None]]
    v = ((1 - ay) * ((1 - ax) * g(fy0, fx0) + ax * g(fy0, fx1))
         + ay * ((1 - ax) * g(fy1, fx0) + ax * g(fy1, fx1)))
    return v.reshape(n, c, h, w)


def timeit(f, args, steps=32, trials=3, label=""):
    g = jax.jit(lambda *a: jnp.sum(f(*a).astype(jnp.float32)))
    float(g(*args))
    best = float("inf")
    for _ in range(trials):
        t0 = time.time()
        s = 0.0
        for _ in range(steps):
            s = g(*args)
        float(s)
        best = min(best, (time.time() - t0) / steps)
    print(f"{label}: {best * 1e3:.3f} ms", flush=True)
    return best


def check_parity(n, c, h, w, seed=0):
    rng = np.random.RandomState(seed)
    img = rng.randn(n, c, h, w).astype(np.float32)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    dx = (rng.rand(n, h, w).astype(np.float32) * 2 - 1) * (B - 1.5)
    dy = (rng.rand(n, h, w).astype(np.float32) * 2 - 1) * (B - 1.5)
    gx = (xx[None] + dx).reshape(n, h * w)
    gy = (yy[None] + dy).reshape(n, h * w)
    got = np.asarray(warp_shift(jnp.asarray(img), jnp.asarray(gx),
                                jnp.asarray(gy)))
    want = reference(img, gx, gy)
    m = B + 2
    err = np.abs(got[:, :, m:-m, m:-m] - want[:, :, m:-m, m:-m]).max()
    print(f"interior parity ({n},{c},{h},{w}): {err:.2e}", flush=True)
    assert err < 1e-4, err


def main():
    print("backend:", jax.default_backend(), flush=True)
    check_parity(2, 2, 32, 128)

    if jax.default_backend() != "tpu":
        print("cpu interpret: parity only, skipping timing")
        return

    check_parity(2, 4, 256, 256)
    n, c, h, w = 32, 4, 256, 256
    rng = np.random.RandomState(0)
    img = rng.randn(n, c, h, w).astype(np.float32)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    dx = (rng.rand(n, h, w).astype(np.float32) * 2 - 1) * (B - 1.5)
    dy = (rng.rand(n, h, w).astype(np.float32) * 2 - 1) * (B - 1.5)
    gx = (xx[None] + dx).reshape(n, h * w)
    gy = (yy[None] + dy).reshape(n, h * w)
    ji, jx, jy = jnp.asarray(img), jnp.asarray(gx), jnp.asarray(gy)
    dt = timeit(warp_shift, (ji, jx, jy), label="shift-warp fwd f32")
    bytes_ = (img.nbytes + gx.nbytes * 2 + img.nbytes)
    print(f"shift-warp: {bytes_ / dt / 1e9:.2f} GB/s", flush=True)

    # production kernel at the same shapes (NHWC + normalized grid)
    from nemar_tpu.ops.warp import grid_sample
    imgh = jnp.asarray(img.transpose(0, 2, 3, 1))
    grid = jnp.stack([(gx.reshape(n, h, w) + 0.5) * 2 / w - 1,
                      (gy.reshape(n, h, w) + 0.5) * 2 / h - 1], axis=-1)
    grid = jnp.asarray(grid)
    f = lambda im, g: grid_sample(im, g, impl="pallas")
    dt2 = timeit(f, (imgh, grid), label="production pallas warp fwd f32")
    print(f"production: {bytes_ / dt2 / 1e9:.2f} GB/s", flush=True)
    print(f"ratio: {dt2 / dt:.2f}x", flush=True)


if __name__ == "__main__":
    main()
