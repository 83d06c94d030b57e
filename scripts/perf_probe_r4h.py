#!/usr/bin/env python
"""Probe r4h: dx-preshifted contiguous planes vs production slab slices
in the fused ResNet-block kernel (ops/conv_fused.py).

Hypothesis: every `pad_ref[dy:dy+h, dx:dx+w, :].reshape(h*w, c)` slab in
the production kernel is a sublane-misaligned sub-slice (width w out of
w+2) whose reshape is non-contiguous -> Mosaic materializes a relayout
copy per slab: 18 in the forward and ~24 in the backward per block-sample.
The r3e measurement put misaligned-slice relayouts at ~0.6 TB/s effective,
i.e. ~60 us/sample fwd at (64, 64, 256) bf16 — the same order as the 18
matmuls themselves (49 us at peak). That would explain most of the trunk
kernel's missing MFU (129 of ~197 TFLOPs, probe r3a).

Variant: after each reflect-pad fill, copy THREE dx-shifted w-wide planes
into a (3, h+2, w, c) scratch once per conv; every slab is then a free
major-dim slice + contiguous reshape. 3 relayout copies instead of 9 per
conv (and 3+3 instead of ~12 per backward stage).

A/B at the production trunk shape (48, 64, 64, 256) bf16, same window:
fwd and fwd+bwd, parity asserted on-device first. One JSON line.
"""

from __future__ import annotations

import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nemar_tpu.utils.compile_cache import enable_compilation_cache
from nemar_tpu.ops.conv_fused import (
    _TAPS, _fill_pad, _in_stats, _in_bwd, _pad_adjoint, _interpret,
    fused_resblock,
)

enable_compilation_cache()


def log(m):
    print(m, file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# variant kernels (preshifted planes)
# ---------------------------------------------------------------------------


def _fill_planes(pl_ref, pad_ref, w):
    """pl_ref (3, H+2, W, C) <- the three dx-shifted w-wide windows of
    pad_ref (H+2, W+2, C). Each store is ONE relayout; afterwards every
    (dy, dx) slab is a free leading-dim slice with a contiguous reshape."""
    for dx in range(3):
        pl_ref[dx] = pad_ref[:, dx:dx + w, :]


def _conv9_planes(pl_ref, w_ref, h, w, c, acc_dtype=jnp.float32):
    acc = None
    for dy, dx in _TAPS:
        slab = pl_ref[dx, dy:dy + h].reshape(h * w, c)
        p = jax.lax.dot_general(
            slab, w_ref[dy, dx],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=acc_dtype,
        )
        acc = p if acc is None else acc + p
    return acc


def _fwd_kernel_v2(x_ref, w1_ref, w2_ref, out_ref, y1_ref, st_ref,
                   pad_ref, pl_ref, *, h, w, c, eps):
    hw = float(h * w)
    cdt = x_ref.dtype

    _fill_pad(pad_ref, x_ref[0], h, w)
    _fill_planes(pl_ref, pad_ref, w)
    y1 = _conv9_planes(pl_ref, w1_ref, h, w, c)
    mu1, rstd1 = _in_stats(y1, hw, eps)
    y1hat = (y1 - mu1) * rstd1
    y1_ref[0] = y1hat.reshape(h, w, c).astype(y1_ref.dtype)
    h1 = jnp.maximum(y1hat, 0.0).astype(cdt)

    _fill_pad(pad_ref, h1.reshape(h, w, c), h, w)
    _fill_planes(pl_ref, pad_ref, w)
    y2 = _conv9_planes(pl_ref, w2_ref, h, w, c)
    mu2, rstd2 = _in_stats(y2, hw, eps)
    y2hat = (y2 - mu2) * rstd2

    out_ref[0] = (x_ref[0].astype(jnp.float32)
                  + y2hat.reshape(h, w, c)).astype(out_ref.dtype)
    st_ref[0] = jnp.concatenate([mu1, rstd1, mu2, rstd2], axis=0)


def _fwd_pallas_v2(x, w1, w2, eps):
    n, h, w_, c = x.shape
    kernel = functools.partial(_fwd_kernel_v2, h=h, w=w_, c=c, eps=eps)
    out, y1, st = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w_, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, c, c), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, c, c), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, h, w_, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w_, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h, w_, c), x.dtype),
            jax.ShapeDtypeStruct((n, h, w_, c), x.dtype),
            jax.ShapeDtypeStruct((n, 4, c), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((h + 2, w_ + 2, c), x.dtype),
            pltpu.VMEM((3, h + 2, w_, c), x.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(x, w1, w2)
    return out, y1, st


def _dw9_planes(pl_ref, dz3, dw_ref, first, h, w, c):
    for dy, dx in _TAPS:
        slab = pl_ref[dx, dy:dy + h].reshape(h * w, c)
        d = jax.lax.dot_general(
            slab, dz3,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(first)
        def _():
            dw_ref[dy, dx] = d

        @pl.when(jnp.logical_not(first))
        def _():
            dw_ref[dy, dx] += d


def _conv_adjoint_v2(dz3, w_ref, dzp_ref, az_ref, dpad_ref, h, w, c):
    """Same full-correlation as production but through 3 preshifted
    (w+2)-wide planes of the zero-padded dz."""
    dzp_ref[...] = jnp.zeros_like(dzp_ref)
    dzp_ref[2:h + 2, 2:w + 2, :] = dz3.reshape(h, w, c)
    for k in range(3):
        az_ref[k] = dzp_ref[:, 2 - k:4 - k + w, :]
    acc = None
    for dy, dx in _TAPS:
        slab = az_ref[dx, 2 - dy:h + 4 - dy].reshape((h + 2) * (w + 2), c)
        p = jax.lax.dot_general(
            slab, w_ref[dy, dx],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = p if acc is None else acc + p
    dpad_ref[...] = acc.reshape(h + 2, w + 2, c)


def _bwd2_kernel_v2(st_ref, x_ref, y1_ref, out_ref, g_ref, w2_ref,
                    dw2_ref, dh1_ref, pad_ref, pl_ref, dpad_ref, dzp_ref,
                    az_ref, *, h, w, c):
    i = pl.program_id(0)
    hw = float(h * w)
    g = g_ref[0].astype(jnp.float32).reshape(h * w, c)
    y2hat = (out_ref[0].astype(jnp.float32)
             - x_ref[0].astype(jnp.float32)).reshape(h * w, c)
    rstd2 = st_ref[0, 3:4, :]
    dz2 = _in_bwd(g, y2hat, rstd2, hw).astype(x_ref.dtype)

    h1 = jnp.maximum(y1_ref[0].astype(jnp.float32), 0.0).astype(x_ref.dtype)
    _fill_pad(pad_ref, h1, h, w)
    _fill_planes(pl_ref, pad_ref, w)
    _dw9_planes(pl_ref, dz2, dw2_ref, i == 0, h, w, c)

    _conv_adjoint_v2(dz2, w2_ref, dzp_ref, az_ref, dpad_ref, h, w, c)
    dh1 = _pad_adjoint(dpad_ref, h, w)
    dh1_ref[0] = dh1.astype(dh1_ref.dtype)


def _bwd1_kernel_v2(st_ref, x_ref, y1_ref, g_ref, dh1_ref, w1_ref,
                    dw1_ref, dx_ref, pad_ref, pl_ref, dpad_ref, dzp_ref,
                    az_ref, *, h, w, c):
    i = pl.program_id(0)
    hw = float(h * w)
    y1hat = y1_ref[0].astype(jnp.float32).reshape(h * w, c)
    gh = dh1_ref[0].astype(jnp.float32).reshape(h * w, c)
    gh = gh * (y1hat > 0.0)
    rstd1 = st_ref[0, 1:2, :]
    dz1 = _in_bwd(gh, y1hat, rstd1, hw).astype(x_ref.dtype)

    _fill_pad(pad_ref, x_ref[0], h, w)
    _fill_planes(pl_ref, pad_ref, w)
    _dw9_planes(pl_ref, dz1, dw1_ref, i == 0, h, w, c)

    _conv_adjoint_v2(dz1, w1_ref, dzp_ref, az_ref, dpad_ref, h, w, c)
    dx_conv = _pad_adjoint(dpad_ref, h, w)
    dx_ref[0] = (g_ref[0].astype(jnp.float32) + dx_conv).astype(dx_ref.dtype)


def _bwd_pallas_v2(x, y1, st, out, g, w1, w2):
    n, h, w_, c = x.shape
    cdt = x.dtype
    common = dict(
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )
    b_spec = pl.BlockSpec((1, h, w_, c), lambda i: (i, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((3, 3, c, c), lambda i: (0, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    st_spec = pl.BlockSpec((1, 4, c), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    pad = pltpu.VMEM((h + 2, w_ + 2, c), cdt)
    planes = pltpu.VMEM((3, h + 2, w_, c), cdt)
    dpad = pltpu.VMEM((h + 2, w_ + 2, c), jnp.float32)
    dzp = pltpu.VMEM((h + 4, w_ + 4, c), cdt)
    az = pltpu.VMEM((3, h + 4, w_ + 2, c), cdt)

    dw2, dh1 = pl.pallas_call(
        functools.partial(_bwd2_kernel_v2, h=h, w=w_, c=c),
        grid=(n,),
        in_specs=[st_spec, b_spec, b_spec, b_spec, b_spec, w_spec],
        out_specs=[w_spec, b_spec],
        out_shape=[
            jax.ShapeDtypeStruct((3, 3, c, c), jnp.float32),
            jax.ShapeDtypeStruct((n, h, w_, c), cdt),
        ],
        scratch_shapes=[pad, planes, dpad, dzp, az],
        **common,
    )(st, x, y1, out, g, w2)

    dw1, dx = pl.pallas_call(
        functools.partial(_bwd1_kernel_v2, h=h, w=w_, c=c),
        grid=(n,),
        in_specs=[st_spec, b_spec, b_spec, b_spec, b_spec, w_spec],
        out_specs=[w_spec, b_spec],
        out_shape=[
            jax.ShapeDtypeStruct((3, 3, c, c), jnp.float32),
            jax.ShapeDtypeStruct((n, h, w_, c), cdt),
        ],
        scratch_shapes=[pad, planes, dpad, dzp, az],
        **common,
    )(st, x, y1, g, dh1, w1)

    return dx, dw1.astype(w1.dtype), dw2.astype(w2.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_resblock_v2(x, w1, w2, eps=1e-5):
    out, _, _ = _fwd_pallas_v2(x, w1, w2, eps)
    return out


def _fused_fwd_v2(x, w1, w2, eps):
    out, y1, st = _fwd_pallas_v2(x, w1, w2, eps)
    return out, (x, y1, st, out, w1, w2)


def _fused_bwd_v2(eps, res, g):
    x, y1, st, out, w1, w2 = res
    return _bwd_pallas_v2(x, y1, st, out, g, w1, w2)


fused_resblock_v2.defvjp(_fused_fwd_v2, _fused_bwd_v2)


# ---------------------------------------------------------------------------
# harness
# ---------------------------------------------------------------------------


def _timeit(g, args, steps=10, trials=3, label=""):
    float(jax.device_get(g(*args)))
    best = float("inf")
    for _ in range(trials):
        t0 = time.time()
        for _ in range(steps):
            o = g(*args)
        float(jax.device_get(o))
        best = min(best, (time.time() - t0) / steps)
    log(f"{label}: best {best * 1e3:.2f} ms")
    return best


def main():
    n, h, w, c = 48, 64, 64, 256
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, h, w, c)), dtype=dt)
    w1 = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, dtype=dt)
    w2 = jnp.asarray(rng.standard_normal((3, 3, c, c)) * 0.05, dtype=dt)

    # parity on device (scalar readback only)
    @jax.jit
    def par_fwd(x, w1, w2):
        a = fused_resblock(x, w1, w2)
        b = fused_resblock_v2(x, w1, w2)
        return jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))

    @jax.jit
    def par_bwd(x, w1, w2):
        ga = jax.grad(lambda *a: jnp.mean(
            fused_resblock(*a).astype(jnp.float32)), argnums=(0, 1, 2))(x, w1, w2)
        gb = jax.grad(lambda *a: jnp.mean(
            fused_resblock_v2(*a).astype(jnp.float32)), argnums=(0, 1, 2))(x, w1, w2)
        return jnp.stack([
            jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))
            for a, b in zip(ga, gb)]).max()

    log("compiling parity programs...")
    pf = float(jax.device_get(par_fwd(x, w1, w2)))
    pb = float(jax.device_get(par_bwd(x, w1, w2)))
    log(f"parity: fwd max|diff| {pf:.3e}, bwd max|diff| {pb:.3e}")
    assert pf == 0.0, pf  # identical matmul order and dtypes -> bit-exact
    assert pb == 0.0, pb

    fwd_flops = n * 18 * h * w * c * c * 2
    # grad: fwd (recomputed? no — residuals saved) + dW (18 dots K=hw)
    # + adjoint (18 dots M=(h+2)(w+2))
    bwd_flops = (n * 18 * h * w * c * c * 2
                 + n * 18 * (h + 2) * (w + 2) * c * c * 2)

    f_a = jax.jit(lambda *a: jnp.mean(fused_resblock(*a).astype(jnp.float32)))
    f_b = jax.jit(lambda *a: jnp.mean(fused_resblock_v2(*a).astype(jnp.float32)))
    g_a = jax.jit(lambda *a: jnp.stack([
        v.astype(jnp.float32).mean() for v in jax.grad(
            lambda *q: jnp.mean(fused_resblock(*q).astype(jnp.float32)),
            argnums=(0, 1, 2))(*a)]).mean())
    g_b = jax.jit(lambda *a: jnp.stack([
        v.astype(jnp.float32).mean() for v in jax.grad(
            lambda *q: jnp.mean(fused_resblock_v2(*q).astype(jnp.float32)),
            argnums=(0, 1, 2))(*a)]).mean())

    out = {}
    dta = _timeit(f_a, (x, w1, w2), label="fwd production")
    dtb = _timeit(f_b, (x, w1, w2), label="fwd planes-v2")
    out["fwd_ms"] = {"prod": round(dta * 1e3, 2), "v2": round(dtb * 1e3, 2)}
    out["fwd_tflops"] = {"prod": round(fwd_flops / dta / 1e12, 1),
                         "v2": round(fwd_flops / dtb / 1e12, 1)}
    dga = _timeit(g_a, (x, w1, w2), label="fwd+bwd production")
    dgb = _timeit(g_b, (x, w1, w2), label="fwd+bwd planes-v2")
    out["fwd_bwd_ms"] = {"prod": round(dga * 1e3, 2), "v2": round(dgb * 1e3, 2)}
    out["fwd_bwd_tflops"] = {
        "prod": round((fwd_flops + bwd_flops) / dga / 1e12, 1),
        "v2": round((fwd_flops + bwd_flops) / dgb / 1e12, 1)}
    out["parity"] = {"fwd": pf, "bwd": pb}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
