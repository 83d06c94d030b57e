"""Pallas kernel for the generator's 7x7 small-Cout head conv, fwd+bwd.

out = conv7x7_reflect(x, W), Cout = output_nc (3). Under XLA's direct
lowering this runs at ~3% MFU (Cout=3 occupies 3 of the MXU's 128 output
lanes) — 21 ms fwd+bwd of the 262 ms step, twice per step; the pure-XLA
scatter rewrite measured worse still (52 ms, probe r3e).

STATUS (probe r3e7): this kernel measures 43 ms fwd+bwd at the production
shape — 2x SLOWER than the direct lowering. The MXU math is right, but
the 49 sub-slices of the wide windows are lane-misaligned and each pays a
full-window relayout copy (~25 GB of VMEM traffic per step at b32). It
ships under --block_impl pallas_all as a tested, documented attempt; the
production 'pallas' config keeps the direct conv. A winning version needs
either misaligned-operand matmul reads or an 8-lane-padded image layout
(w -> w+pad per row) so every tap offset is lane-aligned — future work.

Design (third iteration — the first two hit Mosaic limits: value reshapes
across lanes are unsupported, and a 49-stage unrolled body OOM'd the
compile helper):

  * The image is ROW-reflect-padded, transposed to channel-major and
    FLATTENED to (Ci, (H+6)*W + 6) in XLA, positions on the LANE axis
    (3 zero lanes each side absorb the column-tap offsets).
  * In the kernel, tap (dy, dx) is the constant lane offset dy*W + dx:
    one fori_loop over the 49 taps does
        acc += W49[t] @ in_ref[:, pl.ds(off(t), H*W)]
    an (Co, Ci) x (Ci, H*W) matmul whose N dimension is fully utilized
    regardless of Cout. No reshapes, no rolls, tiny program.
  * Column taps that cross a row boundary wrap into the neighboring row,
    so the <= 3 border columns are WRONG in the kernel output — the
    caller recomputes those 6 columns exactly with a direct XLA conv on
    the border strips and concatenates. Gradients split the same way
    (the concat/slice VJPs route border cotangents to the XLA branch and
    interior cotangents to the kernel's VJP — exact either way).

Backward (custom VJP): dW[t] += g2 @ slab^T (positions contracted, batch-
accumulated across the grid); dflat[:, off:off+H*W] += W49[t]^T @ g2; the
flatten/transpose/row-pad adjoints fold in XLA automatically because the
wrapper is plain jnp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K7 = 7
PAD = 3


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def head_kernel_supported(shape, cout) -> bool:
    n, h, w, c = shape
    return (h % 8 == 0 and w % 128 == 0 and cout <= 8 and c <= 128
            and h > 2 * PAD and w > 2 * PAD)


_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _fwd_kernel(x_ref, w_ref, out_ref, *, ci, co, h, w):
    # Dynamic lane offsets must be 128-aligned (Mosaic): the wide window
    # starts at dy*w (w % 128 == 0, hinted), the 0..6 dx offsets are
    # STATIC value sub-slices of it.
    hw = h * w

    def body(dy, acc):
        base = pl.multiple_of(dy * w, 128)
        wide = x_ref[0, :, pl.ds(base, hw + 128)]
        for dx in range(K7):
            wtap = w_ref[pl.ds(dy * K7 + dx, 1)][0]
            acc = acc + jax.lax.dot_general(
                wtap, wide[:, dx:dx + hw],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return acc

    acc = jax.lax.fori_loop(0, K7, body, jnp.zeros((co, hw), jnp.float32))
    out_ref[0] = acc.astype(out_ref.dtype)


def _bwd_kernel(x_ref, g_ref, w_ref, dw_ref, dx_ref, dwide_ref,
                *, ci, co, h, w):
    i = pl.program_id(0)
    hw = h * w

    @pl.when(i == 0)
    def _():
        # zero the batch-accumulated dW once (0*garbage would NaN)
        dw_ref[...] = jnp.zeros_like(dw_ref)

    dx_ref[0] = jnp.zeros_like(dx_ref[0])
    g2 = g_ref[0].astype(jnp.float32)

    def body(dy, _):
        base = pl.multiple_of(dy * w, 128)
        wide = x_ref[0, :, pl.ds(base, hw + 128)]  # compute dtype
        # accumulate the window gradient in a SCRATCH ref: carrying the
        # 17 MB f32 window as a loop value spilled 105 MB of registers
        dwide_ref[...] = jnp.zeros_like(dwide_ref)
        for dx in range(K7):
            t = dy * K7 + dx
            wtap = w_ref[pl.ds(t, 1)][0]
            dw_ref[pl.ds(t, 1)] += jax.lax.dot_general(
                g2, wide[:, dx:dx + hw].astype(jnp.float32),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )[None]
            dxp = jax.lax.dot_general(
                wtap, g2,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dwide_ref[:, dx:dx + hw] += dxp
        dx_ref[0, :, pl.ds(base, hw + 128)] += (
            dwide_ref[...].astype(dx_ref.dtype))
        return 0

    jax.lax.fori_loop(0, K7, body, 0)


def _make_core(h, w):
    @jax.custom_vjp
    def core(xf, w49):
        n, ci, L = xf.shape
        co = w49.shape[1]
        return pl.pallas_call(
            functools.partial(_fwd_kernel, ci=ci, co=co, h=h, w=w),
            grid=(n,),
            in_specs=[
                pl.BlockSpec((1, ci, L), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K7 * K7, co, ci), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, co, h * w), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, co, h * w), xf.dtype),
            compiler_params=_PARAMS,
            interpret=_interpret(),
        )(xf, w49)

    def fwd(xf, w49):
        return core(xf, w49), (xf, w49)

    def bwd(res, g):
        xf, w49 = res
        n, ci, L = xf.shape
        co = w49.shape[1]
        dw, dx = pl.pallas_call(
            functools.partial(_bwd_kernel, ci=ci, co=co, h=h, w=w),
            grid=(n,),
            in_specs=[
                pl.BlockSpec((1, ci, L), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, co, h * w), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K7 * K7, co, ci), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((K7 * K7, co, ci), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ci, L), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((K7 * K7, co, ci), jnp.float32),
                jax.ShapeDtypeStruct((n, ci, L), xf.dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((ci, h * w + 128), jnp.float32),
            ],
            compiler_params=_PARAMS,
            interpret=_interpret(),
        )(xf, g, w49)
        return dx, dw.astype(w49.dtype)

    core.defvjp(fwd, bwd)
    return core


_CORE_CACHE: dict = {}


def _core_for(h, w):
    if (h, w) not in _CORE_CACHE:
        _CORE_CACHE[(h, w)] = _make_core(h, w)
    return _CORE_CACHE[(h, w)]


def _direct(x, wk):
    # same-dtype conv: a float32 preferred_element_type would make the
    # transposed (backward) conv mix a f32 cotangent with bf16 weights,
    # which lax rejects; XLA accumulates bf16 convs in f32 regardless.
    xp = jnp.pad(x, ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)),
                 mode="reflect")
    return jax.lax.conv_general_dilated(
        xp, wk, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_head(x: jax.Array, wk: jax.Array) -> jax.Array:
    """NHWC 7x7 reflect-pad conv with small Cout via the flat-lane kernel.

    x (N, H, W, Ci); wk (7, 7, Ci, Co) — flax nn.Conv layout, no bias.
    Falls back to the direct XLA conv on unsupported shapes.
    """
    co = wk.shape[-1]
    n, h, w, ci = x.shape
    if not head_kernel_supported(x.shape, co):
        return _direct(x, wk)

    # rows reflect-padded, channel-major, flattened; PAD zero lanes each
    # side absorb the column-tap offsets
    xr = jnp.pad(x, ((0, 0), (PAD, PAD), (0, 0), (0, 0)), mode="reflect")
    xf = jnp.transpose(xr, (0, 3, 1, 2)).reshape(n, ci, (h + 2 * PAD) * w)
    # left pad PAD (offset algebra), right pad so the widest aligned
    # window (base=6w, length hw+128) stays in bounds
    xf = jnp.pad(xf, ((0, 0), (0, 0), (PAD, 128)))
    w49 = jnp.transpose(wk, (0, 1, 3, 2)).reshape(K7 * K7, co, ci)

    out_flat = _core_for(h, w)(xf, w49)             # (N, Co, H*W)
    out_k = jnp.transpose(out_flat.reshape(n, co, h, w), (0, 2, 3, 1))

    # exact border columns (PAD-wide strips, wrap-contaminated in the
    # kernel) via the direct conv on reflect-padded strips
    strip = 2 * PAD + 1
    bl = _direct(x[:, :, :strip + PAD, :], wk)[:, :, :PAD, :]
    br = _direct(x[:, :, -(strip + PAD):, :], wk)[:, :, -PAD:, :]
    return jnp.concatenate([bl, out_k[:, :, PAD:w - PAD, :], br], axis=2)
