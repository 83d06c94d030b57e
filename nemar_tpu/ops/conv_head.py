"""Pallas kernel for the generator's 7x7 small-Cout head conv, fwd+bwd.

out = conv7x7_reflect(x, W), with Cout = output_nc (3). Under XLA's
direct lowering this runs at ~3% MFU (Cout=3 occupies 3 of the MXU's 128
output lanes) — 21 ms fwd+bwd of the 262 ms step, twice per step; the
pure-XLA scatter rewrite measured even worse (52 ms — probe r3e: a 645 MB
HBM intermediate + 49 lane-misaligned slice-adds).

This kernel flips the layout instead: per sample the image lives as
(C, H, W) with SPATIAL on the lane/sublane axes, so every tap is a matmul

    acc[c8, :] += W8[dy, dx] @ slab[k, :]       M=8 (Cout zero-padded),
                                                 K=Cin, N=H*W lanes

whose N dimension is fully utilized no matter how small Cout is. The 7
in-row shifts are lane-rolls done ONCE per dx and reused across the 7 dy
values (outer-dim slices are free). Everything stays VMEM-resident per
sample.

Backward (custom VJP): dW[tap] = g2 @ slab^T (positions contracted,
M=Cout pad 8, N=Cin — batch-accumulated across the grid); dxp scattered
as 49 ref-slice += into the padded-gradient scratch, then the reflect-pad
adjoint folds the 6 border strips back (same pattern as ops/conv_fused).

Layout transposes (NHWC <-> CHW) and the live bias happen in XLA outside.
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


_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024)


def _build_padded(x_ref, pad_ref, h, w):
    """pad_ref (Ci, H+6, Wp) <- reflect-pad(3) of x_ref (1, Ci, H, W).

    Construction order (interior, columns from x, rows from pad) is what
    the backward's fold reverses.
    """
    pad_ref[:, PAD:PAD + h, PAD:PAD + w] = x_ref[0]
    for dc in range(1, PAD + 1):
        pad_ref[:, PAD:PAD + h, PAD - dc:PAD - dc + 1] = (
            x_ref[0, :, :, dc:dc + 1])
        pad_ref[:, PAD:PAD + h, PAD + w - 1 + dc:PAD + w + dc] = (
            x_ref[0, :, :, w - 1 - dc:w - dc])
    for dr in range(1, PAD + 1):
        pad_ref[:, PAD - dr, :] = pad_ref[:, PAD + dr, :]
        pad_ref[:, PAD + h - 1 + dr, :] = pad_ref[:, PAD + h - 1 - dr, :]


def _fwd_kernel(x_ref, w_ref, out_ref, pad_ref, *, ci, co, h, w):
    # dy runs in a fori_loop: the fully-unrolled 49-stage body OOM'd the
    # Mosaic compile helper (SIGKILL) at these shapes.
    _build_padded(x_ref, pad_ref, h, w)
    wp = w + 2 * PAD
    acc = jnp.zeros((co, h * w), jnp.float32)  # Mosaic pads M to a sublane
    for dx in range(K7):
        # non-negative shift: roll by (Wp - dx) == roll by -dx (mod Wp)
        rolled = (pad_ref[...] if dx == 0
                  else pltpu.roll(pad_ref[...], wp - dx, 2))  # (Ci, H+6, Wp)

        def body(dy, acc, dx=dx, rolled=rolled):
            slab = jax.lax.dynamic_slice(
                rolled, (0, dy, 0), (ci, h, w)).reshape(ci, h * w)
            wtap = jax.lax.dynamic_slice(
                w_ref[...], (dy, dx, 0, 0), (1, 1, co, ci))[0, 0]
            return acc + jax.lax.dot_general(
                wtap, slab,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        acc = jax.lax.fori_loop(0, K7, body, acc)
    out_ref[0] = acc.reshape(co, h, w).astype(out_ref.dtype)


def _fwd_pallas(x_t, w8):
    n, ci, h, w = x_t.shape
    co = w8.shape[-2]  # true cout rows live in the first `co` of 8
    kernel = functools.partial(_fwd_kernel, ci=ci, co=co, h=h, w=w)
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, ci, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K7, K7, co, ci), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, co, h, w), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, co, h, w), x_t.dtype),
        scratch_shapes=[
            pltpu.VMEM((ci, h + 2 * PAD, w + 2 * PAD), x_t.dtype),
        ],
        compiler_params=_PARAMS,
        interpret=_interpret(),
    )(x_t, w8)


def _bwd_kernel(x_ref, g_ref, w_ref, dw_ref, dx_ref, pad_ref, dpad_ref,
                *, ci, co, h, w):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        # zero the batch-accumulated dW once (0*garbage would NaN)
        dw_ref[...] = jnp.zeros_like(dw_ref)

    _build_padded(x_ref, pad_ref, h, w)
    g2 = g_ref[0].reshape(co, h * w).astype(jnp.float32)

    dpad_ref[...] = jnp.zeros_like(dpad_ref)
    wp = w + 2 * PAD
    for dx in range(K7):
        rolled = (pad_ref[...] if dx == 0
                  else pltpu.roll(pad_ref[...], wp - dx, 2))

        def body(dy, _, dx=dx, rolled=rolled):
            slab = jax.lax.dynamic_slice(
                rolled, (0, dy, 0), (ci, h, w)).reshape(ci, h * w)
            wtap = jax.lax.dynamic_slice(
                w_ref[...], (dy, dx, 0, 0), (1, 1, co, ci))[0, 0]
            # dW[dy,dx] (Co, Ci) += g2 @ slab^T (contract positions)
            d = jax.lax.dot_general(
                g2, slab,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dw_ref[pl.ds(dy, 1), pl.ds(dx, 1), :, :] += d[None, None]
            # dxp[k, dy:dy+h, dx:dx+w] += W[dy,dx]^T @ g2
            dxp = jax.lax.dot_general(
                wtap, g2,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(ci, h, w)
            dpad_ref[:, pl.ds(dy, h), pl.ds(dx, w)] += dxp
            return 0

        jax.lax.fori_loop(0, K7, body, 0)

    # reflect-pad adjoint (reverse of _build_padded)
    for dr in range(1, PAD + 1):
        dpad_ref[:, PAD + dr, :] += dpad_ref[:, PAD - dr, :]
        dpad_ref[:, PAD + h - 1 - dr, :] += dpad_ref[:, PAD + h - 1 + dr, :]
    for dc in range(1, PAD + 1):
        dpad_ref[:, PAD:PAD + h, PAD + dc:PAD + dc + 1] += (
            dpad_ref[:, PAD:PAD + h, PAD - dc:PAD - dc + 1])
        dpad_ref[:, PAD:PAD + h, PAD + w - 1 - dc:PAD + w - dc] += (
            dpad_ref[:, PAD:PAD + h, PAD + w - 1 + dc:PAD + w + dc])
    dx_ref[0] = dpad_ref[:, PAD:PAD + h, PAD:PAD + w].astype(dx_ref.dtype)


def _bwd_pallas(x_t, g_t, w8):
    n, ci, h, w = x_t.shape
    co = w8.shape[-2]
    kernel = functools.partial(_bwd_kernel, ci=ci, co=co, h=h, w=w)
    dw, dx = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, ci, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K7, K7, co, ci), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((K7, K7, co, ci), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ci, h, w), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((K7, K7, co, ci), jnp.float32),
            jax.ShapeDtypeStruct((n, ci, h, w), x_t.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((ci, h + 2 * PAD, w + 2 * PAD), x_t.dtype),
            pltpu.VMEM((ci, h + 2 * PAD, w + 2 * PAD), jnp.float32),
        ],
        compiler_params=_PARAMS,
        interpret=_interpret(),
    )(x_t, g_t, w8)
    return dw, dx


@jax.custom_vjp
def _head_core(x_t, w8):
    return _fwd_pallas(x_t, w8)


def _head_fwd(x_t, w8):
    return _fwd_pallas(x_t, w8), (x_t, w8)


def _head_bwd(res, g_t):
    x_t, w8 = res
    dw, dx = _bwd_pallas(x_t, g_t, w8)
    return dx, dw.astype(w8.dtype)


_head_core.defvjp(_head_fwd, _head_bwd)


def conv_head(x: jax.Array, wk: jax.Array) -> jax.Array:
    """NHWC 7x7 reflect-pad conv with small Cout via the CHW Pallas kernel.

    x (N, H, W, Ci); wk (7, 7, Ci, Co) — flax nn.Conv kernel layout. No
    bias (apply outside). Falls back to the direct XLA conv when the shape
    is unsupported.
    """
    co = wk.shape[-1]
    if not head_kernel_supported(x.shape, co):
        xp = jnp.pad(x, ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)),
                     mode="reflect")
        return jax.lax.conv_general_dilated(
            xp, wk, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32).astype(x.dtype)
    x_t = jnp.transpose(x, (0, 3, 1, 2))
    w8 = jnp.transpose(wk, (0, 1, 3, 2))  # (7,7,Co,Ci)
    out_t = _head_core(x_t, w8)
    return jnp.transpose(out_t, (0, 2, 3, 1))
