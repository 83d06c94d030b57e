"""Roll-based Pallas kernel for the generator's 7x7 small-Cout head conv.

The round-4 M-ladder probe (perf_probe_r4a) settled WHY every previous
head rewrite lost: a dot's wall time is FLAT in M from 3 to 256 at fixed
(K, N) — the MXU is bound by the volume of STREAMED operand data, not by
output-lane occupancy. So the head's cost ladder is exactly the streamed
volume per image (Ci=64, 256², values streamed through the MXU):

    direct conv        ~49·Ci·HW = 205M   measured 12.3 ms fwd (b32)
    (7x1)∘(1x7) fact    ~2·7·Ci·HW = 60M   measured  5.1 ms fwd  <- prod
    THIS kernel          7·Ci·L   = 29M    one X stream per dx

Design (v4 — supersedes ops/attic/conv_head.py, whose lane-misaligned
sub-slices each paid a full relayout copy):

  * XLA wrapper: rows reflect-padded, channel-major, flattened to
    (Ci, L0=(H+6)·W); per-sample grid.
  * dx shifts are pltpu.roll on the lane axis — a vector permute, NOT a
    relayout copy (the v3 killer).
  * ONE dot per dx: Y' = Wdx(21, Ci) @ flat(Ci, L0) with the 7 dy-taps
    folded into M=21 rows (free by the ladder); the dy-collapse is 49
    ALIGNED value slices (dy·W ≡ 0 mod 128) added on the VPU.
  * Mosaic constraint (probe r4e, round 4): tpu.dynamic_rotate is only
    implemented for 32-bit data — rolling the bf16 input is NOT
    lowerable. All rolls therefore ride the f32 PRODUCTS instead, which
    is algebraically identical and strictly cheaper (the rolled tensor
    is (21, L0) f32, 3x smaller than (Ci, L0)):
        Wdx @ roll(flat, -s)  ==  roll(Wdx @ flat, -s)
        Gsh @ roll(flat,-s)^T ==  roll(Gsh, +s) @ flat^T
  * Borders: column taps wrap through row ends and the array ends; the
    wrapper recomputes the 3 columns each side with the direct XLA conv
    (exactly conv_head v3's strip scheme — gradients route through the
    concat/slice VJPs exactly).

Backward (custom VJP, same streaming discipline):
    Gsh(21, L0): 7 aligned row-shifted copies of g (scratch ref stores)
    dW_dx(21,Ci) = roll(Gsh, +(dx-3)) @ flat^T   one big-K dot per dx
    dX          = Σ_dx roll(Wdx^T @ Gsh, +(dx-3))

Parity: tests/test_conv_head_roll.py (interpret mode, fwd+grads vs the
direct lowering).

MEASURED VERDICT (probe r4e, one TPU window, production shapes, bf16):
    b32: roll fwd 5.31 / fwd+bwd 11.50 ms  vs  fact 5.14 / 11.75
    b48: roll fwd 6.97 / fwd+bwd 15.95 ms  vs  fact 5.62 / 15.93
A TIE — the streamed-volume ladder predicted ~2x but the head turns out
utilization-bound, not stream-bound, once relayouts are gone: the
per-dx dot is M=21/K=64 (1/6 of MXU rows, half its lanes) and the f32
product rolls + 49 VPU collapse adds replace fact's second conv pass at
the same cost. `--c7_impl auto` therefore KEEPS the fact head; 'roll'
ships as a tested, selectable option (this file stays out of ops/attic
because it is the only head form whose X-stream is minimal — a future
Mosaic with bf16 dynamic_rotate or multi-row dot packing would change
the verdict).
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


def head_roll_supported(shape, cout) -> bool:
    n, h, w, c = shape
    return (w % 128 == 0 and cout <= 8 and c <= 256 and h >= 8
            and w > 2 * PAD)


_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _fwd_kernel(x_ref, w_ref, out_ref, *, ci, co, h, w):
    hw = h * w
    l0 = (h + 2 * PAD) * w
    flat = x_ref[0]  # (ci, L0)
    acc = jnp.zeros((co, hw), jnp.float32)
    for dx in range(K7):
        s = dx - PAD
        wdx = w_ref[dx]  # (21, ci), rows (dy, co) dy-major
        # Wdx @ roll(flat, -s) == roll(Wdx @ flat, -s); roll the f32
        # product — bf16 rotate is not lowerable (r4e).
        y = jax.lax.dot_general(
            wdx, flat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        if s:
            y = pltpu.roll(y, (-s) % l0, 1)
        for dy in range(K7):
            acc = acc + y[dy * co:(dy + 1) * co, dy * w:dy * w + hw]
    out_ref[0] = acc.astype(out_ref.dtype)


def _bwd_kernel(x_ref, g_ref, w_ref, dw_ref, dx_ref, gsh_ref, dacc_ref,
                *, ci, co, h, w):
    i = pl.program_id(0)
    hw = h * w
    l0 = (h + 2 * PAD) * w

    @pl.when(i == 0)
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    # gsh holds bf16-exact copies of g — the f32 scratch is only for the
    # aligned row-shifted stores; casting back to bf16 for the dots is
    # EXACT, and bf16·bf16 products are exact in the f32 MXU accumulator,
    # so nothing here loses precision vs an all-f32 formulation.
    g2 = g_ref[0].astype(jnp.float32)  # (co, hw)
    gsh_ref[...] = jnp.zeros_like(gsh_ref)
    for dy in range(K7):
        gsh_ref[dy * co:(dy + 1) * co, dy * w:dy * w + hw] = g2

    flat = x_ref[0]  # (ci, L0) bf16
    # dX accumulates in a VMEM scratch ref: carrying the (ci, L0) f32
    # running sum as an SSA value across the unrolled dx loop made the
    # register allocator spill ~117M (r4e OOM at 156M/128M vmem).
    dacc_ref[...] = jnp.zeros_like(dacc_ref)
    for dx in range(K7):
        s = dx - PAD
        # dW_dx = Gsh @ roll(flat,-s)^T == roll(Gsh,+s) @ flat^T — roll
        # the f32 gsh; bf16 rotate is not lowerable (r4e).
        gsh_s = (pltpu.roll(gsh_ref[...], s % l0, 1) if s
                 else gsh_ref[...])
        gsh_b = gsh_s.astype(flat.dtype)
        dw_ref[dx] += jax.lax.dot_general(
            gsh_b, flat, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        # dX contribution: roll(Wdx^T @ Gsh, +s) — but the roll commutes
        # through the un-contracted lane axis, so Wdx^T @ gsh_s IS the
        # rolled product already (no 17M f32 roll needed).
        dacc_ref[...] += jax.lax.dot_general(
            w_ref[dx], gsh_b, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (ci, L0)
    dx_ref[0] = dacc_ref[...].astype(dx_ref.dtype)


def _make_core(h, w):
    @jax.custom_vjp
    def core(xf, w3):
        n, ci, l0 = xf.shape
        co = w3.shape[1] // K7
        return pl.pallas_call(
            functools.partial(_fwd_kernel, ci=ci, co=co, h=h, w=w),
            grid=(n,),
            in_specs=[
                pl.BlockSpec((1, ci, l0), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K7, K7 * co, ci), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, co, h * w), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, co, h * w), xf.dtype),
            compiler_params=_PARAMS,
            interpret=_interpret(),
        )(xf, w3)

    def fwd(xf, w3):
        return core(xf, w3), (xf, w3)

    def bwd(res, g):
        xf, w3 = res
        n, ci, l0 = xf.shape
        co = w3.shape[1] // K7
        dw, dx = pl.pallas_call(
            functools.partial(_bwd_kernel, ci=ci, co=co, h=h, w=w),
            grid=(n,),
            in_specs=[
                pl.BlockSpec((1, ci, l0), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, co, h * w), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K7, K7 * co, ci), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((K7, K7 * co, ci), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ci, l0), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((K7, K7 * co, ci), jnp.float32),
                jax.ShapeDtypeStruct((n, ci, l0), xf.dtype),
            ],
            scratch_shapes=[
                pltpu.VMEM((K7 * co, (h + 2 * PAD) * w), jnp.float32),
                pltpu.VMEM((ci, (h + 2 * PAD) * w), jnp.float32),
            ],
            compiler_params=_PARAMS,
            interpret=_interpret(),
        )(xf, g, w3)
        return dx, dw.astype(w3.dtype)

    core.defvjp(fwd, bwd)
    return core


_CORE_CACHE: dict = {}


def _core_for(h, w):
    if (h, w) not in _CORE_CACHE:
        _CORE_CACHE[(h, w)] = _make_core(h, w)
    return _CORE_CACHE[(h, w)]


def _direct(x, wk):
    xp = jnp.pad(x, ((0, 0), (PAD, PAD), (PAD, PAD), (0, 0)),
                 mode="reflect")
    return jax.lax.conv_general_dilated(
        xp, wk, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_head_roll(x: jax.Array, wk: jax.Array) -> jax.Array:
    """NHWC 7x7 reflect-pad conv, small Cout, via the roll kernel.

    x (N, H, W, Ci); wk (7, 7, Ci, Co) — flax nn.Conv layout, no bias.
    Falls back to the direct XLA conv on unsupported shapes.
    """
    n, h, w, ci = x.shape
    co = wk.shape[-1]
    if not head_roll_supported(x.shape, co):
        return _direct(x, wk)

    xr = jnp.pad(x, ((0, 0), (PAD, PAD), (0, 0), (0, 0)), mode="reflect")
    xf = jnp.transpose(xr, (0, 3, 1, 2)).reshape(n, ci, (h + 2 * PAD) * w)
    # (dx, dy, co, ci) with (dy, co) merged dy-major
    w3 = jnp.transpose(wk, (1, 0, 3, 2)).reshape(K7, K7 * co, ci)

    out_flat = _core_for(h, w)(xf, w3)  # (N, Co, H*W)
    out_k = jnp.transpose(out_flat.reshape(n, co, h, w), (0, 2, 3, 1))

    # exact border columns (roll wrap) via direct conv on strips
    strip = 2 * PAD + 1
    bl = _direct(x[:, :, :strip + PAD, :], wk)[:, :, :PAD, :]
    br = _direct(x[:, :, -(strip + PAD):, :], wk)[:, :, -PAD:, :]
    return jnp.concatenate([bl, out_k[:, :, PAD:w - PAD, :], br], axis=2)
