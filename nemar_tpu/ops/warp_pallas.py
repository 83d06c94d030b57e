"""Pallas TPU grid-sample kernel — the north-star warp (BASELINE.json).

Why a kernel at all: XLA lowers gather on TPU to a serial per-element loop
(measured 150+ ms for ONE 64² warp on v5e), and the pure-XLA one-hot matmul
fallback (ops/warp.py impl='mm') contracts against the FULL image height and
streams its one-hot operands through HBM. This kernel keeps everything in
VMEM and contracts only against a bounded row SLAB around each output tile.

Layout (Mosaic-shaped): output pixels of a row-tile live on the LANE axis
(P = tile_rows·W lanes); the bilinear tap one-hots are built directly in
transposed form, so the kernel needs no in-kernel reshapes/transposes
(Mosaic supports neither across lanes).

X-FIRST formulation (round 2; out = Σ_s Σ_w Ay[s]·slab[s,w]·Bx[w] is
bilinear and separable, so contract the WIDE axis on the MXU and keep only
S-sized work on the VPU — the round-1 y-first order left a C·W×P VPU
reduction that dominated):

  per (sample n, row-tile t) grid step:
    slab    = img[rowstart(n,t) : rowstart+S, :]       (VMEM ref slice,
                                                        rowstart 8-aligned)
    BxT     = x-tap one-hots  (W × P)  built from iota==floor(x) compares
    xslab_c = slab_c ·contract_W· BxT  -> (S × P)      (MXU, per channel)
    AyT     = y-tap one-hots  (S × P)
    out_c   = Σ_s AyT ⊙ xslab_c        (VPU sublane reduction over S ≪ W)

  custom VJP (same tiling; three MXU contractions, all VPU work S-sized
  except the unavoidable (W,P) tap builds):
    dslab_c = (g_c ⊙ AyT) ·contract_P· BxT             — scatter-add as a
                                                          matmul, accumulated
                                                          into the dimg plane
    d_x     = Σ_c g_c ⊙ Σ_s (AyT  ⊙ (slab_c·dBxT))
    d_y     = Σ_c g_c ⊙ Σ_s (AydT ⊙ xslab_c)

Exactness precondition: each output row-tile's source rows must fit in the
S-row slab (S ≈ tile_rows + 2·max_disp_px, clamped to H). The wrapper
computes per-tile row spans OUTSIDE the kernel and lax.cond-falls back to
the exact mm path when any tile violates the bound — results are ALWAYS
exact; the kernel is the fast path for bounded displacements (registration
fields are smoothness-regularized; --stn_bounded_flow makes the bound a
hard guarantee).

Coordinate unnormalization + padding-mode transforms happen outside in
differentiable jnp (ops/warp.py semantics, torch-parity tested); the
custom_vjp wraps only core(img, x_pix, y_pix), so padding/align_corners
chain rules come from JAX autodiff of the outer transform.

Constraints for the kernel path: bilinear only, W % 128 == 0, H % 8 == 0.
Anything else routes to impl='mm'.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

KERNEL_READY = True

_INTERPRET = None


def _interpret() -> bool:
    global _INTERPRET
    if _INTERPRET is None:
        _INTERPRET = jax.default_backend() != "tpu"
    return _INTERPRET


_CONTRACT_S = (((0,), (0,)), ((), ()))  # contract dim0 with dim0
_CONTRACT_P = (((1,), (1,)), ((), ()))  # contract dim1 with dim1
_CONTRACT_W = (((1,), (0,)), ((), ()))  # contract dim1 with dim0 (plain @)
# fp32 taps/slabs must not round through 1-pass bf16 on the MXU (costs the
# 1e-3 parity bar); HIGHEST = multi-pass exact fp32.
_PREC = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# in-kernel helpers (coords are (1, P) rows; one-hots built transposed)
# ---------------------------------------------------------------------------


def _taps_t(coord_row, extent):
    """Transposed bilinear one-hots: (extent, P) weights and d/dcoord."""
    p = coord_row.shape[1]
    c0 = jnp.floor(coord_row)                       # (1, P)
    w1 = coord_row - c0
    c0i = jnp.clip(c0, -2.0, float(extent) + 1.0).astype(jnp.int32)
    iota = jax.lax.broadcasted_iota(jnp.int32, (extent, p), 0)
    m0 = (iota == c0i).astype(coord_row.dtype)      # broadcast (1,P)->(E,P)
    m1 = (iota == c0i + 1).astype(coord_row.dtype)
    taps = m0 * (1.0 - w1) + m1 * w1
    dtaps = m1 - m0
    return taps, dtaps


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(rowstart_ref, x_ref, y_ref, img_ref, out_ref, *, c, s, w, mxu_bf16):
    t = pl.program_id(1)
    rs = rowstart_ref[pl.program_id(0), t]
    xrow = x_ref[0, 0]                 # (1, P) pixel x coords
    yrow = y_ref[0, 0]                 # (1, P) pixel y coords

    ylocal = yrow - rs.astype(yrow.dtype)
    ayt, _ = _taps_t(ylocal, s)        # (S, P)
    bxt, _ = _taps_t(xrow, w)          # (W, P)
    mm = jnp.bfloat16 if mxu_bf16 else jnp.float32
    prec = None if mxu_bf16 else _PREC
    bxt_m = bxt.astype(mm)
    rs_al = pl.multiple_of(rs, 8)
    # channel slabs stacked along sublanes: the matmul's M dim becomes C·S
    # (e.g. 3·48=144) instead of S — fills the MXU's 128 systolic rows
    slab_all = jnp.concatenate(
        [img_ref[0, ci, pl.ds(rs_al, s), :] for ci in range(c)], axis=0
    ).astype(mm)                        # (C·S, W)
    xslab_all = jax.lax.dot_general(
        slab_all, bxt_m, dimension_numbers=_CONTRACT_W,
        preferred_element_type=jnp.float32, precision=prec,
    )                                   # (C·S, P)
    for ci in range(c):
        xslab = xslab_all[ci * s : (ci + 1) * s, :]
        out_ref[0, 0, ci] = jnp.sum(ayt * xslab, axis=0, keepdims=True)


def _fwd_pallas(img_p, x_row, y_row, rowstart, *, s, mxu_bf16=False):
    n, c, h, w = img_p.shape
    nt, p = x_row.shape[1], x_row.shape[3]
    kernel = functools.partial(_fwd_kernel, c=c, s=s, w=w, mxu_bf16=mxu_bf16)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n, nt),
        in_specs=[
            pl.BlockSpec((1, 1, 1, p), lambda nn, t, rss: (nn, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, p), lambda nn, t, rss: (nn, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, h, w), lambda nn, t, rss: (nn, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, c, 1, p),
                               lambda nn, t, rss: (nn, t, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, nt, c, 1, p), jnp.float32),
        interpret=_interpret(),
    )(rowstart, x_row, y_row, img_p)


# ---------------------------------------------------------------------------
# shift-gather forward kernel (probe r4c, adopted per VERDICT r3 item 9:
# 2.38x over the one-hot x-stage at |disp| <= 8 px, 26.8 vs 11.3 GB/s).
#
# When the x-displacement is bounded (|floor(x) - col| <= B), the (W x P)
# one-hot build + MXU contraction of the x-stage is replaced by 2B+2 lane
# ROLLS of the row-repeated slab with per-lane select masks (pltpu.roll is
# a vector permute — no MXU, no W x P operand):
#
#   xs[s, p] = Σ_k coeff_k[p] · roll(repeat(slab[s]), -k)[p]
#   coeff_k  = inframe(x+k) · ((1-ax)·[dxi==k] + ax·[dxi==k-1])
#
# The roll wraps modulo W (P is a multiple of W), so a tap that crosses the
# frame reads the wrong column — the inframe mask zeroes exactly those
# lanes, which is ALSO the 'zeros' padding semantics ('border'/'reflection'
# coords arrive pre-clamped in-frame, where the mask is a no-op). The
# y-stage is identical to the one-hot kernel. Mosaic constraints: rolls are
# 32-bit-only (slab rides f32 — the wrapper feeds f32 planes) and W must be
# a power of two (lane index = iota & (W-1)).
# ---------------------------------------------------------------------------


def _fwd_shift_kernel(rowstart_ref, x_ref, y_ref, img_ref, out_ref,
                      *, c, s, w, b):
    t = pl.program_id(1)
    rs = rowstart_ref[pl.program_id(0), t]
    xrow = x_ref[0, 0]                 # (1, P) pixel x coords
    yrow = y_ref[0, 0]

    ylocal = yrow - rs.astype(yrow.dtype)
    ayt, _ = _taps_t(ylocal, s)        # (S, P)
    p = xrow.shape[1]
    ix = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1) & (w - 1)
    fx = jnp.floor(xrow)
    ax = xrow - fx
    dxi = fx.astype(jnp.int32) - ix    # in [-B, B] when the cond engaged
    coeffs = []
    for k in range(-b, b + 2):
        src = ix + k
        inframe = (src >= 0) & (src < w)
        coeffs.append(jnp.where(inframe & (dxi == k), 1.0 - ax, 0.0)
                      + jnp.where(inframe & (dxi == k - 1), ax, 0.0))
    rs_al = pl.multiple_of(rs, 8)
    for ci in range(c):
        slab = img_ref[0, ci, pl.ds(rs_al, s), :]        # (S, W) f32
        xrep = pltpu.repeat(slab, p // w, axis=1)        # (S, P)
        xs = jnp.zeros((s, p), jnp.float32)
        for j, k in enumerate(range(-b, b + 2)):
            xs = xs + coeffs[j] * pltpu.roll(xrep, -k % p, 1)
        out_ref[0, 0, ci] = jnp.sum(ayt * xs, axis=0, keepdims=True)


def _fwd_shift_pallas(img_p, x_row, y_row, rowstart, *, s, b):
    n, c, h, w = img_p.shape
    nt, p = x_row.shape[1], x_row.shape[3]
    kernel = functools.partial(_fwd_shift_kernel, c=c, s=s, w=w, b=b)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n, nt),
        in_specs=[
            pl.BlockSpec((1, 1, 1, p), lambda nn, t, rss: (nn, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, p), lambda nn, t, rss: (nn, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, h, w), lambda nn, t, rss: (nn, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, c, 1, p),
                               lambda nn, t, rss: (nn, t, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, nt, c, 1, p), jnp.float32),
        interpret=_interpret(),
    )(rowstart, x_row, y_row, img_p)


# ---------------------------------------------------------------------------
# shift-gather backward kernel (round 5, VERDICT r4 item 3: config #1's
# fwd+bwd was 7.29 GB/s vs 12.29 fwd because the VJP still built the
# (W x P) one-hots and ran all three W-sized MXU contractions).
#
# At bounded x-displacement the whole VJP rides the same 2B+2 lane rolls
# as the r4c forward:
#   xs  = Σ_k coeff_k  · roll(xrep, -k)      (primal recompute -> dy)
#   xds = Σ_k dcoeff_k · roll(xrep, -k)      (d/dx taps; dcoeff = m1 - m0)
#   dy  = Σ_c g_c ⊙ Σ_s (AydT ⊙ xs_c);  dx = Σ_c g_c ⊙ Σ_s (AyT ⊙ xds_c)
# and the image scatter is the roll ADJOINT: output lane p of roll(·,-k)
# reads input lane p+k, so
#   dxrep_c = Σ_k roll(coeff_k ⊙ (g_c ⊙ AyT), +k)
#   dslab_c[s, w] = Σ_j dxrep_c[s, w + j·W]   (adjoint of pltpu.repeat —
#                   th-1 more rolls by multiples of W, then the first W
#                   lanes, which is an aligned lane slice since W % 128 == 0)
# No (W x P) operand is ever built and the MXU is not used at all: every
# term is S x P elementwise work on the VPU, S = th + 2B + 8 ≪ W.
# The inframe mask in coeff/dcoeff reproduces the 'zeros'-padding gradient
# semantics exactly (out-of-frame taps contribute no dimg and no dx).
# ---------------------------------------------------------------------------


def _bwd_shift_kernel(rowstart_ref, x_ref, y_ref, img_ref, g_ref,
                      dimg_ref, dx_ref, dy_ref, *, c, s, w, b, gc):
    t = pl.program_id(1)
    rs = rowstart_ref[pl.program_id(0), t]
    xrow = x_ref[0, 0]                 # (1, P)
    yrow = y_ref[0, 0]

    @pl.when(t == 0)
    def _init():
        dimg_ref[...] = jnp.zeros_like(dimg_ref)

    ylocal = yrow - rs.astype(yrow.dtype)
    ayt, aydt = _taps_t(ylocal, s)     # (S, P)
    p = xrow.shape[1]
    ix = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1) & (w - 1)
    fx = jnp.floor(xrow)
    ax = xrow - fx
    dxi = fx.astype(jnp.int32) - ix    # in [-B, B] when the cond engaged
    coeffs, dcoeffs = [], []
    for k in range(-b, b + 2):
        src = ix + k
        inframe = (src >= 0) & (src < w)
        m0 = jnp.where(inframe & (dxi == k), 1.0, 0.0)
        m1 = jnp.where(inframe & (dxi == k - 1), 1.0, 0.0)
        coeffs.append(m0 * (1.0 - ax) + m1 * ax)
        dcoeffs.append(m1 - m0)
    rs_al = pl.multiple_of(rs, 8)

    gs = [g_ref[0, 0, ci] for ci in range(c)]
    dx = jnp.zeros_like(xrow)
    dy = jnp.zeros_like(yrow)
    for ci in range(c):
        slab = img_ref[0, ci, pl.ds(rs_al, s), :]        # (S, W) f32
        xrep = pltpu.repeat(slab, p // w, axis=1)        # (S, P)
        xs = jnp.zeros((s, p), jnp.float32)
        xds = jnp.zeros((s, p), jnp.float32)
        for j, k in enumerate(range(-b, b + 2)):
            rolled = pltpu.roll(xrep, -k % p, 1)
            xs = xs + coeffs[j] * rolled
            xds = xds + dcoeffs[j] * rolled
        dy = dy + gs[ci] * jnp.sum(aydt * xs, axis=0, keepdims=True)
        dx = dx + gs[ci] * jnp.sum(ayt * xds, axis=0, keepdims=True)
        if ci < gc:
            gayt = gs[ci] * ayt                          # (S, P)
            acc = jnp.zeros((s, p), jnp.float32)
            for j, k in enumerate(range(-b, b + 2)):
                acc = acc + pltpu.roll(coeffs[j] * gayt, k % p, 1)
            folded = acc
            for jj in range(1, p // w):                  # adjoint of repeat
                folded = folded + pltpu.roll(acc, (-jj * w) % p, 1)
            dimg_ref[0, ci, pl.ds(rs_al, s), :] += folded[:, :w]
    dx_ref[0, 0] = dx
    dy_ref[0, 0] = dy


def _bwd_shift_pallas(img_p, x_row, y_row, rowstart, g, *, s, b, gc=-1):
    n, c, h, w = img_p.shape
    if gc < 0:
        gc = c
    nt, p = x_row.shape[1], x_row.shape[3]
    kernel = functools.partial(_bwd_shift_kernel, c=c, s=s, w=w, b=b, gc=gc)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n, nt),
        in_specs=[
            pl.BlockSpec((1, 1, 1, p), lambda nn, t, rss: (nn, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, p), lambda nn, t, rss: (nn, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, h, w), lambda nn, t, rss: (nn, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c, 1, p), lambda nn, t, rss: (nn, t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, c, h, w), lambda nn, t, rss: (nn, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, p), lambda nn, t, rss: (nn, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, p), lambda nn, t, rss: (nn, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n, c, h, w), jnp.float32),
            jax.ShapeDtypeStruct((n, nt, 1, p), jnp.float32),
            jax.ShapeDtypeStruct((n, nt, 1, p), jnp.float32),
        ],
        interpret=_interpret(),
    )(rowstart, x_row, y_row, img_p, g)


def _bwd_kernel(rowstart_ref, x_ref, y_ref, img_ref, g_ref,
                dimg_ref, dx_ref, dy_ref, *, c, s, w, mxu_bf16, gc):
    t = pl.program_id(1)
    rs = rowstart_ref[pl.program_id(0), t]
    xrow = x_ref[0, 0]                 # (1, P)
    yrow = y_ref[0, 0]

    @pl.when(t == 0)
    def _init():
        dimg_ref[...] = jnp.zeros_like(dimg_ref)

    ylocal = yrow - rs.astype(yrow.dtype)
    ayt, aydt = _taps_t(ylocal, s)     # (S, P)
    bxt, bxdt = _taps_t(xrow, w)       # (W, P)
    mm = jnp.bfloat16 if mxu_bf16 else jnp.float32
    prec = None if mxu_bf16 else _PREC
    bxt_m = bxt.astype(mm)
    bxdt_m = bxdt.astype(mm)
    rs_al = pl.multiple_of(rs, 8)

    # channel-stacked slabs: M = C·S fills the MXU rows (see fwd kernel)
    slab_all = jnp.concatenate(
        [img_ref[0, ci, pl.ds(rs_al, s), :] for ci in range(c)], axis=0
    ).astype(mm)                        # (C·S, W)
    xslab_all = jax.lax.dot_general(
        slab_all, bxt_m, dimension_numbers=_CONTRACT_W,
        preferred_element_type=jnp.float32, precision=prec,
    )                                   # (C·S, P)
    xdslab_all = jax.lax.dot_general(
        slab_all, bxdt_m, dimension_numbers=_CONTRACT_W,
        preferred_element_type=jnp.float32, precision=prec,
    )

    gs = [g_ref[0, 0, ci] for ci in range(c)]                  # each (1, P)
    dx = jnp.zeros_like(xrow)
    dy = jnp.zeros_like(yrow)
    for ci in range(c):
        xslab = xslab_all[ci * s : (ci + 1) * s, :]
        xdslab = xdslab_all[ci * s : (ci + 1) * s, :]
        dy = dy + gs[ci] * jnp.sum(aydt * xslab, axis=0, keepdims=True)
        dx = dx + gs[ci] * jnp.sum(ayt * xdslab, axis=0, keepdims=True)
    dx_ref[0, 0] = dx
    dy_ref[0, 0] = dy

    # dslab[cs, w] = Σ_p (g_c[p]·AyT[s,p]) · BxT[w,p]   (one MXU call).
    # Only the first gc channels get an image gradient: the model warps
    # (fake_B, real_A) in one multi call and real_A is DATA — skipping its
    # d/dimg halves this matmul's M and the scatter traffic (the dx/dy
    # grid gradients above still cover every channel).
    if gc > 0:
        dxslab_all = jnp.concatenate(
            [gs[ci] * ayt for ci in range(gc)], axis=0
        ).astype(mm)                    # (gc·S, P)
        dslab_all = jax.lax.dot_general(
            dxslab_all, bxt_m, dimension_numbers=_CONTRACT_P,
            preferred_element_type=jnp.float32, precision=prec,
        )                               # (gc·S, W)
        for ci in range(gc):
            dimg_ref[0, ci, pl.ds(rs_al, s), :] += (
                dslab_all[ci * s : (ci + 1) * s, :])


def _bwd_pallas(img_p, x_row, y_row, rowstart, g, *, s, mxu_bf16=False, gc=-1):
    n, c, h, w = img_p.shape
    if gc < 0:
        gc = c
    nt, p = x_row.shape[1], x_row.shape[3]
    kernel = functools.partial(_bwd_kernel, c=c, s=s, w=w, mxu_bf16=mxu_bf16,
                               gc=gc)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n, nt),
        in_specs=[
            pl.BlockSpec((1, 1, 1, p), lambda nn, t, rss: (nn, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, p), lambda nn, t, rss: (nn, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, h, w), lambda nn, t, rss: (nn, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c, 1, p), lambda nn, t, rss: (nn, t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, c, h, w), lambda nn, t, rss: (nn, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, p), lambda nn, t, rss: (nn, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, p), lambda nn, t, rss: (nn, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n, c, h, w), jnp.float32),
            jax.ShapeDtypeStruct((n, nt, 1, p), jnp.float32),
            jax.ShapeDtypeStruct((n, nt, 1, p), jnp.float32),
        ],
        interpret=_interpret(),
    )(rowstart, x_row, y_row, img_p, g)


# ---------------------------------------------------------------------------
# custom-VJP core: (img NCHW fp32, x/y rows (N,T,1,P)) -> out (N,C,T,P)
# ---------------------------------------------------------------------------


def _rowstarts_rows(y_row, h, s):
    """Per-tile slab starts (8-aligned) + exactness flag (computed in XLA)."""
    y0 = jnp.floor(y_row[:, :, 0, :])              # (N, T, P)
    lo = jnp.clip(jnp.min(y0, axis=2), 0.0, float(h - 1))
    hi = jnp.clip(jnp.max(y0, axis=2) + 1.0, 0.0, float(h - 1))
    start = jnp.clip(lo, 0.0, float(h - s)).astype(jnp.int32)
    start = (start // 8) * 8  # sublane alignment for the in-kernel slab load
    # aligned start can sit up to 7 rows below lo; slab must still reach hi
    ok = jnp.all(hi - start.astype(hi.dtype) + 1.0 <= float(s))
    return start, ok


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _warp_core(img_p, x_row, y_row, s, mxu_bf16, grad_channels=-1,
               x_bound=0):
    rowstart, _ = _rowstarts_rows(y_row, img_p.shape[2], s)
    if x_bound > 0:
        return _fwd_shift_pallas(img_p, x_row, y_row, rowstart, s=s,
                                 b=x_bound)
    return _fwd_pallas(img_p, x_row, y_row, rowstart, s=s, mxu_bf16=mxu_bf16)


def _warp_core_fwd(img_p, x_row, y_row, s, mxu_bf16, grad_channels=-1,
                   x_bound=0):
    rowstart, _ = _rowstarts_rows(y_row, img_p.shape[2], s)
    if x_bound > 0:
        out = _fwd_shift_pallas(img_p, x_row, y_row, rowstart, s=s,
                                b=x_bound)
    else:
        out = _fwd_pallas(img_p, x_row, y_row, rowstart, s=s,
                          mxu_bf16=mxu_bf16)
    return out, (img_p, x_row, y_row, rowstart)


def _warp_core_bwd(s, mxu_bf16, grad_channels, x_bound, res, g):
    img_p, x_row, y_row, rowstart = res
    if x_bound > 0:
        # shift-gather VJP (round 5): same 2B+2 lane rolls as the r4c
        # forward, no (W x P) one-hot builds, no MXU contractions. The
        # bound holds by construction — this branch of the outer lax.cond
        # only runs when ok_sh verified |floor(x) - col| <= B.
        dimg, dx, dy = _bwd_shift_pallas(img_p, x_row, y_row, rowstart, g,
                                         s=s, b=x_bound, gc=grad_channels)
    else:
        # one backward for the one-hot forward: primal math identical
        dimg, dx, dy = _bwd_pallas(img_p, x_row, y_row, rowstart, g, s=s,
                                   mxu_bf16=mxu_bf16, gc=grad_channels)
    return dimg, dx, dy


_warp_core.defvjp(_warp_core_fwd, _warp_core_bwd)


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------


def kernel_supported(img_shape: Tuple[int, ...], grid_shape: Tuple[int, ...],
                     mode: str) -> bool:
    n, h, w, c = img_shape
    _, gh, gw, _ = grid_shape
    return (
        mode == "bilinear"
        and w == gw
        and w % 128 == 0
        and gh % 8 == 0
        and h % 8 == 0
        and h >= 16
    )


def grid_sample_pallas(
    img: jax.Array,
    grid: jax.Array,
    mode: str = "bilinear",
    padding_mode: str = "zeros",
    align_corners: bool = False,
    max_disp_px: int = 16,
    tile_rows: int = 8,
    grad_channels: int = -1,
    shift_bound: int = 0,
) -> jax.Array:
    """grid_sample with the Pallas slab kernel (exact; auto-fallback to mm).

    See module docstring. Falls back to impl='mm' entirely when shapes are
    unsupported, and per-call via lax.cond when a tile's row span exceeds
    the slab (keeps results exact for unbounded warps like rotations).

    grad_channels >= 0 limits d/dimg to the first `grad_channels` channels
    (the rest receive exact zeros) — callers that warp data tensors whose
    image gradient is never consumed (e.g. real_A in the NeMAR multi-warp)
    skip a third of the backward kernel's MXU work. The dx/dy grid
    gradients are always complete.

    shift_bound > 0 arms the shift-gather FORWARD (probe r4c: 2.38x): when
    every pixel's displacement fits within shift_bound px on both axes
    (checked dynamically), the forward runs as 2B+2 lane rolls on a tight
    B-sized slab instead of the (W x P) one-hot contraction; otherwise it
    falls through to the one-hot kernel, then to mm — always exact. The
    backward is shared (identical primal math). Requires power-of-two W.
    """
    from nemar_tpu.ops import warp as warp_mod

    if not kernel_supported(img.shape, grid.shape, mode):
        return warp_mod._grid_sample_mm(img, grid, mode, padding_mode, align_corners)

    n, h, w, c = img.shape
    gh = grid.shape[1]
    # P = th*W lanes; keep the per-step VMEM (x-taps 2·W·P + S·P slabs)
    # under ~6 MB.
    th = tile_rows
    s_est = min(h, -(-(th + 2 * max_disp_px + 8) // 8) * 8)
    while th > 1 and (2 * w + 4 * s_est) * th * w * 4 > 6 * 1024 * 1024:
        th //= 2
    if gh % th:
        return warp_mod._grid_sample_mm(img, grid, mode, padding_mode, align_corners)
    p = th * w
    nt = gh // th
    # +8 headroom: rowstart is rounded DOWN to a sublane multiple
    s = min(h, th + 2 * max_disp_px + 8)
    s = -(-s // 8) * 8  # round up to sublane multiple
    s = min(s, h)

    orig_dtype = img.dtype
    x_pix = warp_mod._compute_source_coords(
        grid[..., 0], w, align_corners, padding_mode
    ).astype(jnp.float32)
    y_pix = warp_mod._compute_source_coords(
        grid[..., 1], h, align_corners, padding_mode
    ).astype(jnp.float32)
    img_p = jnp.transpose(img, (0, 3, 1, 2)).astype(jnp.float32)  # N C H W

    # flatten per-tile pixels into (N, T, 1, P) lane rows (XLA-side reshape;
    # Mosaic can't reshape across lanes in-kernel)
    x_row = x_pix.reshape(n, nt, 1, p)
    y_row = y_pix.reshape(n, nt, 1, p)

    _, ok = _rowstarts_rows(y_row, h, s)

    mxu_bf16 = orig_dtype == jnp.bfloat16

    def fast(args):
        i, xr, yr = args
        out = _warp_core(i, xr, yr, s, mxu_bf16, grad_channels)  # (N,T,C,1,P)
        return jnp.transpose(out[:, :, :, 0, :], (0, 2, 1, 3)).reshape(n, c, gh, w)

    def slow(args):
        i, xr, yr = args
        return warp_mod._grid_sample_mm_pix(
            i, xr.reshape(n, gh, w), yr.reshape(n, gh, w), mode
        )

    onehot = functools.partial(jax.lax.cond, ok, fast, slow)
    if shift_bound > 0 and (w & (w - 1)) == 0 and th * w == p:
        b = shift_bound
        # tight slab for the shift branch: bounded flow bounds BOTH axes
        s_sh = min(h, -(-(th + 2 * b + 8) // 8) * 8)
        _, ok_y_sh = _rowstarts_rows(y_row, h, s_sh)
        # both bilinear taps covered iff floor(x) - col in [-B, B]
        col = jnp.arange(p, dtype=jnp.int32) % w
        dxi = jnp.floor(x_row[:, :, 0, :]).astype(jnp.int32) - col
        ok_sh = ok_y_sh & jnp.all((dxi >= -b) & (dxi <= b))

        def fast_shift(args):
            i, xr, yr = args
            out = _warp_core(i, xr, yr, s_sh, mxu_bf16, grad_channels, b)
            return jnp.transpose(
                out[:, :, :, 0, :], (0, 2, 1, 3)).reshape(n, c, gh, w)

        out_p = jax.lax.cond(
            ok_sh, fast_shift, lambda a: onehot(a), (img_p, x_row, y_row))
    else:
        out_p = onehot((img_p, x_row, y_row))
    return jnp.transpose(out_p, (0, 2, 3, 1)).astype(orig_dtype)
