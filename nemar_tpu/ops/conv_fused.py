"""Fused Pallas ResNet-block kernel — conv3x3+IN(+ReLU) x2 + skip, fwd+bwd.

The NeMAR step is conv-bound: at b32 256^2 the ResNet trunk (6 blocks at
64^2 feature maps, C=256 — reference ResnetBlock, models/networks.py) is
the dominant FLOP bucket, and round-2 measured the whole step at ~30% MFU
under XLA (ROADMAP). This kernel computes ONE ResNet block per grid step
entirely in VMEM:

    y1   = conv3x3_reflect(x, W1);  y1hat = IN(y1);  h1 = relu(y1hat)
    y2   = conv3x3_reflect(h1, W2); out   = x + IN(y2)

as 18 MXU matmuls (9 shifted slabs per conv, M=H*W, K=N=C) with the
instance-norm statistics and activation fused as the epilogue — the
round-2 standalone IN kernel lost to XLA on fusion boundaries
(VERDICT r2 weak #3); HERE it has no boundary to lose.

Conv biases are intentionally dropped: IN subtracts the per-(n,c) spatial
mean, so IN(conv(x)+b) == IN(conv(x)) for ANY b and the bias gradient
through IN is exactly zero — the parameters exist (checkpoint
compatibility) but are mathematically inert, as in the reference.

Backward (custom VJP, two kernels to bound VMEM):
    B2: dW2 (batch-accumulated across grid steps) + dh1  from (residuals, g)
    B1: dW1 + dx                                          from (dh1, ...)
with the reflect-pad adjoint folded explicitly (edge rows/cols scatter
back into the interior, reverse of the fwd pad construction order).

Backward slab layout (round 4, probe r4h): the backward's 18 dot slabs
per stage are dx-PRESHIFTED through a (3, H+2, W, C) planes scratch so
every slab is a free major-dim slice with a contiguous reshape — 3
relayout copies per conv instead of 9 misaligned sub-slice loads. Same
trick for the adjoint's zero-padded dz planes. Measured at the b48 trunk
shape, same window: bwd 7.53 vs 9.27 ms (fwd+bwd 105.3 vs 94.2 TFLOPs),
bit-exact. The FORWARD keeps direct slab slices — preshifting there LOSES
slightly (5.97 vs 5.82 ms; Mosaic stages the fwd's misaligned loads well
enough that 6 extra plane copies don't pay). NEMAR_FUSED_BWD=legacy
selects the old backward for A/B probes.

Eligibility: H,W multiples of 8 (sublane) with H*W multiple of the f32
tile, C multiple of 128 (lane). Everything else should use the XLA path.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TAPS = [(dy, dx) for dy in range(3) for dx in range(3)]

def _bwd_planes() -> bool:
    """Probe r4h: preshifted-planes backward wins 19% (bit-exact);
    'legacy' keeps the original misaligned-slab backward for same-window
    A/Bs. Read at trace time (like _impl) so tests/probes can flip
    NEMAR_FUSED_BWD after import."""
    return os.environ.get("NEMAR_FUSED_BWD", "planes") != "legacy"


def _impl() -> str:
    """'kstack' folds the 3 dx-shifted planes into the dot's K dimension
    (3 dots of K=3C per conv, free dy slices, 2 accumulator adds) instead
    of 9 K=C tap dots (9 misaligned slab relayouts fwd / 9 plane slices
    bwd, 8 full-size fp32 adds). 'hybrid' (round 5, probe r4m verdict)
    keeps the taps FORWARD (kstack fwd measured 5.26 vs 5.11 ms — the
    lane-stacked plane build costs more than Mosaic's staging of the
    misaligned loads) with the kstack BACKWARD (8.54 vs 9.01 ms implied
    bwd at the b56 trunk shape, same window). Read at trace time so
    probes can A/B via env. Probe r4l motivated it: the fwd runs at
    ~40% MFU while the planes bwd reaches ~62% — the gap is
    relayout+accumulate traffic,
    not dot throughput.

    PRODUCTION DEFAULT = hybrid since round 5: probe r5a, one window —
    block f+b 13.86 vs 14.21 ms, in-step b56 150.28 vs 149.31 pairs/s
    (the 5.0x BASELINE north star's crossing)."""
    return os.environ.get("NEMAR_FUSED_IMPL", "hybrid")


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def block_kernel_supported(shape) -> bool:
    n, h, w, c = shape
    return h % 8 == 0 and w % 8 == 0 and c % 128 == 0 and h >= 8 and w >= 8


# ---------------------------------------------------------------------------
# in-kernel helpers
# ---------------------------------------------------------------------------


def _fill_pad(pad_ref, interior, h, w):
    """pad_ref (H+2, W+2, C) <- reflect-pad of interior (H, W, C).

    Order matters for the adjoint: interior, then rows from interior, then
    cols from the (already written) pad columns.
    """
    pad_ref[1:h + 1, 1:w + 1, :] = interior
    pad_ref[0, 1:w + 1, :] = interior[1]
    pad_ref[h + 1, 1:w + 1, :] = interior[h - 2]
    pad_ref[:, 0:1, :] = pad_ref[:, 2:3, :]
    pad_ref[:, w + 1:w + 2, :] = pad_ref[:, w - 1:w, :]


def _conv9(pad_ref, w_ref, h, w, c, acc_dtype=jnp.float32):
    """Sum of 9 shifted-slab matmuls: (H*W, C) fp32."""
    acc = None
    for dy, dx in _TAPS:
        slab = pad_ref[dy:dy + h, dx:dx + w, :].reshape(h * w, c)
        p = jax.lax.dot_general(
            slab, w_ref[dy, dx],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=acc_dtype,
        )
        acc = p if acc is None else acc + p
    return acc


def _in_stats(y, hw, eps):
    """Per-channel spatial mean/rstd of y (HW, C) fp32."""
    mu = jnp.sum(y, axis=0, keepdims=True) / hw
    var = jnp.sum(y * y, axis=0, keepdims=True) / hw - mu * mu
    return mu, jax.lax.rsqrt(var + eps)


def _fill_kplanes(p_ref, pad_ref, w, c):
    """p_ref (H+2, W, 3C) <- the 3 dx-shifted w-wide windows of pad_ref
    (H+2, W+2, C), stacked along LANES (channel block dx). The dot's K
    dimension then spans all 3 dx taps at once; dy slices of p_ref are
    free major-dim slices with contiguous (h*w, 3c) reshapes."""
    for dx in range(3):
        p_ref[:, :, dx * c:(dx + 1) * c] = pad_ref[:, dx:dx + w, :]


def _conv3k(p_ref, wk_ref, h, w, c):
    """Sum of 3 K-stacked matmuls: (H*W, C) fp32.

    wk_ref (3, 3C, C) is w (3,3,C,C) reshaped outside the kernel: rows
    block dx of wk[dy] is w[dy, dx]. y[a,b] = sum_dy P[dy+a, b] @ wk[dy].
    """
    acc = None
    for dy in range(3):
        slab = p_ref[dy:dy + h].reshape(h * w, 3 * c)
        p = jax.lax.dot_general(
            slab, wk_ref[dy],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = p if acc is None else acc + p
    return acc


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(x_ref, w1_ref, w2_ref, out_ref, y1_ref, st_ref,
                pad_ref, *, h, w, c, eps):
    hw = float(h * w)
    cdt = x_ref.dtype

    _fill_pad(pad_ref, x_ref[0], h, w)
    y1 = _conv9(pad_ref, w1_ref, h, w, c)
    mu1, rstd1 = _in_stats(y1, hw, eps)
    y1hat = (y1 - mu1) * rstd1
    y1_ref[0] = y1hat.reshape(h, w, c).astype(y1_ref.dtype)
    h1 = jnp.maximum(y1hat, 0.0).astype(cdt)

    _fill_pad(pad_ref, h1.reshape(h, w, c), h, w)
    y2 = _conv9(pad_ref, w2_ref, h, w, c)
    mu2, rstd2 = _in_stats(y2, hw, eps)
    y2hat = (y2 - mu2) * rstd2

    out_ref[0] = (x_ref[0].astype(jnp.float32)
                  + y2hat.reshape(h, w, c)).astype(out_ref.dtype)
    st_ref[0] = jnp.concatenate([mu1, rstd1, mu2, rstd2], axis=0)


def _fwd_kernel_kstack(x_ref, w1k_ref, w2k_ref, out_ref, y1_ref, st_ref,
                       pad_ref, p_ref, *, h, w, c, eps):
    hw = float(h * w)
    cdt = x_ref.dtype

    _fill_pad(pad_ref, x_ref[0], h, w)
    _fill_kplanes(p_ref, pad_ref, w, c)
    y1 = _conv3k(p_ref, w1k_ref, h, w, c)
    mu1, rstd1 = _in_stats(y1, hw, eps)
    y1hat = (y1 - mu1) * rstd1
    y1_ref[0] = y1hat.reshape(h, w, c).astype(y1_ref.dtype)
    h1 = jnp.maximum(y1hat, 0.0).astype(cdt)

    _fill_pad(pad_ref, h1.reshape(h, w, c), h, w)
    _fill_kplanes(p_ref, pad_ref, w, c)
    y2 = _conv3k(p_ref, w2k_ref, h, w, c)
    mu2, rstd2 = _in_stats(y2, hw, eps)
    y2hat = (y2 - mu2) * rstd2

    out_ref[0] = (x_ref[0].astype(jnp.float32)
                  + y2hat.reshape(h, w, c)).astype(out_ref.dtype)
    st_ref[0] = jnp.concatenate([mu1, rstd1, mu2, rstd2], axis=0)


def _fwd_pallas(x, w1, w2, eps):
    n, h, w_, c = x.shape
    kstack = _impl() == "kstack"
    if kstack:
        kernel = functools.partial(_fwd_kernel_kstack, h=h, w=w_, c=c,
                                   eps=eps)
        # (3,3,C,C) -> (3, 3C, C): rows block dx of [dy] is w[dy, dx]
        w_in = [w1.reshape(3, 3 * c, c), w2.reshape(3, 3 * c, c)]
        w_specs = [pl.BlockSpec((3, 3 * c, c), lambda i: (0, 0, 0),
                                memory_space=pltpu.VMEM)] * 2
        scratches = [pltpu.VMEM((h + 2, w_ + 2, c), x.dtype),
                     pltpu.VMEM((h + 2, w_, 3 * c), x.dtype)]
    else:
        kernel = functools.partial(_fwd_kernel, h=h, w=w_, c=c, eps=eps)
        w_in = [w1, w2]
        w_specs = [pl.BlockSpec((3, 3, c, c), lambda i: (0, 0, 0, 0),
                                memory_space=pltpu.VMEM)] * 2
        scratches = [pltpu.VMEM((h + 2, w_ + 2, c), x.dtype)]
    out, y1, st = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w_, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + w_specs,
        out_specs=[
            pl.BlockSpec((1, h, w_, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w_, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, h, w_, c), x.dtype),       # out
            jax.ShapeDtypeStruct((n, h, w_, c), x.dtype),       # y1hat
            jax.ShapeDtypeStruct((n, 4, c), jnp.float32),       # stats
        ],
        scratch_shapes=scratches,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=_interpret(),
    )(x, *w_in)
    return out, y1, st


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------


def _in_bwd(gy, yhat, rstd, hw):
    """dz of z -> IN(z): rstd*(g - mean(g) - yhat*mean(g*yhat)), fp32."""
    m1 = jnp.sum(gy, axis=0, keepdims=True) / hw
    m2 = jnp.sum(gy * yhat, axis=0, keepdims=True) / hw
    return rstd * (gy - m1 - yhat * m2)


def _pad_adjoint(dpad_ref, h, w):
    """(H, W, C) fp32 gradient from the padded-gradient scratch — exact
    reverse of _fill_pad's construction order. All folds are ref-slice
    += ops (Mosaic has no scatter-add primitive)."""
    # cols first (they were written last, FROM pad cols 2 / w-1)
    dpad_ref[:, 2:3, :] += dpad_ref[:, 0:1, :]
    dpad_ref[:, w - 1:w, :] += dpad_ref[:, w + 1:w + 2, :]
    # row reflections (pad rows 0/h+1 were written FROM interior rows 1 and
    # h-2, i.e. padded rows 2 and h-1)
    dpad_ref[2, 1:w + 1, :] += dpad_ref[0, 1:w + 1, :]
    dpad_ref[h - 1, 1:w + 1, :] += dpad_ref[h + 1, 1:w + 1, :]
    return dpad_ref[1:h + 1, 1:w + 1, :]


def _conv_adjoint(dz3, w_ref, dzp_ref, dpad_ref, h, w, c):
    """dpad <- full-correlation of dz with W^T (the conv-input adjoint).

    dPx[a,b] = Σ_{dy,dx} dz[a-dy, b-dx] @ W[dy,dx]^T, computed as 9
    shifted-slab matmuls over a zero-padded dz (slab offset (2-dy, 2-dx))
    with REGISTER accumulation — the earlier scatter formulation paid 9
    read-modify-write passes over the fp32 (H+2,W+2,C) scratch (~80 MB of
    VPU traffic per sample per conv); this form writes it once. Operands
    stay in the compute dtype (bf16 in production) with fp32 accumulation
    — the same contract as XLA's bf16 conv autodiff.
    """
    dzp_ref[...] = jnp.zeros_like(dzp_ref)
    dzp_ref[2:h + 2, 2:w + 2, :] = dz3.reshape(h, w, c)
    acc = None
    for dy, dx in _TAPS:
        slab = dzp_ref[2 - dy:h + 4 - dy, 2 - dx:w + 4 - dx, :].reshape(
            (h + 2) * (w + 2), c)
        p = jax.lax.dot_general(
            slab, w_ref[dy, dx],
            dimension_numbers=(((1,), (1,)), ((), ())),  # contract out-ch
            preferred_element_type=jnp.float32,
        )
        acc = p if acc is None else acc + p
    dpad_ref[...] = acc.reshape(h + 2, w + 2, c)


def _fill_planes(pl_ref, pad_ref, w):
    """pl_ref (3, H+2, W, C) <- the three dx-shifted w-wide windows of
    pad_ref (H+2, W+2, C). Each store is ONE relayout copy; afterwards
    every (dy, dx) slab is a free leading-dim slice whose (h*w, c)
    reshape is contiguous (probe r4h: bwd 7.53 vs 9.27 ms at the b48
    trunk shape)."""
    for dx in range(3):
        pl_ref[dx] = pad_ref[:, dx:dx + w, :]


def _dw9(pad_ref, dz3, dw_ref, first, h, w, c):
    """dW[dy,dx] += slab^T @ dz (contract HW rows), batch-accumulated."""
    for dy, dx in _TAPS:
        slab = pad_ref[dy:dy + h, dx:dx + w, :].reshape(h * w, c)
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


def _dw9_planes(pl_ref, dz3, dw_ref, first, h, w, c):
    """_dw9 through the preshifted planes scratch."""
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


def _dw3k(p_ref, dz3, dwk_ref, first, h, w, c):
    """dWk[dy] (3C, C) += P[dy:dy+h]^T @ dz (contract HW rows) — all three
    dx taps of one dy in a single dot, batch-accumulated across grid."""
    for dy in range(3):
        slab = p_ref[dy:dy + h].reshape(h * w, 3 * c)
        d = jax.lax.dot_general(
            slab, dz3,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(first)
        def _():
            dwk_ref[dy] = d

        @pl.when(jnp.logical_not(first))
        def _():
            dwk_ref[dy] += d


def _conv_adjoint_kstack(dz3, wtk_ref, dzp_ref, az_ref, dpad_ref, h, w, c):
    """_conv_adjoint with the dx shifts folded into K.

    az_ref (H+4, W+2, 3C): channel block dx holds dzp[:, 2-dx : w+4-dx].
    wtk_ref (3, 3C, C): rows block dx of [dy] is W[dy, dx]^T (restacked
    outside the kernel). dpad[a, b] = sum_dy AZ[2-dy+a, b] @ wtk[dy].
    """
    dzp_ref[...] = jnp.zeros_like(dzp_ref)
    dzp_ref[2:h + 2, 2:w + 2, :] = dz3.reshape(h, w, c)
    for dx in range(3):
        az_ref[:, :, dx * c:(dx + 1) * c] = dzp_ref[:, 2 - dx:4 - dx + w, :]
    acc = None
    for dy in range(3):
        slab = az_ref[2 - dy:h + 4 - dy].reshape((h + 2) * (w + 2), 3 * c)
        p = jax.lax.dot_general(
            slab, wtk_ref[dy],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = p if acc is None else acc + p
    dpad_ref[...] = acc.reshape(h + 2, w + 2, c)


def _conv_adjoint_planes(dz3, w_ref, dzp_ref, az_ref, dpad_ref, h, w, c):
    """_conv_adjoint through 3 preshifted (w+2)-wide planes of the
    zero-padded dz (az_ref: (3, H+4, W+2, C))."""
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


def _bwd2_kernel_kstack(st_ref, x_ref, y1_ref, out_ref, g_ref, w2tk_ref,
                        dw2k_ref, dh1_ref, pad_ref, p_ref, dpad_ref,
                        dzp_ref, az_ref, *, h, w, c):
    """Stage B2 (kstack): through IN2 and conv2 -> (dW2k, dh1)."""
    i = pl.program_id(0)
    hw = float(h * w)
    g = g_ref[0].astype(jnp.float32).reshape(h * w, c)
    y2hat = (out_ref[0].astype(jnp.float32)
             - x_ref[0].astype(jnp.float32)).reshape(h * w, c)
    rstd2 = st_ref[0, 3:4, :]
    dz2 = _in_bwd(g, y2hat, rstd2, hw).astype(x_ref.dtype)

    h1 = jnp.maximum(y1_ref[0].astype(jnp.float32), 0.0).astype(x_ref.dtype)
    _fill_pad(pad_ref, h1, h, w)
    _fill_kplanes(p_ref, pad_ref, w, c)
    _dw3k(p_ref, dz2, dw2k_ref, i == 0, h, w, c)
    _conv_adjoint_kstack(dz2, w2tk_ref, dzp_ref, az_ref, dpad_ref, h, w, c)
    dh1 = _pad_adjoint(dpad_ref, h, w)
    dh1_ref[0] = dh1.astype(dh1_ref.dtype)


def _bwd1_kernel_kstack(st_ref, x_ref, y1_ref, g_ref, dh1_ref, w1tk_ref,
                        dw1k_ref, dx_ref, pad_ref, p_ref, dpad_ref,
                        dzp_ref, az_ref, *, h, w, c):
    """Stage B1 (kstack): through relu, IN1, conv1 -> (dW1k, dx)."""
    i = pl.program_id(0)
    hw = float(h * w)
    y1hat = y1_ref[0].astype(jnp.float32).reshape(h * w, c)
    gh = dh1_ref[0].astype(jnp.float32).reshape(h * w, c)
    gh = gh * (y1hat > 0.0)
    rstd1 = st_ref[0, 1:2, :]
    dz1 = _in_bwd(gh, y1hat, rstd1, hw).astype(x_ref.dtype)

    _fill_pad(pad_ref, x_ref[0], h, w)
    _fill_kplanes(p_ref, pad_ref, w, c)
    _dw3k(p_ref, dz1, dw1k_ref, i == 0, h, w, c)
    _conv_adjoint_kstack(dz1, w1tk_ref, dzp_ref, az_ref, dpad_ref, h, w, c)
    dx_conv = _pad_adjoint(dpad_ref, h, w)
    dx_ref[0] = (g_ref[0].astype(jnp.float32) + dx_conv).astype(dx_ref.dtype)


def _bwd2_kernel(st_ref, x_ref, y1_ref, out_ref, g_ref, w2_ref,
                 dw2_ref, dh1_ref, *scratch, h, w, c, planes):
    """Stage B2: through IN2 and conv2 -> (dW2, dh1)."""
    if planes:
        pad_ref, pl_ref, dpad_ref, dzp_ref, az_ref = scratch
    else:
        pad_ref, dpad_ref, dzp_ref = scratch
    i = pl.program_id(0)
    hw = float(h * w)
    g = g_ref[0].astype(jnp.float32).reshape(h * w, c)
    y2hat = (out_ref[0].astype(jnp.float32)
             - x_ref[0].astype(jnp.float32)).reshape(h * w, c)
    rstd2 = st_ref[0, 3:4, :]
    # IN-bwd statistics in fp32; the conv-adjoint matmul operands drop to
    # the compute dtype with fp32 accumulation.
    dz2 = _in_bwd(g, y2hat, rstd2, hw).astype(x_ref.dtype)

    # h1 = relu(y1hat); its padded form feeds both dW2 and nothing else
    h1 = jnp.maximum(y1_ref[0].astype(jnp.float32), 0.0).astype(x_ref.dtype)
    _fill_pad(pad_ref, h1, h, w)
    if planes:
        _fill_planes(pl_ref, pad_ref, w)
        _dw9_planes(pl_ref, dz2, dw2_ref, i == 0, h, w, c)
        _conv_adjoint_planes(dz2, w2_ref, dzp_ref, az_ref, dpad_ref, h, w, c)
    else:
        _dw9(pad_ref, dz2, dw2_ref, i == 0, h, w, c)
        _conv_adjoint(dz2, w2_ref, dzp_ref, dpad_ref, h, w, c)
    dh1 = _pad_adjoint(dpad_ref, h, w)
    dh1_ref[0] = dh1.astype(dh1_ref.dtype)


def _bwd1_kernel(st_ref, x_ref, y1_ref, g_ref, dh1_ref, w1_ref,
                 dw1_ref, dx_ref, *scratch, h, w, c, planes):
    """Stage B1: through relu, IN1, conv1 -> (dW1, dx = g + conv1-adjoint)."""
    if planes:
        pad_ref, pl_ref, dpad_ref, dzp_ref, az_ref = scratch
    else:
        pad_ref, dpad_ref, dzp_ref = scratch
    i = pl.program_id(0)
    hw = float(h * w)
    y1hat = y1_ref[0].astype(jnp.float32).reshape(h * w, c)
    gh = dh1_ref[0].astype(jnp.float32).reshape(h * w, c)
    gh = gh * (y1hat > 0.0)
    rstd1 = st_ref[0, 1:2, :]
    dz1 = _in_bwd(gh, y1hat, rstd1, hw).astype(x_ref.dtype)

    _fill_pad(pad_ref, x_ref[0], h, w)
    if planes:
        _fill_planes(pl_ref, pad_ref, w)
        _dw9_planes(pl_ref, dz1, dw1_ref, i == 0, h, w, c)
        _conv_adjoint_planes(dz1, w1_ref, dzp_ref, az_ref, dpad_ref, h, w, c)
    else:
        _dw9(pad_ref, dz1, dw1_ref, i == 0, h, w, c)
        _conv_adjoint(dz1, w1_ref, dzp_ref, dpad_ref, h, w, c)
    dx_conv = _pad_adjoint(dpad_ref, h, w)
    dx_ref[0] = (g_ref[0].astype(jnp.float32) + dx_conv).astype(dx_ref.dtype)


def _bwd_pallas_kstack(x, y1, st, out, g, w1, w2):
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
    wk_spec = pl.BlockSpec((3, 3 * c, c), lambda i: (0, 0, 0),
                           memory_space=pltpu.VMEM)
    st_spec = pl.BlockSpec((1, 4, c), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    scratches = [
        pltpu.VMEM((h + 2, w_ + 2, c), cdt),            # pad
        pltpu.VMEM((h + 2, w_, 3 * c), cdt),            # kplanes
        pltpu.VMEM((h + 2, w_ + 2, c), jnp.float32),    # dpad
        pltpu.VMEM((h + 4, w_ + 4, c), cdt),            # dzp
        pltpu.VMEM((h + 4, w_ + 2, 3 * c), cdt),        # az kplanes
    ]
    # rows block dx of [dy] is W[dy, dx]^T (adjoint contracts out-ch)
    w1tk = jnp.swapaxes(w1, 2, 3).reshape(3, 3 * c, c)
    w2tk = jnp.swapaxes(w2, 2, 3).reshape(3, 3 * c, c)

    dw2k, dh1 = pl.pallas_call(
        functools.partial(_bwd2_kernel_kstack, h=h, w=w_, c=c),
        grid=(n,),
        in_specs=[st_spec, b_spec, b_spec, b_spec, b_spec, wk_spec],
        out_specs=[wk_spec, b_spec],
        out_shape=[
            jax.ShapeDtypeStruct((3, 3 * c, c), jnp.float32),
            jax.ShapeDtypeStruct((n, h, w_, c), cdt),
        ],
        scratch_shapes=list(scratches),
        **common,
    )(st, x, y1, out, g, w2tk)

    dw1k, dx = pl.pallas_call(
        functools.partial(_bwd1_kernel_kstack, h=h, w=w_, c=c),
        grid=(n,),
        in_specs=[st_spec, b_spec, b_spec, b_spec, b_spec, wk_spec],
        out_specs=[wk_spec, b_spec],
        out_shape=[
            jax.ShapeDtypeStruct((3, 3 * c, c), jnp.float32),
            jax.ShapeDtypeStruct((n, h, w_, c), cdt),
        ],
        scratch_shapes=list(scratches),
        **common,
    )(st, x, y1, g, dh1, w1tk)

    # (3, 3C, C) -> (3, 3, C, C): inverse of the stacking reshape
    dw1 = dw1k.reshape(3, 3, c, c).astype(w1.dtype)
    dw2 = dw2k.reshape(3, 3, c, c).astype(w2.dtype)
    return dx, dw1, dw2


def _bwd_pallas(x, y1, st, out, g, w1, w2):
    if _impl() in ("kstack", "hybrid"):
        return _bwd_pallas_kstack(x, y1, st, out, g, w1, w2)
    n, h, w_, c = x.shape
    cdt = x.dtype
    planes = _bwd_planes()
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
    dpad = pltpu.VMEM((h + 2, w_ + 2, c), jnp.float32)
    dzp = pltpu.VMEM((h + 4, w_ + 4, c), cdt)
    if planes:
        scratches = [pad, pltpu.VMEM((3, h + 2, w_, c), cdt), dpad, dzp,
                     pltpu.VMEM((3, h + 4, w_ + 2, c), cdt)]
    else:
        scratches = [pad, dpad, dzp]

    dw2, dh1 = pl.pallas_call(
        functools.partial(_bwd2_kernel, h=h, w=w_, c=c, planes=planes),
        grid=(n,),
        in_specs=[st_spec, b_spec, b_spec, b_spec, b_spec, w_spec],
        out_specs=[w_spec, b_spec],
        out_shape=[
            jax.ShapeDtypeStruct((3, 3, c, c), jnp.float32),
            jax.ShapeDtypeStruct((n, h, w_, c), cdt),
        ],
        scratch_shapes=list(scratches),
        **common,
    )(st, x, y1, out, g, w2)

    dw1, dx = pl.pallas_call(
        functools.partial(_bwd1_kernel, h=h, w=w_, c=c, planes=planes),
        grid=(n,),
        in_specs=[st_spec, b_spec, b_spec, b_spec, b_spec, w_spec],
        out_specs=[w_spec, b_spec],
        out_shape=[
            jax.ShapeDtypeStruct((3, 3, c, c), jnp.float32),
            jax.ShapeDtypeStruct((n, h, w_, c), cdt),
        ],
        scratch_shapes=list(scratches),
        **common,
    )(st, x, y1, g, dh1, w1)

    return dx, dw1.astype(w1.dtype), dw2.astype(w2.dtype)


# ---------------------------------------------------------------------------
# public custom-VJP op
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_resblock(x, w1, w2, eps=1e-5):
    """out = x + IN(conv3x3r(relu(IN(conv3x3r(x, w1))), w2)); NHWC.

    Reflect padding; instance norm per (n, c) with biased variance and no
    affine (reference InstanceNorm2d config, SURVEY.md A.4). Conv biases
    are mathematically inert through IN and therefore not inputs.
    """
    out, _, _ = _fwd_pallas(x, w1, w2, eps)
    return out


def _fused_fwd(x, w1, w2, eps):
    out, y1, st = _fwd_pallas(x, w1, w2, eps)
    return out, (x, y1, st, out, w1, w2)


def _fused_bwd(eps, res, g):
    x, y1, st, out, w1, w2 = res
    return _bwd_pallas(x, y1, st, out, g, w1, w2)


fused_resblock.defvjp(_fused_fwd, _fused_bwd)


def resblock_reference(x, w1, w2, eps=1e-5):
    """XLA reference of the same math (for parity tests): reflect-pad
    conv3x3 (no bias) + IN + relu, again, + skip."""
    from nemar_tpu.ops.norm import instance_norm

    def conv(v, w):
        vp = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        return jax.lax.conv_general_dilated(
            vp, w, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )

    h1 = jnp.maximum(instance_norm(conv(x, w1), eps), 0.0).astype(x.dtype)
    y2 = instance_norm(conv(h1, w2), eps)
    return (x.astype(jnp.float32) + y2).astype(x.dtype)
