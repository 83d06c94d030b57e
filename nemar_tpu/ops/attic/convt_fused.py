"""Fused Pallas ConvTranspose(3x3, stride 2) + InstanceNorm + ReLU, fwd+bwd.

The ResNet generator's decoder (two ConvTranspose+IN+ReLU stages) measures
~40 ms fwd+bwd at b32 (≈7% MFU) under XLA — lhs-dilated convs waste 3/4 of
the MXU work on inserted zeros, and round-2's XLA-level subpixel rewrite
LOST to the native lowering (ROADMAP). This kernel does the subpixel
decomposition where it pays: per output-parity-class matmuls with NO
dilation zeros, the IN statistics and activation fused as epilogue, all
VMEM-resident per sample.

Semantics pinned numerically against flax.linen.ConvTranspose(k=3, s=2,
padding='SAME') (tests/test_convt_fused.py): the contribution of
x[i,j]·W[ky,kx] lands at out[2i+2-ky, 2j+2-kx]. Per axis, output parity 0
draws taps {ky=2 at offset 0, ky=0 at offset -1} and parity 1 {ky=1 at
offset 0}; offsets in {-1, 0} mean the input is zero-padded by one row/col
on top/left. The kernel emits the four parity planes (N, 2, 2, H, W, Co);
the caller interleaves with a cheap XLA depth-to-space. Conv bias is
mathematically inert through IN (see ops/conv_fused.py) and omitted.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-axis tap table: parity -> [(k_index, padded_slice_offset)]
# padded offset = input_offset + 1 with input offsets in {-1, 0}
_AX = {0: [(2, 1), (0, 0)], 1: [(1, 1)]}
# backward-data per-axis: u (=2-k) -> (parity, plane_slice_offset)
# dx[i,j] += gP[parity(u)][i + u//2, ...] * W[2-u, ...]; offsets in {0, +1}
_AXB = [(0, 0, 0), (1, 0, 1), (0, 1, 2)]  # (parity, offset, u)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def convt_kernel_supported(shape, dtype=None) -> bool:
    n, h, w, c = shape
    ok = h % 8 == 0 and w % 8 == 0 and c % 128 == 0
    if not ok:
        return False
    # fp32 at the large decoder stage overflows the scoped VMEM budget
    # (measured: 112 MB > 100 MB limit at (128,128,128) f32); bf16 fits.
    # The f32 case only runs for init forwards / --bf16-off training on
    # TPU — both are correct (and cheap enough) through the XLA reference.
    if (dtype is not None and jnp.dtype(dtype).itemsize >= 4
            and h * w * c * 4 >= 8 * 1024 * 1024
            and jax.default_backend() == "tpu"):
        return False
    return True


_VMEM_LIM = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(x_ref, w_ref, y_ref, st_ref, pad_ref,
                *, h, w, ci, co, eps):
    # pad top/left with one zero row/col
    pad_ref[...] = jnp.zeros_like(pad_ref)
    pad_ref[1:h + 1, 1:w + 1, :] = x_ref[0]

    hw4 = float(4 * h * w)
    planes = []
    s_tot = jnp.zeros((1, co), jnp.float32)
    s2_tot = jnp.zeros((1, co), jnp.float32)
    for py in (0, 1):
        for px in (0, 1):
            acc = None
            for ky, oy in _AX[py]:
                for kx, ox in _AX[px]:
                    slab = pad_ref[oy:oy + h, ox:ox + w, :].reshape(h * w, ci)
                    p = jax.lax.dot_general(
                        slab, w_ref[ky, kx],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    acc = p if acc is None else acc + p
            planes.append(acc)
            s_tot = s_tot + jnp.sum(acc, axis=0, keepdims=True)
            s2_tot = s2_tot + jnp.sum(acc * acc, axis=0, keepdims=True)

    mu = s_tot / hw4
    var = s2_tot / hw4 - mu * mu
    rstd = jax.lax.rsqrt(var + eps)
    for idx, acc in enumerate(planes):
        yhat = (acc - mu) * rstd
        y_ref[0, idx // 2, idx % 2] = yhat.reshape(h, w, co).astype(y_ref.dtype)
    st_ref[0] = jnp.concatenate([mu, rstd], axis=0)


def _fwd_pallas(x, wk, eps):
    n, h, w_, ci = x.shape
    co = wk.shape[-1]
    kernel = functools.partial(_fwd_kernel, h=h, w=w_, ci=ci, co=co, eps=eps)
    y, st = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h, w_, ci), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, ci, co), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 2, 2, h, w_, co), lambda i: (i, 0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, co), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, 2, 2, h, w_, co), x.dtype),  # yhat
            jax.ShapeDtypeStruct((n, 2, co), jnp.float32),        # mu, rstd
        ],
        scratch_shapes=[pltpu.VMEM((h + 1, w_ + 1, ci), x.dtype)],
        compiler_params=_VMEM_LIM,
        interpret=_interpret(),
    )(x, wk)
    return y, st


def _d2s(planes):
    """(N, 2, 2, H, W, C) parity planes -> (N, 2H, 2W, C)."""
    n, _, _, h, w, c = planes.shape
    return planes.transpose(0, 3, 1, 4, 2, 5).reshape(n, 2 * h, 2 * w, c)


def _s2d(g):
    """(N, 2H, 2W, C) -> (N, 2, 2, H, W, C) parity planes."""
    n, h2, w2, c = g.shape
    return g.reshape(n, h2 // 2, 2, w2 // 2, 2, c).transpose(0, 2, 4, 1, 3, 5)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _bwd_kernel(st_ref, x_ref, y_ref, gp_ref, w_ref,
                dw_ref, dx_ref, pad_ref, gpad_ref,
                *, h, w, ci, co, act):
    i = pl.program_id(0)
    hw4 = float(4 * h * w)
    rstd = st_ref[0, 1:2, :]

    # Two passes over the planes keep only ONE plane's values live at a
    # time (the 4-plane gh/yh lists blew the 128 MB VMEM capacity at the
    # 128^2 stage). Pass 1: the IN-backward means. Pass 2: dz -> gpad.
    m1 = jnp.zeros((1, co), jnp.float32)
    m2 = jnp.zeros((1, co), jnp.float32)
    for idx in range(4):
        yh = y_ref[0, idx // 2, idx % 2].astype(jnp.float32).reshape(h * w, co)
        gh = gp_ref[0, idx // 2, idx % 2].astype(jnp.float32).reshape(h * w, co)
        if act == "relu":
            gh = gh * (yh > 0.0)
        m1 = m1 + jnp.sum(gh, axis=0, keepdims=True)
        m2 = m2 + jnp.sum(gh * yh, axis=0, keepdims=True)
    m1, m2 = m1 / hw4, m2 / hw4

    gpad_ref[...] = jnp.zeros_like(gpad_ref)
    pad_ref[...] = jnp.zeros_like(pad_ref)
    pad_ref[1:h + 1, 1:w + 1, :] = x_ref[0]
    for idx in range(4):
        py, px = idx // 2, idx % 2
        yh = y_ref[0, py, px].astype(jnp.float32).reshape(h * w, co)
        gh = gp_ref[0, py, px].astype(jnp.float32).reshape(h * w, co)
        if act == "relu":
            gh = gh * (yh > 0.0)
        dz = rstd * (gh - m1 - yh * m2)
        gpad_ref[idx, 0:h, 0:w, :] = dz.reshape(h, w, co)
        # ---- dW[ky,kx] += x_slab^T @ dz_plane  (contract H*W) ----
        for ky, oy in _AX[py]:
            for kx, ox in _AX[px]:
                slab = pad_ref[oy:oy + h, ox:ox + w, :].reshape(h * w, ci)
                d = jax.lax.dot_general(
                    slab.astype(jnp.float32), dz,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

                @pl.when(i == 0)
                def _():
                    dw_ref[ky, kx] = d

                @pl.when(i != 0)
                def _():
                    dw_ref[ky, kx] += d

    # ---- dx[i,j] = sum_{u,v} gP[par(u)][i+u//2, j+v//2] @ W[2-u,2-v]^T ----
    dx = None
    for pu, ou, u in _AXB:
        for pv, ov, v in _AXB:
            plane = gpad_ref[pu * 2 + pv, ou:ou + h, ov:ov + w, :]
            p = jax.lax.dot_general(
                plane.reshape(h * w, co), w_ref[2 - u, 2 - v],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dx = p if dx is None else dx + p
    dx_ref[0] = dx.reshape(h, w, ci).astype(dx_ref.dtype)


def _bwd_pallas(x, y, st, gp, wk, act):
    n, h, w_, ci = x.shape
    co = wk.shape[-1]
    kernel = functools.partial(_bwd_kernel, h=h, w=w_, ci=ci, co=co, act=act)
    dw, dx = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 2, co), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w_, ci), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 2, h, w_, co), lambda i: (i, 0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 2, h, w_, co), lambda i: (i, 0, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, ci, co), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((3, 3, ci, co), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w_, ci), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, 3, ci, co), jnp.float32),
            jax.ShapeDtypeStruct((n, h, w_, ci), x.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((h + 1, w_ + 1, ci), x.dtype),
            pltpu.VMEM((4, h + 1, w_ + 1, co), jnp.float32),
        ],
        compiler_params=_VMEM_LIM,
        interpret=_interpret(),
    )(st, x, y, gp, wk)
    return dx, dw


# ---------------------------------------------------------------------------
# public op
# ---------------------------------------------------------------------------


def _apply_act(y, act):
    return jnp.maximum(y, 0.0) if act == "relu" else y


def fused_convt_in(x, wk, eps=1e-5, act="relu"):
    """Public entry: Pallas kernel when (shape, dtype) fit the VMEM budget,
    exact XLA reference otherwise (identical math either way).

    co (wk's last dim) must be a lane multiple: Mosaic pads the lane axis
    to 128, and at co=64 that padding doubled every parity-plane buffer —
    measured 132 MB > the 128 MB VMEM capacity inside the full train step.
    Sub-128 co stages route to XLA."""
    if (not convt_kernel_supported(x.shape, x.dtype)
            or wk.shape[-1] % 128 != 0):
        return convt_in_reference(x, wk, eps, act)
    return _fused_convt_in(x, wk, eps, act)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _fused_convt_in(x, wk, eps=1e-5, act="relu"):
    """IN(ConvTranspose3x3s2(x, wk)) (+ReLU), NHWC -> (N, 2H, 2W, Co).

    The kernel emits the normalized pre-activation parity planes; the
    activation + depth-to-space run in XLA (fused, one pass) — this keeps
    the kernel to a single large output, the VMEM lever that fits the
    128^2-input stage in fp32 too.
    """
    y, _ = _fwd_pallas(x, wk, eps)
    return _apply_act(_d2s(y), act)


def _fct_fwd(x, wk, eps, act):
    y, st = _fwd_pallas(x, wk, eps)
    return _apply_act(_d2s(y), act), (x, y, st, wk)


def _fct_bwd(eps, act, res, g):
    x, y, st, wk = res
    dx, dw = _bwd_pallas(x, y, st, _s2d(g), wk, act)
    return dx, dw.astype(wk.dtype)


_fused_convt_in.defvjp(_fct_fwd, _fct_bwd)


def convt_in_reference(x, wk, eps=1e-5, act="relu"):
    """XLA reference of the same math (flax ConvTranspose semantics,
    no bias) for parity tests."""
    from nemar_tpu.ops.norm import instance_norm

    y = jax.lax.conv_transpose(
        x.astype(jnp.float32), wk.astype(jnp.float32), (2, 2), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = instance_norm(y, eps)
    if act == "relu":
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)
