"""Exact (7x1)∘(1x7) factorization of the c7s1 head conv.

The direct 7x7 C64->3 head uses 3 of 128 MXU output lanes. Blocking
space (conv_s2d) fixes lane util but pays 2.94x FLOPs plus four large
transposes — measured a wash at (32,256,256,64) (probe r3g/r3h).

This rewrite is algebraic and FLOP-preserving:

  P[n,i,j,(dx,o)] = sum_{dy,ci} x[n,i+dy,j,ci] * W[dy,dx,ci,o]
  y[n,i,j,o]      = sum_{dx}    P[n,i,j+dx,(dx,o)]

Step 1 is a (7,1) conv with C_out = 7*C_out_true = 21 — the SAME
18.8 kFLOP/px as the direct conv (it is the direct conv's contraction,
re-grouped), but emitting 21 lanes instead of 3. Step 2 is a (1,7) conv
whose kernel is a CONSTANT one-hot selector (no gradient flows to it),
costing 2*7*21*3 = 0.9 kFLOP/px. Autodiff of the pair yields factorized
backward convs with the same improved lane counts (d/dx: 21->64 via
contraction 147; dW: 21-feature correlation instead of 3).

Exact to f32 roundoff vs the direct lowering (tests/test_conv_s2d.py).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

_K = 7


def _selector(cout, dtype, kw=_K):
    """(1, kw, kw*cout, cout) constant: K2[0,dx,(dx',o),o'] = δ_dx,dx' δ_o,o'."""
    sel = np.zeros((1, kw, kw * cout, cout), np.float32)
    for dx in range(kw):
        for o in range(cout):
            sel[0, dx, dx * cout + o, o] = 1.0
    return jnp.asarray(sel, dtype)


def conv_fact(x: jax.Array, kernel: jax.Array, pad: int) -> jax.Array:
    """Zero-padded kxk conv via the (kx1)∘(1xk) factorization.

    General form of conv7_fact for the small-C_out heads outside the
    generator (e.g. the STN's 2-channel flow heads, which use 2 of 128
    MXU output lanes under the direct lowering). Same math as
    nn.Conv(cout, (k, k), padding=pad) with zero padding, up to f32
    summation order. Bias is the caller's concern.
    """
    kh, kw, cin, cout = kernel.shape
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    k1 = kernel.transpose(0, 2, 1, 3).reshape(kh, 1, cin, kw * cout)
    p = lax.conv_general_dilated(
        xp, k1, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )
    return lax.conv_general_dilated(
        p, _selector(cout, x.dtype, kw), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )


_GROUPS = ((0, 2), (2, 4), (4, 6), (6, 7))  # dy row-groups for conv7_fact_g


def conv7_fact_g(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """conv7_fact with the dy contraction split into 4 row-groups.

    The plain factorization's (7,1) stage emits 21 output lanes (16% MXU
    lane util). Splitting dy into groups (2,2,2,1) turns it into four
    (len,1) convs over row-shifted windows whose concatenated outputs give
    4*21 = 84 lanes (66%); the constant selector then sums groups AND dx.
    Same total stage-1 FLOPs (each group only contracts its own rows);
    the input is read ~4x (one pass per group) — a bandwidth-for-lane-util
    trade that pays at (32,256,256,64) where stage 1 is compute-bound.
    Exact vs the direct lowering (tests/test_conv_s2d.py).
    """
    n, h, w, cin = x.shape
    cout = kernel.shape[-1]
    xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
    ps = []
    for g0, g1 in _GROUPS:
        k1 = kernel[g0:g1].transpose(0, 2, 1, 3).reshape(
            g1 - g0, 1, cin, _K * cout)
        ps.append(lax.conv_general_dilated(
            xp[:, g0:g0 + h + (g1 - g0) - 1], k1, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype,
        ))  # each (n, h, w+6, 7*cout)
    p = jnp.concatenate(ps, axis=-1)  # (n, h, w+6, 4*7*cout)
    ng = len(_GROUPS)
    sel = np.zeros((1, _K, ng * _K * cout, cout), np.float32)
    for g in range(ng):
        for dx in range(_K):
            for o in range(cout):
                sel[0, dx, (g * _K + dx) * cout + o, o] = 1.0
    return lax.conv_general_dilated(
        p, jnp.asarray(sel, x.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )


def conv7_fact(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """reflect_pad(3) + 7x7 VALID conv via the (7x1)∘(1x7) factorization.

    x: (N, H, W, Cin); kernel: (7, 7, Cin, Cout). Returns (N, H, W, Cout),
    equal to the direct lowering at networks.py:154/226 up to f32
    summation order.
    """
    n, h, w, cin = x.shape
    cout = kernel.shape[-1]
    xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
    # K1[dy, 0, ci, (dx, o)] = W[dy, dx, ci, o]
    k1 = kernel.transpose(0, 2, 1, 3).reshape(_K, 1, cin, _K * cout)
    p = lax.conv_general_dilated(
        xp, k1, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )  # (n, h, w+6, 7*cout)
    y = lax.conv_general_dilated(
        p, _selector(cout, x.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )  # (n, h, w, cout)
    return y
