"""Small-output-channel convolution via the scatter (matmul-then-shift-add)
formulation — pure XLA, autodiff-friendly.

The generator's 7x7 head conv to output_nc=3 runs at ~3% MFU under the
direct lowering (probe r3d: 21 ms fwd+bwd of the 262 ms step, twice per
step): with Cout=3 the MXU's 128 output lanes are 2.3% utilized, fwd and
backward both. The scatter form lifts the tap index into the CHANNEL
dimension instead:

    T[p, (tap, c)] = sum_k xp[p, k] * W[tap, k, c]      one matmul,
                                                        N = k*k*Cout lanes
    out[i, j, c]   = sum_tap T[i+dy, j+dx, (tap, c)]    k*k shifted adds

The matmul's output lanes are k*k*Cout (49*3 = 147) instead of 3 — ~50x
better MXU utilization; the shift-adds are bandwidth-bound elementwise
work XLA fuses. The backward differentiates through both stages (the
shift-add adjoint is a scatter of slices; the matmul adjoints are
full-lane matmuls).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def conv2d_small_cout(x: jax.Array, w: jax.Array, pad: int,
                      pad_mode: str = "reflect") -> jax.Array:
    """VALID conv of reflect/zero-padded x with kernel w (kh, kw, Ci, Co).

    Equivalent to nn.Conv(Co, (kh, kw), padding='VALID')(pad(x)) without
    bias; intended for small Co (the lane-utilization win shrinks as Co
    approaches 128, and the T intermediate grows as kh*kw*Co).
    """
    kh, kw, ci, co = w.shape
    if pad:
        x = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                    mode=pad_mode)
    n, hp, wp, _ = x.shape
    h, w_ = hp - kh + 1, wp - kw + 1
    w2 = w.transpose(0, 1, 2, 3).reshape(kh * kw, ci, co)
    w2 = w2.transpose(1, 0, 2).reshape(ci, kh * kw * co)
    t = jax.lax.dot_general(
        x.reshape(-1, ci), w2,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(n, hp, wp, kh * kw * co)
    out = None
    for dy in range(kh):
        for dx in range(kw):
            idx = (dy * kw + dx) * co
            sl = t[:, dy:dy + h, dx:dx + w_, idx:idx + co]
            out = sl if out is None else out + sl
    return out.astype(x.dtype)
