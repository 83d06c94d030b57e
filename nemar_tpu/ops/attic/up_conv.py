"""Exact fused rewrite of the UNet-STN decoder's upsample+conv stages.

The reference decoder (reference models/stn/unet_stn.py upsample+conv
blocks; see docs/PARITY.md) computes `conv3x3(nearest_up2(x))` at FULL
resolution: 9·Cin·Cout MACs per high-res pixel, with the 4x-upsampled
activation materialized in HBM, and (at the last level) only 32 of 128 MXU
output lanes live. At b32 256² the five decoder stages are ~200 GFLOP of
the STN's forward — measured ~10% MFU (probe r3k).

Because nearest-2x upsampling just repeats pixels, each output pixel
(2I+oy, 2J+ox) reads at most a 2x2 window of the LOW-res input, with tap
weights that are fixed sums of the original 3x3 kernel:

    rows, oy=0:  y = W[0]·x[I-1] + (W[1]+W[2])·x[I]
    rows, oy=1:  y = (W[0]+W[1])·x[I] + W[2]·x[I+1]

(and the same combination over columns). So the whole stage is ONE 2x2
VALID conv on the zero-padded low-res input producing 4·Cout channels
(one group per output parity (oy, ox)), followed by a depth-to-space
interleave: 4·Cin·Cout MACs per high-res pixel (2.25x fewer), 4x the
output lanes, and no upsampled intermediate. The zero padding of the
full-res conv maps exactly to a 1-pixel zero pad of the low-res input.

Math is identical up to float summation order (W[1]+W[2] is combined in
the weight instead of the activation); parity vs the direct lowering is
asserted to 1e-5 f32 / 1e-2 bf16 in tests/test_up_conv.py. The transform
is pure XLA (pad + conv + slice + stack), so autodiff differentiates the
rewrite itself and the backward inherits the same layout win.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _combined_kernel(kernel: jax.Array) -> jax.Array:
    """(3,3,Cin,Cout) -> (2,2,Cin,4*Cout), out-channel layout (oy,ox,co)."""
    k = kernel
    # row (dy) combination per output row parity oy
    rows = [
        jnp.stack([k[0], k[1] + k[2]], axis=0),  # oy=0: taps x[I-1], x[I]
        jnp.stack([k[0] + k[1], k[2]], axis=0),  # oy=1: taps x[I], x[I+1]
    ]  # each (2, 3, Cin, Cout)
    out = []
    for r in rows:
        cols = [
            jnp.stack([r[:, 0], r[:, 1] + r[:, 2]], axis=1),
            jnp.stack([r[:, 0] + r[:, 1], r[:, 2]], axis=1),
        ]  # each (2, 2, Cin, Cout)
        out.append(jnp.stack(cols, axis=0))
    kk = jnp.stack(out, axis=0)  # (oy, ox, a, b, Cin, Cout)
    kk = kk.transpose(2, 3, 4, 0, 1, 5)  # (a, b, Cin, oy, ox, Cout)
    a, b, cin = kk.shape[:3]
    return kk.reshape(a, b, cin, 4 * kernel.shape[-1])


def up2_conv3(x: jax.Array, kernel: jax.Array,
              bias: jax.Array | None = None) -> jax.Array:
    """conv3x3_same(nearest_up2(x)) via one low-res 2x2 conv + d2s.

    x: (N, H, W, Cin); kernel: (3, 3, Cin, Cout) — the ORIGINAL full-res
    conv weights (checkpoint layout unchanged); bias: (Cout,) or None.
    Returns (N, 2H, 2W, Cout).
    """
    n, h, w, _ = x.shape
    cout = kernel.shape[-1]
    kk = _combined_kernel(kernel).astype(x.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    z = lax.conv_general_dilated(
        xp, kk, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype,
    )  # (n, h+1, w+1, 4*cout)
    z = z.reshape(n, h + 1, w + 1, 2, 2, cout)
    s00 = z[:, :h, :w, 0, 0]
    s01 = z[:, :h, 1:, 0, 1]
    s10 = z[:, 1:, :w, 1, 0]
    s11 = z[:, 1:, 1:, 1, 1]
    row0 = jnp.stack([s00, s01], axis=3)  # (n, h, w, ox, cout)
    row1 = jnp.stack([s10, s11], axis=3)
    y = jnp.stack([row0, row1], axis=2)  # (n, h, oy, w, ox, cout)
    y = y.reshape(n, 2 * h, 2 * w, cout)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def up2_conv3_reference(x: jax.Array, kernel: jax.Array,
                        bias: jax.Array | None = None) -> jax.Array:
    """Direct lowering (broadcast nearest-up2, then SAME 3x3 conv) — the
    parity oracle for tests and the `--stn_up_impl xla` path."""
    n, h, w, c = x.shape
    u = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    u = u.reshape(n, 2 * h, 2 * w, c)
    y = lax.conv_general_dilated(
        u, kernel.astype(u.dtype), window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=u.dtype,
    )
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
