"""Exact space-to-depth rewrite of the generators' 7x7 stride-1 convs.

Why. The ResnetGenerator's two `c7s1` convs (reference resnet generator's
first conv 3->ngf and final conv ngf->output_nc) are MXU-hostile under the
direct lowering at 256^2:

  * head (C64->3): 3 of 128 output lanes used -> measured ~3% MFU, 21 ms
    fwd+bwd at (32,256,256,64) — the single largest low-MFU block in the
    train step (it runs in BOTH G passes).
  * encoder (C3->64): forward is fine (contraction 147), but its
    backward-d/dinput is a transposed conv BACK to 3 channels — the same
    3-lane problem (and the step DOES consume d/dinput: G(warped_A)'s
    gradient flows into the STN through the warp).

The fix is algebraic, not a kernel: block the spatial dims by r=4
(space-to-depth), which turns the 7x7 conv into a 3x3 conv with
C_in' = 16*C_in and C_out' = 16*C_out and a sparse-but-static weight
rearrangement. For the head that is contraction 1024 -> 48 output lanes
(37.5% lane util instead of 2.3%); FLOPs grow (12/7)^2 = 2.94x but MXU
utilization grows ~16x. Every piece (s2d, conv, d2s, weight scatter) is
pure XLA, so autodiff yields the SAME rewrite for both backward convs.

Exactness: y[i,j] = sum_{dy,dx} W[dy,dx] x[i+dy, j+dx] is reindexed with
i = 4I+oy, i+dy = 4(I+bdy)+py; the blocked kernel entry
W'[bdy,bdx,(py,px,ci),(oy,ox,co)] = W[4bdy+py-oy, 4bdx+px-ox, ci, co]
(zero outside [0,7)) makes the blocked VALID conv equal the original for
every output pixel — verified to float32 roundoff against the direct
lowering in tests/test_conv_s2d.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_K = 7  # kernel size of the c7s1 convs
_R = 4  # spatial block factor
# block-kernel size: taps span oy+dy in [0, r-1+6] -> ceil((r+6)/r) blocks
_KB = (_R + _K - 1 + _R - 1) // _R  # = 3 for r=4, k=7


def _blocked_kernel(kernel: jax.Array) -> jax.Array:
    """(7,7,Cin,Cout) -> (KB,KB, R*R*Cin, R*R*Cout) blocked equivalent."""
    k, _, cin, cout = kernel.shape
    assert k == _K
    big = jnp.zeros((_R, _R, _KB * _R, _KB * _R, cin, cout), kernel.dtype)
    for oy in range(_R):
        for ox in range(_R):
            big = big.at[oy, ox, oy:oy + _K, ox:ox + _K].set(kernel)
    big = big.reshape(_R, _R, _KB, _R, _KB, _R, cin, cout)
    # -> (bdy, bdx, py, px, ci, oy, ox, co): input features flatten as
    # (py, px, ci) to match the s2d activation layout; outputs as (oy,ox,co)
    big = big.transpose(2, 4, 3, 5, 6, 0, 1, 7)
    return big.reshape(_KB, _KB, _R * _R * cin, _R * _R * cout)


def conv7_s2d_supported(shape) -> bool:
    """Input (N,H,W,C) is eligible: spatial dims divisible by the block."""
    return len(shape) == 4 and shape[1] % _R == 0 and shape[2] % _R == 0


def conv7_s2d(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """reflect_pad(3) + 7x7 VALID conv, computed via s2d(4) blocking.

    x: (N, H, W, Cin) with H, W divisible by 4; kernel: (7, 7, Cin, Cout).
    Returns (N, H, W, Cout), numerically identical (up to f32 roundoff /
    summation order) to the direct lowering at networks.py:154/226.
    """
    n, h, w, cin = x.shape
    cout = kernel.shape[-1]
    # reflect halo of 3, then zero-extend to a whole number of blocks
    # (H+6 -> H+8). The two extra rows/cols only ever meet zero entries of
    # the blocked kernel (max real tap row is H+5), so zeros are exact.
    xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
    xp = jnp.pad(xp, ((0, 0), (0, 2), (0, 2), (0, 0)))
    hb, wb = (h + 2 * _R) // _R, (w + 2 * _R) // _R
    z = xp.reshape(n, hb, _R, wb, _R, cin)
    z = z.transpose(0, 1, 3, 2, 4, 5).reshape(n, hb, wb, _R * _R * cin)
    wk = _blocked_kernel(kernel)
    y = lax.conv_general_dilated(
        z, wk, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=z.dtype,
    )  # (n, h/R, w/R, R*R*cout)
    y = y.reshape(n, h // _R, w // _R, _R, _R, cout)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(n, h, w, cout)
