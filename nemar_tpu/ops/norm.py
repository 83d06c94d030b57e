"""Instance normalization — XLA reference + fused Pallas IN+activation kernel.

The reference's generator/discriminator/STN all use torch ``InstanceNorm2d``
with the CycleGAN-template configuration: ``affine=False``,
``track_running_stats=False``, ``eps=1e-5`` (SURVEY.md §A.4, verified against
the torch oracle) — i.e. per-(sample, channel):

    y = (x - mean) / sqrt(biased_var + eps)

with the BIASED variance (divide by N, not N-1).

Layout here is NHWC; the reduction is over the spatial axes (1, 2).

``instance_norm_act`` optionally fuses the following activation (ReLU /
LeakyReLU) — the "fused instance-norm+ReLU" north-star kernel
(BASELINE.json). The Pallas path does stats + normalize + activation in two
VMEM-resident passes without materializing intermediates in HBM.

STATUS (round 3, VERDICT r2 item 7): the STANDALONE Pallas kernel here
measures ~2x XLA's IN lowering in isolation but LOSES inside the full
train step (298 vs 260 ms at b32 256² — it breaks XLA's conv+IN+act
fusion boundaries, ROADMAP round-2), so the production default stays
``impl='xla'`` and ``--norm_impl pallas`` remains a tested option. The
fusion idea ships where it actually wins: ``ops/conv_fused.py`` fuses the
SAME IN+act math as the epilogue of the ResNet-block conv kernel
(--block_impl pallas), measured 66% vs 55% MFU on the trunk fwd+bwd.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Per-(sample, channel) normalization over spatial dims, NHWC, no affine."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=(1, 2), keepdims=True)  # biased
    return (x - mean) * jax.lax.rsqrt(var + eps)


def _apply_act(y: jax.Array, act: str, negative_slope: float) -> jax.Array:
    if act == "none":
        return y
    if act == "relu":
        return jnp.maximum(y, 0.0)
    if act == "leaky_relu":
        return jnp.where(y >= 0.0, y, negative_slope * y)
    raise ValueError(f"unknown act: {act!r}")


@functools.partial(
    jax.jit, static_argnames=("act", "eps", "negative_slope", "impl")
)
def instance_norm_act(
    x: jax.Array,
    act: str = "relu",
    eps: float = 1e-5,
    negative_slope: float = 0.2,
    impl: str = "xla",
) -> jax.Array:
    """Fused instance-norm + activation.

    impl: 'xla' | 'pallas' | 'auto' (pallas on TPU — the fused kernel
    measured ~2x the XLA lowering on v5e). The pallas path carries a custom
    VJP (analytic IN backward), so it trains.
    """
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        return _in_act_pallas_vjp(x, act, eps, negative_slope)
    return _apply_act(instance_norm(x, eps), act, negative_slope)


# custom VJP wrapper: pallas forward, analytic backward (plain XLA).
@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _in_act_pallas_vjp(x, act, eps, negative_slope):
    return _instance_norm_act_pallas(x, act, eps, negative_slope)


def _in_act_vjp_fwd(x, act, eps, negative_slope):
    return _instance_norm_act_pallas(x, act, eps, negative_slope), x


def _in_act_vjp_bwd(act, eps, negative_slope, x, g):
    """d/dx of act((x-μ)·rstd) with per-(n,c) spatial stats:

        dx = rstd · (ĝ − mean(ĝ) − ŷ · mean(ĝ·ŷ)),   ĝ = g ⊙ act'(ŷ)
    """
    xf = x.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    y = (xf - mean) * rstd
    if act == "relu":
        gf = gf * (y > 0)
    elif act == "leaky_relu":
        gf = gf * jnp.where(y >= 0, 1.0, negative_slope)
    dx = rstd * (
        gf
        - jnp.mean(gf, axis=(1, 2), keepdims=True)
        - y * jnp.mean(gf * y, axis=(1, 2), keepdims=True)
    )
    return (dx.astype(x.dtype),)


_in_act_pallas_vjp.defvjp(_in_act_vjp_fwd, _in_act_vjp_bwd)


# ---------------------------------------------------------------------------
# Pallas fused kernel
# ---------------------------------------------------------------------------
#
# Strategy: view x as (N, H*W, C). Grid is (N, K) over row-chunks of H*W.
# Pass 1 accumulates per-channel sum / sum-of-squares into a VMEM scratch
# that persists across the K chunks of one sample; the LAST chunk finalizes
# mean/rsqrt into scratch. Because output blocks stream back to HBM while
# the grid advances, normalization needs a second visit of the data: we use
# a (N, 2, K) grid where phase 0 accumulates stats and phase 1 normalizes
# and applies the activation. Chunks stay VMEM-sized regardless of H*W.


def _in_act_kernel(x_ref, o_ref, stats_ref, *, nk, act, eps, negative_slope, rows_total):
    phase = pl.program_id(1)
    k = pl.program_id(2)
    # stats accumulate in fp32 whatever the activation dtype (bf16 sums over
    # 64K rows would lose everything past ~256 terms)
    x2d = x_ref[0].astype(jnp.float32)

    @pl.when(jnp.logical_and(phase == 0, k == 0))
    def _init():
        stats_ref[...] = jnp.zeros_like(stats_ref)

    @pl.when(phase == 0)
    def _accum():
        s = jnp.sum(x2d, axis=0)
        s2 = jnp.sum(x2d * x2d, axis=0)
        stats_ref[0, :] += s
        stats_ref[1, :] += s2

    @pl.when(jnp.logical_and(phase == 0, k == nk - 1))
    def _finalize():
        cnt = jnp.asarray(rows_total, jnp.float32)
        mean = stats_ref[0, :] / cnt
        var = stats_ref[1, :] / cnt - mean * mean
        stats_ref[0, :] = mean
        stats_ref[1, :] = jax.lax.rsqrt(var + eps)

    @pl.when(phase == 1)
    def _normalize():
        mean = stats_ref[0, :][None, :]
        rstd = stats_ref[1, :][None, :]
        y = (x2d - mean) * rstd
        if act == "relu":
            y = jnp.maximum(y, 0.0)
        elif act == "leaky_relu":
            y = jnp.where(y >= 0.0, y, negative_slope * y)
        o_ref[...] = y[None].astype(o_ref.dtype)


def _instance_norm_act_pallas(
    x: jax.Array, act: str, eps: float, negative_slope: float
) -> jax.Array:
    n, h, w, c = x.shape
    rows = h * w
    x3 = x.reshape(n, rows, c)
    # Chunk rows so a block is ~<= 1 MB of VMEM (in + out + fp32 upcast +
    # double buffering must stay under the 16 MB scoped limit); chunks must
    # be sublane multiples (Mosaic block constraint).
    target_rows = max(8, min(rows, (1024 * 1024) // max(1, c * x.dtype.itemsize)))
    target_rows = max(8, (target_rows // 8) * 8)
    nk = pl.cdiv(rows, target_rows)
    pad_rows = nk * target_rows - rows
    if pad_rows:
        # Zero rows contribute nothing to the sums and the count stays the
        # TRUE row count, so stats are exact; padded output rows are sliced
        # off below.
        x3 = jnp.pad(x3, ((0, 0), (0, pad_rows), (0, 0)))

    kernel = functools.partial(
        _in_act_kernel,
        nk=nk,
        act=act,
        eps=eps,
        negative_slope=negative_slope,
        rows_total=rows,
    )
    out = pl.pallas_call(
        kernel,
        # Mosaic targets TPU; on CPU (tests) run the interpreter.
        interpret=jax.default_backend() != "tpu",
        grid=(n, 2, nk),
        in_specs=[
            pl.BlockSpec(
                (1, target_rows, c),
                lambda i, p, k: (i, k, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, target_rows, c), lambda i, p, k: (i, k, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, nk * target_rows, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((2, c), jnp.float32)],
    )(x3)
    return out[:, :rows].reshape(n, h, w, c)
