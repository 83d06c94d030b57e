"""Spatial-transformer warp core: affine_grid, grid_sample, flow warps.

This is the TPU-native equivalent of the torch ops the reference's STNs are
built on (reference: models/stn/affine_stn.py and models/stn/unet_stn.py call
``torch.nn.functional.affine_grid`` / ``grid_sample`` — SURVEY.md §3.1/§3.3).

Semantics match torch exactly (parity-tested against the torch 2.13 CPU
oracle and the golden tables in SURVEY.md Appendix A):

  * grid has shape (N, Ho, Wo, 2); last dim is (x, y), normalized [-1, 1];
    x indexes width, y indexes height.
  * ``align_corners=False`` (torch's modern default):
        pix = ((norm + 1) * size - 1) / 2
    ``align_corners=True``:
        pix = (norm + 1) / 2 * (size - 1)
  * padding modes: 'zeros' (out-of-bounds taps contribute 0), 'border'
    (coordinates clipped to the edge), 'reflection'.
  * modes: 'bilinear', 'nearest'.

Layout is NHWC (XLA:TPU native). A thin NCHW wrapper is provided for parity
tests against torch.

The default implementation is pure-XLA (gather-based); it is fully
differentiable through JAX AD and its gradients reproduce torch's
grid_sample backward (scatter-add image gradient + analytic grid gradient)
— verified against SURVEY.md Appendix A.3. A Pallas TPU kernel for the
forward hot path lives in ``warp_pallas.py`` and is selected with
``impl='pallas'`` (or 'auto' on TPU).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Coordinate transforms
# ---------------------------------------------------------------------------


def _unnormalize(coord: jax.Array, size: int, align_corners: bool) -> jax.Array:
    """Map normalized [-1, 1] coords to pixel coords, torch convention."""
    size_f = jnp.asarray(size, coord.dtype)
    if align_corners:
        return (coord + 1.0) * 0.5 * (size_f - 1.0)
    return ((coord + 1.0) * size_f - 1.0) * 0.5


def _reflect(coord: jax.Array, twice_low: float, twice_high: float) -> jax.Array:
    """torch's reflect_coordinates: reflect into [twice_low/2, twice_high/2]."""
    if twice_low == twice_high:
        return jnp.zeros_like(coord)
    mn = twice_low / 2.0
    span = (twice_high - twice_low) / 2.0
    x = jnp.abs(coord - mn)
    # fmod into [0, 2*span), then fold.
    extra = jnp.mod(x, 2.0 * span)
    return mn + jnp.where(extra > span, 2.0 * span - extra, extra)


def _compute_source_coords(
    coord: jax.Array, size: int, align_corners: bool, padding_mode: str
) -> jax.Array:
    """Unnormalize and apply the padding-mode coordinate transform."""
    pix = _unnormalize(coord, size, align_corners)
    if padding_mode == "border":
        pix = jnp.clip(pix, 0.0, float(size - 1))
    elif padding_mode == "reflection":
        if align_corners:
            pix = _reflect(pix, 0.0, 2.0 * (size - 1))
        else:
            pix = _reflect(pix, -1.0, 2.0 * size - 1.0)
        pix = jnp.clip(pix, 0.0, float(size - 1))
    elif padding_mode != "zeros":
        raise ValueError(f"unknown padding_mode: {padding_mode!r}")
    return pix


# ---------------------------------------------------------------------------
# Grid construction
# ---------------------------------------------------------------------------


def _base_coords_1d(size: int, align_corners: bool, dtype=jnp.float32) -> jax.Array:
    """Normalized sample centers along one axis (torch affine_grid base).

    align_corners=False: (2i+1)/S - 1  e.g. S=4 -> [-0.75,-0.25,0.25,0.75]
    align_corners=True:  linspace(-1, 1, S)
    (verified against torch — SURVEY.md A.1)
    """
    if size == 1:
        # torch yields 0 for size-1 axes (ac=False) / -1 (ac=True edge case
        # matches linspace start); use torch's actual behavior: ac=True with
        # a single point gives -1? linspace(-1,1,1) == [-1]. ac=False gives 0.
        return jnp.zeros((1,), dtype) if not align_corners else jnp.full((1,), -1.0, dtype)
    if align_corners:
        return jnp.linspace(-1.0, 1.0, size, dtype=dtype)
    i = jnp.arange(size, dtype=dtype)
    return (2.0 * i + 1.0) / size - 1.0


def identity_grid(
    height: int, width: int, align_corners: bool = False, dtype=jnp.float32
) -> jax.Array:
    """(H, W, 2) identity sampling grid, last dim (x, y) normalized."""
    xs = _base_coords_1d(width, align_corners, dtype)
    ys = _base_coords_1d(height, align_corners, dtype)
    gx = jnp.broadcast_to(xs[None, :], (height, width))
    gy = jnp.broadcast_to(ys[:, None], (height, width))
    return jnp.stack([gx, gy], axis=-1)


def affine_grid(
    theta: jax.Array,
    size: Sequence[int],
    align_corners: bool = False,
) -> jax.Array:
    """torch.nn.functional.affine_grid equivalent.

    Args:
      theta: (N, 2, 3) affine matrices (row 0 produces x, row 1 produces y).
      size: output spatial size; accepts (N, C, H, W), (N, H, W) or (H, W).
      align_corners: torch semantics.

    Returns:
      (N, H, W, 2) grid, last dim (x, y) normalized, consumable by
      grid_sample.
    """
    theta = jnp.asarray(theta)
    if theta.ndim != 3 or theta.shape[-2:] != (2, 3):
        raise ValueError(f"theta must be (N, 2, 3), got {theta.shape}")
    if isinstance(size, int) or not hasattr(size, "__len__"):
        raise ValueError(
            f"size must be a sequence like (N, C, H, W), (N, H, W) or "
            f"(H, W); got {size!r} — e.g. affine_grid(theta, (n, c, h, w))")
    if len(size) == 4:
        _, _, h, w = size
    elif len(size) == 3:
        _, h, w = size
    elif len(size) == 2:
        h, w = size
    else:
        raise ValueError(f"bad size: {size}")
    base = identity_grid(h, w, align_corners, theta.dtype)  # (H, W, 2)
    # out[n, h, w, o] = theta[n, o, 0]*x + theta[n, o, 1]*y + theta[n, o, 2]
    # Explicit broadcast arithmetic (not einsum) so the TPU's default-bf16
    # matmul path never degrades grid coordinates.
    x = base[..., 0][None, :, :, None]  # (1, H, W, 1)
    y = base[..., 1][None, :, :, None]
    t = theta[:, None, None, :, :]  # (N, 1, 1, 2, 3)
    return t[..., 0] * x + t[..., 1] * y + t[..., 2]


# ---------------------------------------------------------------------------
# grid_sample (reference XLA implementation — differentiable)
# ---------------------------------------------------------------------------


def _gather_2d(img_flat: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather pixels: img_flat (N, H*W, C), idx (N, P) -> (N, P, C)."""
    return jnp.take_along_axis(img_flat, idx[:, :, None], axis=1)


def _grid_sample_xla(
    img: jax.Array,
    grid: jax.Array,
    mode: str,
    padding_mode: str,
    align_corners: bool,
) -> jax.Array:
    n, h, w, c = img.shape
    gn, gh, gw, gc = grid.shape
    if gc != 2 or gn != n:
        raise ValueError(f"bad grid shape {grid.shape} for image {img.shape}")

    x = _compute_source_coords(grid[..., 0], w, align_corners, padding_mode)
    y = _compute_source_coords(grid[..., 1], h, align_corners, padding_mode)
    x = x.reshape(n, gh * gw)
    y = y.reshape(n, gh * gw)
    img_flat = img.reshape(n, h * w, c)

    if mode == "nearest":
        # torch uses round-half-to-even (std::nearbyint); so does jnp.round.
        xi = jnp.round(x)
        yi = jnp.round(y)
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        vals = _gather_2d(img_flat, yi_c * w + xi_c)
        out = jnp.where(valid[..., None], vals, 0.0)
        return out.reshape(n, gh, gw, c)

    if mode != "bilinear":
        raise ValueError(f"unknown mode: {mode!r}")

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    out = jnp.zeros((n, gh * gw, c), img.dtype)
    for dy, dx, wgt in (
        (0, 0, (1.0 - wx) * (1.0 - wy)),
        (0, 1, wx * (1.0 - wy)),
        (1, 0, (1.0 - wx) * wy),
        (1, 1, wx * wy),
    ):
        cx = x0 + dx
        cy = y0 + dy
        valid = (cx >= 0) & (cx < w) & (cy >= 0) & (cy < h)
        cxi = jnp.clip(cx, 0, w - 1).astype(jnp.int32)
        cyi = jnp.clip(cy, 0, h - 1).astype(jnp.int32)
        vals = _gather_2d(img_flat, cyi * w + cxi)
        # Out-of-bounds taps contribute 0 ('zeros'); for border/reflection the
        # coords were already mapped in-bounds so valid is all-true.
        contrib = jnp.where(valid[..., None], vals, 0.0) * wgt[..., None].astype(img.dtype)
        out = out + contrib
    return out.reshape(n, gh, gw, c)


# ---------------------------------------------------------------------------
# One-hot matmul implementation — the TPU fast path.
#
# XLA's gather lowers to a serial per-element loop on TPU (measured ~150 ms
# for a single 64² warp on v5e — catastrophic). Bilinear sampling is instead
# expressed as two separable one-hot contractions that run on the MXU:
#
#   out[p, c] = Σ_h Σ_w Ay[p, h] · img[h, w, c] · Bx[p, w]
#
# where Ay/Bx each have ≤2 nonzeros per row (the bilinear taps, validity
# folded into the weights — the rectangle-bounds check factorizes per axis).
# Gradients are transposed matmuls (no scatter). Exact for arbitrary grids.
# ---------------------------------------------------------------------------


def _axis_taps(coord: jax.Array, size: int, mode: str):
    """Per-axis one-hot tap builder: returns (idx0, w0, idx1, w1).

    Out-of-bounds taps keep their raw (uncast) index so the iota comparison
    never matches -> contribution 0, which implements 'zeros' padding; for
    'border'/'reflection' the coords were already mapped in-bounds.
    """
    if mode == "nearest":
        i0 = jnp.round(coord)
        return i0, jnp.ones_like(coord), i0, jnp.zeros_like(coord)
    c0 = jnp.floor(coord)
    w1 = coord - c0
    return c0, 1.0 - w1, c0 + 1.0, w1


def _onehot_weights(coord: jax.Array, size: int, mode: str) -> jax.Array:
    """(..., size) sparse-as-dense tap weights along one axis."""
    i0, w0, i1, w1 = _axis_taps(coord, size, mode)
    iota = jnp.arange(size, dtype=coord.dtype)
    a = jnp.where(iota == i0[..., None], w0[..., None], 0.0)
    if mode != "nearest":
        a = a + jnp.where(iota == i1[..., None], w1[..., None], 0.0)
    return a


def _grid_sample_mm(
    img: jax.Array,
    grid: jax.Array,
    mode: str,
    padding_mode: str,
    align_corners: bool,
    tile_rows: int = 8,
) -> jax.Array:
    n, h, w, c = img.shape
    gn, gh, gw, gc = grid.shape
    if gc != 2 or gn != n:
        raise ValueError(f"bad grid shape {grid.shape} for image {img.shape}")
    x = _compute_source_coords(grid[..., 0], w, align_corners, padding_mode)
    y = _compute_source_coords(grid[..., 1], h, align_corners, padding_mode)
    return _mm_core(img, x, y, mode, tile_rows)


def _grid_sample_mm_pix(
    img_p: jax.Array, x_pix: jax.Array, y_pix: jax.Array, mode: str
) -> jax.Array:
    """mm path on already-transformed PIXEL coords, NCHW planes in/out
    (used as the Pallas kernel's exactness fallback branch)."""
    img = jnp.transpose(img_p, (0, 2, 3, 1))
    out = _mm_core(img, x_pix, y_pix, mode, 8)
    return jnp.transpose(out, (0, 3, 1, 2))


def _mm_core(
    img: jax.Array,
    x: jax.Array,
    y: jax.Array,
    mode: str,
    tile_rows: int = 8,
) -> jax.Array:
    n, h, w, c = img.shape
    gh, gw = x.shape[1], x.shape[2]

    # fp32 inputs want exact (fp32-accumulated) MXU passes; bf16 inputs take
    # the fast path.
    prec = (
        jax.lax.Precision.HIGHEST
        if img.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )

    tr = min(tile_rows, gh)
    pad = (-gh) % tr
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        y = jnp.pad(y, ((0, 0), (0, pad), (0, 0)))
    nt = (gh + pad) // tr
    xt = x.reshape(n, nt, tr * gw)
    yt = y.reshape(n, nt, tr * gw)

    # remat: without it, AD through the scan saves each tile's (P, W, C)
    # einsum intermediate -> O(H·W·W·C) residual memory (hundreds of GB at
    # 256²/batch); recomputing the one-hots in the backward is nearly free.
    @jax.checkpoint
    def tile(carry, t):
        xs = jax.lax.dynamic_index_in_dim(xt, t, axis=1, keepdims=False)
        ys = jax.lax.dynamic_index_in_dim(yt, t, axis=1, keepdims=False)
        ay = _onehot_weights(ys, h, mode).astype(img.dtype)  # (n, P, h)
        bx = _onehot_weights(xs, w, mode).astype(img.dtype)  # (n, P, w)
        tmp = jnp.einsum("nph,nhwc->npwc", ay, img, precision=prec)
        out = jnp.einsum("npwc,npw->npc", tmp, bx, precision=prec)
        return carry, out

    _, tiles = jax.lax.scan(tile, None, jnp.arange(nt))
    out = jnp.moveaxis(tiles, 0, 1).reshape(n, gh + pad, gw, c)
    return out[:, :gh].astype(img.dtype)


@functools.partial(
    jax.jit, static_argnames=("mode", "padding_mode", "align_corners", "impl",
                              "grad_channels", "shift_bound")
)
def grid_sample(
    img: jax.Array,
    grid: jax.Array,
    mode: str = "bilinear",
    padding_mode: str = "zeros",
    align_corners: bool = False,
    impl: str = "auto",
    grad_channels: int = -1,
    shift_bound: int = 8,
) -> jax.Array:
    """Sample `img` (N, H, W, C) at `grid` (N, Ho, Wo, 2) locations.

    torch.nn.functional.grid_sample semantics (see module docstring), NHWC.

    impl:
      'xla'    gather-based reference (fast on CPU; pathological on TPU —
               XLA lowers gather to a serial loop there),
      'mm'     one-hot matmul formulation (MXU; exact; fast on TPU),
      'pallas' Pallas TPU kernel,
      'shift'  Pallas kernel with the shift-gather forward armed (probe
               r4c: 2.38x fwd when every displacement fits `shift_bound`
               px — checked dynamically; falls back to the one-hot kernel,
               then mm, so results are exact for ANY grid),
      'auto'   pallas/mm on TPU, gather on CPU.
    """
    # Sampling coordinates must never round through bf16 (1 px of error at
    # the far edge of a 256-wide image); values may.
    if grid.dtype != jnp.float32:
        grid = grid.astype(jnp.float32)
    if impl == "auto":
        if jax.default_backend() == "tpu":
            impl = "pallas" if _pallas_available() else "mm"
        else:
            impl = "xla"
    if impl == "shift":
        impl = "pallas"
    else:
        shift_bound = 0
    if impl == "pallas":
        from nemar_tpu.ops import warp_pallas

        return warp_pallas.grid_sample_pallas(
            img, grid, mode=mode, padding_mode=padding_mode,
            align_corners=align_corners, grad_channels=grad_channels,
            shift_bound=shift_bound,
        )
    if impl == "mm":
        return _grid_sample_mm(img, grid, mode, padding_mode, align_corners)
    return _grid_sample_xla(img, grid, mode, padding_mode, align_corners)


@functools.cache
def _pallas_available() -> bool:
    try:
        if jax.default_backend() != "tpu":
            return False
        from nemar_tpu.ops import warp_pallas  # noqa: F401

        return warp_pallas.KERNEL_READY
    except Exception:  # pragma: no cover
        return False


def grid_sample_nchw(
    img: jax.Array,
    grid: jax.Array,
    mode: str = "bilinear",
    padding_mode: str = "zeros",
    align_corners: bool = False,
    impl: str = "xla",
) -> jax.Array:
    """NCHW wrapper (torch layout) — used by parity tests."""
    out = grid_sample(
        jnp.transpose(img, (0, 2, 3, 1)),
        grid,
        mode=mode,
        padding_mode=padding_mode,
        align_corners=align_corners,
        impl=impl,
    )
    return jnp.transpose(out, (0, 3, 1, 2))


# ---------------------------------------------------------------------------
# Displacement-field (flow) helpers — the deformable STN's vocabulary
# ---------------------------------------------------------------------------


def grid_sample_multi(
    imgs: Sequence[jax.Array],
    grid: jax.Array,
    mode: str = "bilinear",
    padding_mode: str = "zeros",
    align_corners: bool = False,
    impl: str = "auto",
    n_grad_imgs: int = -1,
):
    """Sample several images at the SAME grid in one call.

    Channel-concatenates, samples once, splits back: the per-pixel bilinear
    tap construction (the expensive part on TPU — one-hot builds dominate
    the MXU value contraction) is shared across all images instead of paid
    per image.

    n_grad_imgs >= 0: only the first n images need d/dimg (order the
    gradient-carrying images FIRST). The rest are stop-gradiented and the
    Pallas backward skips their scatter matmul; grid gradients are always
    complete.
    """
    gc = -1
    if 0 <= n_grad_imgs < len(imgs):
        gc = sum(img.shape[-1] for img in imgs[:n_grad_imgs])
        imgs = tuple(imgs[:n_grad_imgs]) + tuple(
            jax.lax.stop_gradient(img) for img in imgs[n_grad_imgs:])
    if len(imgs) == 1:
        return (grid_sample(imgs[0], grid, mode=mode, padding_mode=padding_mode,
                            align_corners=align_corners, impl=impl,
                            grad_channels=gc),)
    sizes = [img.shape[-1] for img in imgs]
    dt = imgs[0].dtype
    cat = jnp.concatenate([img.astype(dt) for img in imgs], axis=-1)
    out = grid_sample(cat, grid, mode=mode, padding_mode=padding_mode,
                      align_corners=align_corners, impl=impl, grad_channels=gc)
    splits = []
    acc = 0
    for s in sizes[:-1]:
        acc += s
        splits.append(acc)
    return tuple(jnp.split(out, splits, axis=-1))


def warp_with_flow(
    img: jax.Array,
    flow: jax.Array,
    align_corners: bool = False,
    padding_mode: str = "border",
    impl: str = "auto",
) -> jax.Array:
    """Warp `img` by a dense displacement field.

    flow: (N, H, W, 2) offsets in NORMALIZED grid units, added to the
    identity grid (reference: unet_stn adds the predicted offset field to
    the base sampling grid — SURVEY.md §3.1 'UNet/deformable STN').
    """
    n, h, w, _ = flow.shape
    grid = identity_grid(h, w, align_corners, flow.dtype)[None] + flow
    return grid_sample(
        img, grid, mode="bilinear", padding_mode=padding_mode,
        align_corners=align_corners, impl=impl,
    )


def compose_flows(
    flow_outer: jax.Array, flow_inner: jax.Array, align_corners: bool = False,
    impl: str = "auto",
) -> jax.Array:
    """Compose two displacement fields: result ≈ outer ∘ inner.

    Warping with the result is equivalent to warping by `flow_inner` first,
    then by `flow_outer` (deformation-field composition; reference north-star
    'deformation field composition').  result(p) = inner(p + outer(p)) + outer(p).
    """
    n, h, w, _ = flow_outer.shape
    # Sample the inner field at the locations the outer field points to.
    # impl='auto': the XLA gather path is a serial loop on TPU — the hot
    # multiscale-STN path must take the MXU formulations there.
    grid = identity_grid(h, w, align_corners, flow_outer.dtype)[None] + flow_outer
    inner_at = grid_sample(
        flow_inner, grid, mode="bilinear", padding_mode="border",
        align_corners=align_corners, impl=impl,
    )
    return flow_outer + inner_at
