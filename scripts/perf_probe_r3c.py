"""Round-3 probe C: resolve the warp-cost contradiction.

r3a/b: standalone grid_sample fwd+bwd at (32,256,256,4) = 153 ms (pallas,
ANY flow) yet the whole STN probe (UNet fwd+bwd + two warps) = 48 ms.
Either the STN path avoids the warp backward cost somehow, or one of the
measurements lies. Surgical variants:

  stn        r3a's stn probe (grad wrt R params; warped imgs constant)
  stn_nowarp same with an EMPTY warp list (isolates UNet cost)
  wgrid      grid_sample fwd+bwd, grad wrt GRID only (img constant)
  wimg       grid_sample fwd+bwd, grad wrt IMG only
  wboth      grad wrt both (r3b's warpb)
  wcore      pallas _warp_core fwd+bwd direct (no cond wrapper), both grads
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from nemar_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


B, H, W = 32, 256, 256
bf = jnp.bfloat16


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--trials", type=int, default=4)
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()

    log(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((B, H, W, 1), dtype=np.float32))
    b = jnp.asarray(rng.standard_normal((B, H, W, 3), dtype=np.float32))
    fake = jnp.asarray(rng.standard_normal((B, H, W, 3), dtype=np.float32))
    img4 = jnp.asarray(
        rng.standard_normal((B, H, W, 4), dtype=np.float32)).astype(bf)

    from nemar_tpu.ops.warp import grid_sample, identity_grid

    base = identity_grid(H, W, False, jnp.float32)[None]
    flow = jnp.asarray(np.clip(
        0.03 * rng.standard_normal((B, H, W, 2), dtype=np.float32),
        -0.05, 0.05))
    grid = (base + flow).astype(jnp.float32)

    variants = {}

    # ---- STN variants ----
    from types import SimpleNamespace

    from nemar_tpu.models.stn import define_stn

    opt = SimpleNamespace(input_nc=1, output_nc=3, stn_ngf=32, stn_depth=5,
                          stn_field_source="pair")
    stn = define_stn(opt, "unet")

    def stn_variant(imgs_builder):
        p0 = stn.init(jax.random.key(0), a, b, imgs_builder())

        @jax.jit
        def f(p):
            def loss(p):
                cp = jax.tree.map(lambda x: x.astype(bf), p)
                warped, reg, aux = stn.apply(
                    cp, a.astype(bf), b.astype(bf),
                    tuple(x.astype(bf) for x in imgs_builder()))
                s = reg.astype(jnp.float32) + jnp.mean(
                    jnp.square(aux["flow"].astype(jnp.float32)))
                for wimg in warped:
                    s = s + jnp.mean(jnp.abs(wimg.astype(jnp.float32)))
                return s

            g = jax.grad(loss)(p)
            return jax.tree.map(lambda x, y: x - 1e-9 * y, p, g)

        st = {"p": p0}
        return lambda: (st.update(p=f(st["p"])),
                        jax.tree.leaves(st["p"])[0])[1]

    variants["stn"] = stn_variant(lambda: (fake, a))
    variants["stn_nowarp"] = stn_variant(lambda: ())

    # ---- grid_sample grad-subset variants ----
    def loss_of(img, g_):
        return jnp.mean(jnp.abs(grid_sample(
            img, g_, impl="pallas").astype(jnp.float32)))

    @jax.jit
    def f_wgrid(flow):
        gf = jax.grad(lambda fl: loss_of(img4, (base + fl).astype(jnp.float32)))(flow)
        return flow - 1e-9 * gf

    st_g = {"f": flow}
    variants["wgrid"] = lambda: (st_g.update(f=f_wgrid(st_g["f"])), st_g["f"])[1]

    @jax.jit
    def f_wimg(img):
        gi = jax.grad(lambda im: loss_of(im, grid))(img)
        return img - 1e-9 * gi.astype(img.dtype)

    st_i = {"i": img4}
    variants["wimg"] = lambda: (st_i.update(i=f_wimg(st_i["i"])), st_i["i"])[1]

    @jax.jit
    def f_wboth(img, flow):
        gi, gf = jax.grad(
            lambda im, fl: loss_of(im, (base + fl).astype(jnp.float32)),
            argnums=(0, 1))(img, flow)
        return img - 1e-9 * gi.astype(img.dtype), flow - 1e-9 * gf

    st_b = {"i": img4, "f": flow}

    def run_wboth():
        i, fl = f_wboth(st_b["i"], st_b["f"])
        st_b.update(i=i, f=fl)
        return fl

    variants["wboth"] = run_wboth

    # ---- raw _warp_core (no cond wrapper) ----
    from nemar_tpu.ops import warp as warp_mod
    from nemar_tpu.ops.warp_pallas import _warp_core

    n, h, w_, c = B, H, W, 4
    s_slab = 48

    @jax.jit
    def f_wcore(img, flow):
        def loss(im, fl):
            g_ = (base + fl).astype(jnp.float32)
            x_pix = warp_mod._compute_source_coords(g_[..., 0], W, False, "zeros")
            y_pix = warp_mod._compute_source_coords(g_[..., 1], H, False, "zeros")
            img_p = jnp.transpose(im, (0, 3, 1, 2)).astype(jnp.float32)
            xr = x_pix.reshape(n, 32, 1, 8 * W)
            yr = y_pix.reshape(n, 32, 1, 8 * W)
            out = _warp_core(img_p, xr, yr, s_slab, True)
            return jnp.mean(jnp.abs(out))

        gi, gf = jax.grad(loss, argnums=(0, 1))(img, flow)
        return img - 1e-9 * gi.astype(img.dtype), flow - 1e-9 * gf

    st_c = {"i": img4, "f": flow}

    def run_wcore():
        i, fl = f_wcore(st_c["i"], st_c["f"])
        st_c.update(i=i, f=fl)
        return fl

    variants["wcore"] = run_wcore

    if args.only:
        keep = args.only.split(",")
        variants = {k: v for k, v in variants.items() if k in keep}

    for name, fn in variants.items():
        t0 = time.time()
        out = fn()
        np.asarray(jax.tree.leaves(out)[0].astype(jnp.float32)).ravel()[:1]
        log(f"compile {name}: {time.time() - t0:.1f}s")

    K = args.steps
    best = {k: float("inf") for k in variants}
    for trial in range(args.trials):
        for name, fn in variants.items():
            t0 = time.time()
            for _ in range(K):
                out = fn()
            np.asarray(jax.tree.leaves(out)[0].astype(jnp.float32)).ravel()[:1]
            dt = (time.time() - t0) / K
            best[name] = min(best[name], dt)
            log(f"trial {trial} {name}: {dt * 1e3:.1f} ms/step")

    print(json.dumps({k: round(v * 1e3, 2) for k, v in best.items()}))


if __name__ == "__main__":
    main()
