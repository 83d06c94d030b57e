"""256² direct-photometric-fit diagnosis (round-3).

The in-model 256² UNet run stalls at ~40% field magnitude (EPE 9.08 vs
identity 9.35, /tmp/science_final_r256.jsonl) even with order-2 TV and a
freeze-G refinement phase. The 64² story: the DIRECT fit (no G/GAN,
same-appearance pair, per-sample affines) converges sub-pixel, so failures
in-model are G-race dynamics. At 256² the direct fit was NEVER run — this
script runs it for the exact 256²-recipe STN configuration and ablations,
separating "R cannot optimize a 10 px warp at 256²" (fix the STN/recipe)
from "the G race eats the signal" (fix the schedule).

Each variant: batch of 8 multi-octave scenes, per-sample random affines
(|t| <= 10 px, |angle| <= 0.05 rad), direct L1(warp(A), B) + lambda*TV fit
with Adam(1e-3, b1 .9), EPE vs the known GT flow every 100 steps.

Usage: [SCIENCE_TPU=1] python scripts/science_256_direct.py [steps]
Appends docs/science/science_256_direct.jsonl
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if not int(os.environ.get("SCIENCE_TPU", "0")):
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    import jax

    jax.config.update("jax_platforms", "cpu")

from nemar_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np
import optax

RES = 256
N = 8


def _scene(rng, res):
    from PIL import Image

    f = np.zeros((res, res), np.float32)
    for scale, w in ((16, 0.5), (6, 0.3), (3, 0.2)):
        s = max(2, res // scale)
        o = rng.standard_normal((s, s)).astype(np.float32)
        f += w * np.asarray(
            Image.fromarray(o, mode="F").resize((res, res), Image.BICUBIC))
    lo, hi = f.min(), f.max()
    return (f - lo) / max(hi - lo, 1e-6)


def make_task(seed=0):
    from nemar_tpu.ops.warp import grid_sample, identity_grid
    from nemar_tpu.utils import metrics as M

    rng = np.random.default_rng(seed)
    b_img = np.stack([_scene(rng, RES)[:, :, None] * 2 - 1
                      for _ in range(N)])
    gts, grids = [], []
    for i in range(N):
        ang = rng.uniform(-0.05, 0.05)
        # theta convention: center-origin PIXEL map (metrics.py docstring)
        tx, ty = rng.uniform(-10, 10, 2)
        ca, sa = np.cos(ang), np.sin(ang)
        theta = np.asarray([[ca, -sa, tx], [sa, ca, ty]], np.float32)
        gt = M.registration_gt_flow(theta, RES, RES)
        gts.append(gt)
        grids.append(identity_grid(RES, RES, False, jnp.float32)
                     - jnp.asarray(gt))
    a_img = np.asarray(grid_sample(
        jnp.asarray(b_img), jnp.stack(grids), padding_mode="border"))
    return jnp.asarray(a_img), jnp.asarray(b_img), np.stack(gts)


VARIANTS = {
    # the exact 256²-recipe STN (science_final.py res>=256 branch).
    # CPU probe result (step 100): DIVERGES — flow 92 px, EPE 134 vs
    # identity 3.1. The 256² failure is R-side optimization, NOT the
    # G race: the composed d6 multiscale heads blow up even in a pure
    # photometric fit.
    "recipe_d6": dict(ngf=16, depth=6, multiscale=True, level_scale=0.12,
                      smooth_order=2, lam=0.4),
    # ablations
    "ls25": dict(ngf=16, depth=6, multiscale=True, level_scale=0.25,
                 smooth_order=2, lam=0.4),
    "d5": dict(ngf=16, depth=5, multiscale=True, level_scale=0.25,
               smooth_order=2, lam=0.4),
    "lam0": dict(ngf=16, depth=6, multiscale=True, level_scale=0.12,
                 smooth_order=2, lam=0.0),
    "ngf32": dict(ngf=32, depth=6, multiscale=True, level_scale=0.25,
                  smooth_order=2, lam=0.4),
    # stabilizers for the observed divergence
    "bounded": dict(ngf=16, depth=6, multiscale=True, level_scale=0.25,
                    smooth_order=2, lam=0.4, bounded_flow=0.15),
    "lr3e4": dict(ngf=16, depth=6, multiscale=True, level_scale=0.12,
                  smooth_order=2, lam=0.4, lr=3e-4),
    "single_head": dict(ngf=16, depth=6, multiscale=False,
                        smooth_order=2, lam=0.4),
    # structural fix: no heads below 32² (drop the drift-prone 4²/8²/16²)
    "minres32": dict(ngf=16, depth=6, multiscale=True, level_scale=0.25,
                     smooth_order=2, lam=0.4, head_min_res=32),
}


def run(name, cfg, steps, a, b, gts, fout):
    from nemar_tpu.models.stn.unet_stn import UnetSTN
    from nemar_tpu.utils import metrics as M

    lam = cfg.pop("lam")
    lr = cfg.pop("lr", 1e-3)
    stn = UnetSTN(in_channels=2, **cfg)
    params = stn.init(jax.random.key(0), a, b, (a,))
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(lr, b1=0.9))
    ost = tx.init(params)

    def loss_fn(p):
        (wa,), reg, aux = stn.apply(p, a, b, (a,))
        return jnp.mean(jnp.abs(wa - b)) + lam * reg, aux

    vg = jax.value_and_grad(loss_fn, has_aux=True)

    @jax.jit
    def step(p, o):
        (l, aux), g = vg(p)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, l, aux["flow"]

    epe0 = float(np.mean([M.epe_px(np.zeros_like(g), g, RES, RES)
                          for g in gts]))
    t0 = time.time()
    flow = None
    for it in range(1, steps + 1):
        params, ost, loss, flow = step(params, ost)
        if it % 100 == 0 or it == steps:
            fl = np.asarray(flow)
            epe = float(np.mean([M.epe_px(fl[j], gts[j], RES, RES)
                                 for j in range(N)]))
            rec = {"variant": name, "step": it, "epe": round(epe, 3),
                   "epe0": round(epe0, 3),
                   "flow_px": round(float(np.mean(np.abs(fl))) * RES / 2, 3),
                   "loss": round(float(loss), 4),
                   "min": round((time.time() - t0) / 60, 1)}
            print(rec, flush=True)
            fout.write(json.dumps(rec) + "\n")
            fout.flush()
    return


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 1200
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    a, b, gts = make_task()
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs/science/science_256_direct.jsonl")
    fout = open(out, "a")
    for name, cfg in VARIANTS.items():
        if only and name not in only:
            continue
        run(name, dict(cfg), steps, a, b, gts, fout)
    fout.close()


if __name__ == "__main__":
    main()
