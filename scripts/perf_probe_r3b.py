"""Round-3 probe B: where do G's NON-trunk ~90 ms/step go?

r3a: two G passes = 193 ms of the 262 ms step; XLA trunk fwd+bwd = 52 ms
(55% MFU), fused kernel 43 ms (66%). The other ~45 ms per G pass is
encoder (c7s1-64, d128, d256), decoder (u128, u64, c7s1-3+tanh) — ~1.1
TFLOP fwd+bwd at b32 → implies ~12% MFU. This probe isolates them, plus
resolves the r3a warp-variant anomaly (standalone warp 167-299 ms vs 48 ms
for the whole STN: which path actually runs?).

Variants: enc, dec, enc_dec (both), warp0 (zero flow), warpb (bounded),
warp_mm (explicit mm), warp_fwd (fwd only, bounded).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from nemar_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def log(m):
    print(m, file=sys.stderr, flush=True)


B, H, W = 32, 256, 256
bf = jnp.bfloat16


class Enc(nn.Module):
    @nn.compact
    def __call__(self, x):
        from nemar_tpu.models.networks import _norm_act, reflect_pad

        h = reflect_pad(x, 3)
        h = nn.Conv(64, (7, 7), padding="VALID")(h)
        h = _norm_act(h, "instance", "relu")
        for mult in (1, 2):
            h = nn.Conv(64 * mult * 2, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))(h)
            h = _norm_act(h, "instance", "relu")
        return h


class Dec(nn.Module):
    @nn.compact
    def __call__(self, h):
        from nemar_tpu.models.networks import _norm_act, reflect_pad

        for mult in (4, 2):
            h = nn.ConvTranspose(64 * mult // 2, (3, 3), strides=(2, 2),
                                 padding="SAME")(h)
            h = _norm_act(h, "instance", "relu")
        h = reflect_pad(h, 3)
        h = nn.Conv(3, (7, 7), padding="VALID")(h)
        return jnp.tanh(h)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--trials", type=int, default=4)
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()

    log(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((B, H, W, 1), dtype=np.float32))
    h64 = jnp.asarray(rng.standard_normal((B, 64, 64, 256), dtype=np.float32))

    variants = {}

    def fb_variant(mod, x0):
        p = mod.init(jax.random.key(0), x0.astype(jnp.float32))

        @jax.jit
        def f(p, x):
            def loss(p):
                return jnp.mean(mod.apply(
                    jax.tree.map(lambda v: v.astype(bf), p),
                    x.astype(bf)).astype(jnp.float32))

            g = jax.grad(loss)(p)
            return jax.tree.map(lambda v, u: v - 1e-9 * u, p, g)

        st = {"p": p}
        return lambda: (st.update(p=f(st["p"], x0)),
                        jax.tree.leaves(st["p"])[0])[1]

    variants["enc"] = fb_variant(Enc(), a)
    variants["dec"] = fb_variant(Dec(), h64)

    class EncDec(nn.Module):
        @nn.compact
        def __call__(self, x):
            return Dec()(Enc()(x))

    variants["enc_dec"] = fb_variant(EncDec(), a)

    # ---- warp path A/B ----
    from nemar_tpu.ops.warp import grid_sample, identity_grid

    img4 = jnp.asarray(
        rng.standard_normal((B, H, W, 4), dtype=np.float32)).astype(bf)
    base = identity_grid(H, W, False, jnp.float32)[None]
    flow_b = jnp.asarray(np.clip(
        0.03 * rng.standard_normal((B, H, W, 2), dtype=np.float32),
        -0.05, 0.05))
    flow_0 = jnp.zeros_like(flow_b)

    def warp_fb(impl):
        @jax.jit
        def f(img, flow):
            def loss(img, flow):
                return jnp.mean(jnp.abs(grid_sample(
                    img, (base + flow).astype(jnp.float32), impl=impl,
                ).astype(jnp.float32)))

            gi, gf = jax.grad(loss, argnums=(0, 1))(img, flow)
            return img - 1e-9 * gi.astype(img.dtype), flow - 1e-9 * gf

        return f

    fp = warp_fb("pallas")
    fm = warp_fb("mm")
    s0 = {"i": img4, "f": flow_0}
    sb = {"i": img4, "f": flow_b}
    sm = {"i": img4, "f": flow_b}

    def mk(state, f):
        def run():
            i, fl = f(state["i"], state["f"])
            state.update(i=i, f=fl)
            return fl

        return run

    variants["warp0"] = mk(s0, fp)
    variants["warpb"] = mk(sb, fp)
    variants["warp_mm"] = mk(sm, fm)

    @jax.jit
    def warp_fwd(img, flow):
        return jnp.mean(jnp.abs(grid_sample(
            img, (base + flow).astype(jnp.float32), impl="pallas",
        ).astype(jnp.float32)))

    variants["warp_fwd"] = lambda: warp_fwd(img4, flow_b)

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
