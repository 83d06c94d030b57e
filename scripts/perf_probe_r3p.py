"""Round-3 probe P: where do the UnetSTN's ~28 non-warp ms go? (b32 256²)

Conv FLOPs say the UNet fwd+bwd should cost ~7 ms at 50% MFU; the block
measures ~36 ms incl. ~8 ms of warps. Dissect by subtraction, interleaved:

  full        UnetSTN apply incl. 2-img warp, grad wrt params (baseline)
  nowarp      predict_flow only, grad wrt params  -> full-nowarp = warp+grid
  noin        predict_flow with instance_norm_act monkeypatched to leaky
              relu only                           -> nowarp-noin = IN cost
  enc         encoder tower only (5 k3s2 convs + IN), grad
  f32grid     predict_flow but bf16 params (baseline keeps f32 grid math
              outside; this is just nowarp re-labeled sanity)
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


def _data():
    rng = np.random.default_rng(0)
    a = jnp.asarray(
        rng.standard_normal((B, H, W, 1), dtype=np.float32)).astype(bf)
    b = jnp.asarray(
        rng.standard_normal((B, H, W, 3), dtype=np.float32)).astype(bf)
    fake = jnp.asarray(
        rng.standard_normal((B, H, W, 3), dtype=np.float32)).astype(bf)
    return a, b, fake


def _chain_of(g, args, red_leaves=True):
    @jax.jit
    def red(o):
        return jnp.stack([x.astype(jnp.float32).mean()
                          for x in jax.tree.leaves(o)]).mean()

    def chain(steps):
        o = None
        t0 = time.time()
        for _ in range(steps):
            o = g(*args)
        float(red(o))
        return (time.time() - t0) / steps * 1e3

    return chain


def make_full():
    from nemar_tpu.models.stn.unet_stn import UnetSTN

    a, b, fake = _data()
    stn = UnetSTN(in_channels=4, ngf=32, depth=5, warp_impl="pallas")
    p = stn.init(jax.random.key(0), a, b, (fake, a))
    p = jax.tree.map(
        lambda v: v.astype(bf) if v.dtype == jnp.float32 else v, p)

    def loss(pp):
        (wf, wa), reg, aux = stn.apply(pp, a, b, (fake, a), n_grad_imgs=1)
        return (jnp.mean(jnp.abs(wf.astype(jnp.float32)))
                + jnp.mean(jnp.abs(wa.astype(jnp.float32)))
                + reg.astype(jnp.float32))

    return _chain_of(jax.jit(jax.grad(loss)), (p,))


def make_flow(patch_in=False):
    from nemar_tpu.models.stn import unet_stn as U

    a, b, _ = _data()
    stn = U.UnetSTN(in_channels=4, ngf=32, depth=5)
    if patch_in:
        orig = U.instance_norm_act

        U.instance_norm_act = lambda h, act="leaky_relu", **kw: jnp.where(
            h > 0, h, 0.2 * h)
    p = stn.init(jax.random.key(0), a, b, ())
    if patch_in:
        U.instance_norm_act = orig
    p = jax.tree.map(
        lambda v: v.astype(bf) if v.dtype == jnp.float32 else v, p)

    def loss(pp):
        if patch_in:
            orig2 = U.instance_norm_act
            U.instance_norm_act = lambda h, act="leaky_relu", **kw: (
                jnp.where(h > 0, h, 0.2 * h))
            try:
                flow, reg = stn.apply(pp, a, b, method=U.UnetSTN.predict_flow)
            finally:
                U.instance_norm_act = orig2
        else:
            flow, reg = stn.apply(pp, a, b, method=U.UnetSTN.predict_flow)
        return (jnp.mean(jnp.abs(flow.astype(jnp.float32)))
                + reg.astype(jnp.float32))

    return _chain_of(jax.jit(jax.grad(loss)), (p,))


def make_enc():
    import flax.linen as nn

    from nemar_tpu.ops.norm import instance_norm_act

    a, b, _ = _data()
    x = jnp.concatenate([a, b], axis=-1)

    class Enc(nn.Module):
        @nn.compact
        def __call__(self, h):
            for i, ch in enumerate([32, 64, 128, 256, 256]):
                h = nn.Conv(ch, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)))(h)
                h = instance_norm_act(h, act="leaky_relu")
            return h

    enc = Enc()
    p = enc.init(jax.random.key(0), x)
    p = jax.tree.map(
        lambda v: v.astype(bf) if v.dtype == jnp.float32 else v, p)

    def loss(pp):
        return enc.apply(pp, x).astype(jnp.float32).mean()

    return _chain_of(jax.jit(jax.grad(loss)), (p,))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", type=str, default="")
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--steps", type=int, default=32)
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    log(f"backend: {jax.default_backend()}")
    builders = {
        "full": make_full,
        "nowarp": lambda: make_flow(False),
        "noin": lambda: make_flow(True),
        "enc": make_enc,
    }
    chains = {}
    for name, mk in builders.items():
        if only and name not in only:
            continue
        try:
            t0 = time.time()
            ch = mk()
            ch(1)
            log(f"{name}: compile+first {time.time() - t0:.1f}s")
            chains[name] = ch
        except Exception as e:
            log(f"{name} BUILD FAILED: {type(e).__name__}: {e}")

    best = {k: float("inf") for k in chains}
    for r in range(args.rounds):
        for name, ch in chains.items():
            try:
                dt = ch(args.steps)
            except Exception as e:
                log(f"round {r} {name} FAILED: {type(e).__name__}")
                continue
            best[name] = min(best[name], dt)
            log(f"round {r} {name}: {dt:.2f} ms (best {best[name]:.2f})")
    print(json.dumps({k: (round(v, 2) if v < float("inf") else None)
                      for k, v in best.items()}))


if __name__ == "__main__":
    main()
