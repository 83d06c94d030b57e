"""Round-3 probe R: STN decoder up_impl policy A/B (b32 256², grad).

r3p found the UnetSTN decoder at ~18 ms fwd+bwd vs a ~7 ms FLOP floor —
lane-starved k3 convs at out_ch 32 on 128/256² maps. r3m measured
up_impl='fused' (conv-then-d2s, 2.25x fewer MACs + 4x lanes) a WASH when
applied at ALL 5 levels; hypothesis: the deep levels (out 128-256 ch) are
already full-lane and only pay the d2s interleave, cancelling the shallow
levels' win. This probe A/Bs, same window, grad-of-predict_flow:

  xla          direct lowering (current default)
  fused        all 5 levels fused (r3m re-measure; now with the
               identity-resize elision in predict_flow)
  fused_small  NEW policy: fused only where 4*out_ch <= 128
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
    return a, b


def _chain_of(g, args):
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


def make_flow(up_impl):
    from nemar_tpu.models.stn.unet_stn import UnetSTN

    a, b = _data()
    stn = UnetSTN(in_channels=4, ngf=32, depth=5, up_impl=up_impl)
    p = stn.init(jax.random.key(0), a, b, ())
    p = jax.tree.map(
        lambda v: v.astype(bf) if v.dtype == jnp.float32 else v, p)

    def loss(pp):
        flow, reg = stn.apply(pp, a, b, method=UnetSTN.predict_flow)
        return (jnp.mean(jnp.abs(flow.astype(jnp.float32)))
                + reg.astype(jnp.float32))

    return _chain_of(jax.jit(jax.grad(loss)), (p,))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--variants", type=str, default="xla,fused,fused_small")
    args = ap.parse_args()

    log(f"backend: {jax.default_backend()}")
    chains = {}
    for v in args.variants.split(","):
        try:
            t0 = time.time()
            ch = make_flow(v)
            ch(1)
            log(f"{v}: compile+first {time.time() - t0:.1f}s")
            chains[v] = ch
        except Exception as e:
            log(f"{v} BUILD FAILED: {type(e).__name__}: {e}")

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
