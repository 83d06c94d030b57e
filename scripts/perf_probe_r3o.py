"""Round-3 probe O: b48 trunk decision (same-window) + optimizer cost.

r3n measured b48 pallas+auto at 338.5 ms vs r3m's b48 xla+auto 347.8 ms —
DIFFERENT windows, so the ~9 ms trunk win at b48 needs one same-window
A/B before the bench ladder leads with it. Also times the Adam update in
isolation (r2c attributed ~6 ms): the param tree is ~100 small leaves, so
the update may be launch-bound — if it really costs ~6 ms, a flattened
single-kernel Adam is a ~2% step win.

  step48_xa   b48 xla trunk + c7 auto
  step48_pa   b48 pallas trunk + c7 auto
  adam_only   one optax adam+clip update on the nemar param tree (G+D+R)
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


H = W = 256


def make_step(batch: int, block_impl: str, c7: str):
    from nemar_tpu.models import create_model
    from nemar_tpu.options import TrainOptions

    args = [
        "--dataroot", "__synthetic__", "--name", "__probe__",
        "--model", "nemar", "--dataset_mode", "synthetic",
        "--checkpoints_dir", "/tmp/__probe__",
        "--crop_size", "256", "--load_size", "256",
        "--batch_size", str(batch),
        "--netG", "resnet_6blocks", "--stn_type", "unet",
        "--gan_mode", "lsgan", "--pool_size", "0", "--bf16",
        "--block_impl", block_impl, "--c7_impl", c7,
    ]
    old = sys.stdout
    sys.stdout = sys.stderr
    try:
        opt = TrainOptions().parse(args)
        model = create_model(opt)
        model.setup(opt)
    finally:
        sys.stdout = old
    rng = np.random.default_rng(0)
    b = {
        "A": rng.standard_normal((batch, H, W, opt.input_nc),
                                 dtype=np.float32),
        "B": rng.standard_normal((batch, H, W, opt.output_nc),
                                 dtype=np.float32),
        "A_paths": ["x"] * batch,
    }
    model.set_input(b)

    def chain(steps):
        t0 = time.time()
        for _ in range(steps):
            model.optimize_parameters()
        float(model.get_current_losses()["G"])
        return (time.time() - t0) / steps * 1e3

    return chain


def make_adam():
    import optax

    from nemar_tpu.models import create_model
    from nemar_tpu.options import TrainOptions

    old = sys.stdout
    sys.stdout = sys.stderr
    try:
        opt = TrainOptions().parse([
            "--dataroot", "__synthetic__", "--name", "__probe__",
            "--model", "nemar", "--dataset_mode", "synthetic",
            "--checkpoints_dir", "/tmp/__probe__",
            "--crop_size", "256", "--load_size", "256", "--batch_size", "8",
            "--netG", "resnet_6blocks", "--stn_type", "unet", "--bf16",
        ])
        model = create_model(opt)
        model.setup(opt)
    finally:
        sys.stdout = old
    st = model.state
    params = {"G": st.params_G, "D": st.params_D, "R": st.params_R}
    tx = optax.chain(optax.clip_by_global_norm(10.0),
                     optax.adam(2e-4, b1=0.5))
    ost = tx.init(params)
    grads = jax.tree.map(lambda v: jnp.ones_like(v) * 1e-4, params)

    @jax.jit
    def upd(p, o, g):
        import optax as _o

        u, o2 = tx.update(g, o, p)
        return _o.apply_updates(p, u), o2

    state = {"p": params, "o": ost}

    def chain(steps):
        p, o = state["p"], state["o"]
        t0 = time.time()
        for _ in range(steps):
            p, o = upd(p, o, grads)
        float(jax.tree.leaves(p)[0].astype(jnp.float32).mean())
        state["p"], state["o"] = p, o
        return (time.time() - t0) / steps * 1e3

    return chain


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", type=str, default="")
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--steps", type=int, default=16)
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    log(f"backend: {jax.default_backend()}")
    builders = {
        "step48_xa": lambda: make_step(48, "xla", "auto"),
        "step48_pa": lambda: make_step(48, "pallas", "auto"),
        "adam_only": make_adam,
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
    out = {k: (round(v, 2) if v < float("inf") else None)
           for k, v in best.items()}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
