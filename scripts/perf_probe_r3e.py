"""Round-3 probe E: scatter-form head conv A/B + the production step.

  c7     direct 7x7 64->3 + tanh fwd+bwd (XLA; r3d: 21 ms)
  c7s    scatter-form (ops/conv_small.py) same math
  step_x full step, --block_impl xla
  step_p full step, --block_impl pallas (fused trunk + scatter head,
         XLA decoder — the restructured production config)
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--trials", type=int, default=4)
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()

    log(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(0)
    h256 = jnp.asarray(rng.standard_normal((B, 256, 256, 64), dtype=np.float32))

    variants = {}

    from nemar_tpu.models.networks import reflect_pad

    class C7(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = reflect_pad(x, 3)
            h = nn.Conv(3, (7, 7), padding="VALID")(h)
            return jnp.tanh(h)

    class C7S(nn.Module):
        @nn.compact
        def __call__(self, x):
            from nemar_tpu.ops.attic.conv_small import conv2d_small_cout

            k = self.param("k", nn.initializers.normal(0.02), (7, 7, 64, 3))
            b = self.param("b", nn.initializers.zeros, (3,))
            return jnp.tanh(conv2d_small_cout(x, k.astype(x.dtype), 3)
                            + b.astype(x.dtype))

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

    class C7H(nn.Module):
        @nn.compact
        def __call__(self, x):
            from nemar_tpu.ops.attic.conv_head import conv_head

            k = self.param("k", nn.initializers.normal(0.02), (7, 7, 64, 3))
            b = self.param("b", nn.initializers.zeros, (3,))
            return jnp.tanh(conv_head(x, k.astype(x.dtype)) + b.astype(x.dtype))

    variants["c7"] = fb_variant(C7(), h256)
    variants["c7s"] = fb_variant(C7S(), h256)
    variants["c7h"] = fb_variant(C7H(), h256)

    from nemar_tpu.models import create_model
    from nemar_tpu.options import TrainOptions

    import contextlib
    import io

    batch = {
        "A": rng.standard_normal((B, H, W, 1), dtype=np.float32),
        "B": rng.standard_normal((B, H, W, 3), dtype=np.float32),
        "A_paths": ["x"] * B,
    }
    for tag, impl in (("step_x", "xla"), ("step_p", "pallas")):
        with contextlib.redirect_stdout(io.StringIO()):
            opt = TrainOptions().parse([
                "--dataroot", "__synthetic__", "--name", f"__pe_{impl}__",
                "--model", "nemar", "--dataset_mode", "synthetic",
                "--checkpoints_dir", "/tmp/__probe__",
                "--crop_size", str(H), "--load_size", str(H),
                "--batch_size", str(B), "--netG", "resnet_6blocks",
                "--stn_type", "unet", "--gan_mode", "lsgan",
                "--pool_size", "0", "--bf16", "--block_impl", impl,
            ])
            m = create_model(opt)
            m.setup(opt)
        m.set_input(batch)

        def run(m=m):
            m.optimize_parameters()
            return m._losses["G"]

        variants[tag] = run

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

    res = {k: round(v * 1e3, 2) for k, v in best.items()}
    if "step_p" in res:
        res["pairs_per_sec_pallas"] = round(B / best["step_p"], 1)
    if "step_x" in res:
        res["pairs_per_sec_xla"] = round(B / best["step_x"], 1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
