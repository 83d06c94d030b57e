"""Round-3 probe D: full-step A/B with the fused kernels + decoder split.

  step_x    full NeMAR step, b32 256^2 bf16, --block_impl xla (baseline)
  step_p    same with --block_impl pallas (fused trunk + decoder kernels)
  dec_f     fused decoder (2 convT kernels + c7s1-3+tanh) fwd+bwd
  u1        ConvT 64^2 256->128 + IN + relu fwd+bwd (XLA)
  u1f       fused kernel for the same stage
  c7        final conv 7x7 64->3 + tanh at 256^2 fwd+bwd (XLA)
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


def build_model(block_impl):
    from nemar_tpu.models import create_model
    from nemar_tpu.options import TrainOptions

    import contextlib
    import io

    with contextlib.redirect_stdout(io.StringIO()):
        opt = TrainOptions().parse([
            "--dataroot", "__synthetic__", "--name", f"__p_{block_impl}__",
            "--model", "nemar", "--dataset_mode", "synthetic",
            "--checkpoints_dir", "/tmp/__probe__",
            "--crop_size", str(H), "--load_size", str(H),
            "--batch_size", str(B), "--netG", "resnet_6blocks",
            "--stn_type", "unet", "--gan_mode", "lsgan", "--pool_size", "0",
            "--bf16", "--block_impl", block_impl,
        ])
        m = create_model(opt)
        m.setup(opt)
    return m


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--trials", type=int, default=4)
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()

    log(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(0)
    batch = {
        "A": rng.standard_normal((B, H, W, 1), dtype=np.float32),
        "B": rng.standard_normal((B, H, W, 3), dtype=np.float32),
        "A_paths": ["x"] * B,
    }

    variants = {}

    for tag, impl in (("step_x", "xla"), ("step_p", "pallas")):
        m = build_model(impl)
        m.set_input(batch)

        def run(m=m):
            m.optimize_parameters()
            return m._losses["G"]

        variants[tag] = run

    # ---- decoder pieces ----
    h64 = jnp.asarray(rng.standard_normal((B, 64, 64, 256), dtype=np.float32))
    h128 = jnp.asarray(rng.standard_normal((B, 128, 128, 128), dtype=np.float32))
    h256 = jnp.asarray(rng.standard_normal((B, 256, 256, 64), dtype=np.float32))

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

    from nemar_tpu.models.networks import _norm_act, reflect_pad

    class U1(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.ConvTranspose(128, (3, 3), strides=(2, 2), padding="SAME")(x)
            return _norm_act(h, "instance", "relu")

    class U1F(nn.Module):
        @nn.compact
        def __call__(self, x):
            from nemar_tpu.ops.attic.convt_fused import fused_convt_in

            wk = self.param("k", nn.initializers.normal(0.02), (3, 3, 256, 128))
            return fused_convt_in(x, wk.astype(x.dtype))

    class C7(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = reflect_pad(x, 3)
            h = nn.Conv(3, (7, 7), padding="VALID")(h)
            return jnp.tanh(h)

    class DecF(nn.Module):
        @nn.compact
        def __call__(self, x):
            from nemar_tpu.ops.attic.convt_fused import fused_convt_in

            k1 = self.param("k1", nn.initializers.normal(0.02), (3, 3, 256, 128))
            k2 = self.param("k2", nn.initializers.normal(0.02), (3, 3, 128, 64))
            h = fused_convt_in(x, k1.astype(x.dtype))
            h = fused_convt_in(h, k2.astype(h.dtype))
            h = reflect_pad(h, 3)
            h = nn.Conv(3, (7, 7), padding="VALID")(h)
            return jnp.tanh(h)

    variants["u1"] = fb_variant(U1(), h64)
    variants["u1f"] = fb_variant(U1F(), h64)
    variants["c7"] = fb_variant(C7(), h256)
    variants["dec_f"] = fb_variant(DecF(), h64)

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
    if "step_p" in res and "step_x" in res:
        res["pairs_per_sec_pallas"] = round(B / best["step_p"], 1)
        res["pairs_per_sec_xla"] = round(B / best["step_x"], 1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
