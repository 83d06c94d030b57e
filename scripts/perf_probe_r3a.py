"""Round-3 perf probe A: subtractive step breakdown + conv MFU isolation.

Decides where the custom-kernel effort goes (VERDICT item 1). Measures, in
ONE window with round-robin interleaving (contention oscillates 10-100x —
see memory note axon-tpu-environment-facts):

  step      full NeMAR train step, b32 256^2 bf16 (the bench headline)
  g1        one G fwd+bwd (grad wrt params)
  g2        two G passes fwd+bwd (the step runs G twice)
  stn       UNet STN fwd+bwd incl. its two warps
  warp      grid_sample fwd+bwd alone at (32,256,256,4)
  dstep     D loss fwd+bwd (batched real+fake pass)
  conv1     single conv3x3 64^2 C256->C256 b32 bf16 fwd (MXU ceiling check)
  trunk     6 ResNet blocks (12 convs + IN + skip) fwd+bwd

Each variant chains K steps with a data dependency (params updated by a
tiny multiple of the grad) and syncs via a small scalar readback (relay
rule: block_until_ready lies; big readbacks pollute timing).

Usage: python scripts/perf_probe_r3a.py [--steps 6] [--trials 3]
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


def build_model():
    from nemar_tpu.models import create_model
    from nemar_tpu.options import TrainOptions

    opt = TrainOptions().parse([
        "--dataroot", "__synthetic__", "--name", "__probe__", "--model", "nemar",
        "--dataset_mode", "synthetic", "--checkpoints_dir", "/tmp/__probe__",
        "--crop_size", str(H), "--load_size", str(H),
        "--batch_size", str(B), "--netG", "resnet_6blocks", "--stn_type", "unet",
        "--gan_mode", "lsgan", "--pool_size", "0", "--bf16",
    ])
    from nemar_tpu.models import nemar_model  # noqa

    model = __import__("nemar_tpu.models", fromlist=["create_model"])
    from nemar_tpu.models import create_model as _cm

    m = _cm(opt)
    m.setup(opt)
    return m, opt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()

    log(f"backend: {jax.default_backend()}")
    model, opt = build_model()
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((B, H, W, 1), dtype=np.float32))
    b = jnp.asarray(rng.standard_normal((B, H, W, 3), dtype=np.float32))
    bf = jnp.bfloat16

    variants = {}

    # ---- full step ----
    model.set_input({"A": np.asarray(a), "B": np.asarray(b), "A_paths": ["x"] * B})

    def step_full():
        model.optimize_parameters()
        return model._losses["G"]

    variants["step"] = step_full

    # ---- G passes ----
    # deep-copy: model.state is DONATED by the train step; the original
    # buffers die after the first 'step' call
    pG = jax.tree.map(jnp.copy, model.state.params_G)
    netG = model.netG

    @jax.jit
    def g1(p, a):
        def loss(p):
            return jnp.mean(netG.apply(jax.tree.map(lambda x: x.astype(bf), p),
                                       a.astype(bf)).astype(jnp.float32))

        g = jax.grad(loss)(p)
        return jax.tree.map(lambda x, y: x - 1e-9 * y, p, g)

    @jax.jit
    def g2(p, a, a2):
        def loss(p):
            cp = jax.tree.map(lambda x: x.astype(bf), p)
            return jnp.mean(netG.apply(cp, a.astype(bf)).astype(jnp.float32)) + \
                jnp.mean(netG.apply(cp, a2.astype(bf)).astype(jnp.float32))

        g = jax.grad(loss)(p)
        return jax.tree.map(lambda x, y: x - 1e-9 * y, p, g)

    state_g1 = {"p": pG}
    variants["g1"] = lambda: (state_g1.update(p=g1(state_g1["p"], a)),
                              jax.tree.leaves(state_g1["p"])[0])[1]
    state_g2 = {"p": pG}
    variants["g2"] = lambda: (state_g2.update(p=g2(state_g2["p"], a, b[..., :1])),
                              jax.tree.leaves(state_g2["p"])[0])[1]

    # ---- STN fwd+bwd (with its warps) ----
    pR = jax.tree.map(jnp.copy, model.state.params_R)
    netR = model.netR
    fake = jnp.asarray(rng.standard_normal((B, H, W, 3), dtype=np.float32))

    @jax.jit
    def stn_fb(p, a, b, fake):
        def loss(p):
            cp = jax.tree.map(lambda x: x.astype(bf), p)
            (rf, wa), reg, _ = netR.apply(cp, a.astype(bf), b.astype(bf),
                                          (fake.astype(bf), a.astype(bf)))
            return jnp.mean(jnp.abs(rf.astype(jnp.float32))) + \
                jnp.mean(jnp.abs(wa.astype(jnp.float32))) + reg.astype(jnp.float32)

        g = jax.grad(loss)(p)
        return jax.tree.map(lambda x, y: x - 1e-9 * y, p, g)

    state_r = {"p": pR}
    variants["stn"] = lambda: (state_r.update(p=stn_fb(state_r["p"], a, b, fake)),
                               jax.tree.leaves(state_r["p"])[0])[1]

    # ---- warp alone at production shape ----
    from nemar_tpu.ops.warp import grid_sample

    img4 = jnp.asarray(
        rng.standard_normal((B, H, W, 4), dtype=np.float32)
    ).astype(bf)
    # bounded flow (±~7 px): an unbounded tail in ANY tile flips the whole
    # call to the exact mm fallback via lax.cond (measured 299 ms/step —
    # recorded as the mm-path cost)
    flow = jnp.asarray(np.clip(
        0.03 * rng.standard_normal((B, H, W, 2), dtype=np.float32),
        -0.055, 0.055,
    ))
    ys, xs = jnp.meshgrid(jnp.linspace(-1, 1, H), jnp.linspace(-1, 1, W),
                          indexing="ij")
    base = jnp.stack([xs, ys], -1)[None]

    @jax.jit
    def warp_fb(img, flow):
        def loss(img, flow):
            return jnp.mean(jnp.abs(
                grid_sample(img, (base + flow).astype(jnp.float32)).astype(jnp.float32)
            ))

        gi, gf = jax.grad(loss, argnums=(0, 1))(img, flow)
        return img - 1e-9 * gi, flow - 1e-9 * gf

    state_w = {"i": img4, "f": flow}
    def run_warp():
        i, f = warp_fb(state_w["i"], state_w["f"])
        state_w.update(i=i, f=f)
        return f

    variants["warp"] = run_warp

    # ---- D step ----
    pD = jax.tree.map(jnp.copy, model.state.params_D)

    @jax.jit
    def d_fb(p, fake, b):
        g = jax.grad(lambda p: model._d_loss(p, fake, b)[0])(p)
        return jax.tree.map(lambda x, y: x - 1e-9 * y, p, g)

    state_d = {"p": pD}
    variants["dstep"] = lambda: (state_d.update(p=d_fb(state_d["p"], fake, b)),
                                 jax.tree.leaves(state_d["p"])[0])[1]

    # ---- conv MFU ceiling: single 3x3 conv at the trunk hot shape ----
    C = 256
    x64 = jnp.asarray(
        rng.standard_normal((B, 64, 64, C), dtype=np.float32)
    ).astype(bf)
    wconv = jnp.asarray(
        0.02 * rng.standard_normal((3, 3, C, C), dtype=np.float32)
    ).astype(bf)

    @jax.jit
    def conv1(x, w):
        # chainable: bf16 in -> bf16 out (values may overflow; timing only)
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(x.dtype)

    state_c = {"x": x64}
    variants["conv1"] = lambda: (state_c.update(x=conv1(state_c["x"], wconv)),
                                 state_c["x"])[1]

    # ---- ResNet trunk (6 blocks) fwd+bwd ----
    from nemar_tpu.models.networks import ResnetBlock
    import flax.linen as nn

    class Trunk(nn.Module):
        @nn.compact
        def __call__(self, x):
            for _ in range(6):
                x = ResnetBlock(C, "instance", False, "xla")(x)
            return x

    trunk = Trunk()
    pT = trunk.init(jax.random.key(0), x64.astype(jnp.float32))

    @jax.jit
    def trunk_fb(p, x):
        def loss(p):
            return jnp.mean(trunk.apply(
                jax.tree.map(lambda v: v.astype(bf), p), x).astype(jnp.float32))

        g = jax.grad(loss)(p)
        return jax.tree.map(lambda v, u: v - 1e-9 * u, p, g)

    state_t = {"p": pT}
    variants["trunk"] = lambda: (state_t.update(p=trunk_fb(state_t["p"], x64)),
                                 jax.tree.leaves(state_t["p"])[0])[1]

    # ---- fused Pallas trunk (6 blocks, ops/conv_fused.py) fwd+bwd ----
    class TrunkF(nn.Module):
        @nn.compact
        def __call__(self, x):
            for _ in range(6):
                x = ResnetBlock(C, "instance", False, "xla",
                                block_impl="pallas")(x)
            return x

    trunkf = TrunkF()
    pTF = trunkf.init(jax.random.key(0), x64.astype(jnp.float32))

    @jax.jit
    def trunkf_fb(p, x):
        def loss(p):
            return jnp.mean(trunkf.apply(
                jax.tree.map(lambda v: v.astype(bf), p), x).astype(jnp.float32))

        g = jax.grad(loss)(p)
        return jax.tree.map(lambda v, u: v - 1e-9 * u, p, g)

    state_tf = {"p": pTF}
    variants["ftrunk"] = lambda: (state_tf.update(p=trunkf_fb(state_tf["p"], x64)),
                                  jax.tree.leaves(state_tf["p"])[0])[1]

    # fused trunk fwd-only (small scalar output to avoid readback pollution)
    @jax.jit
    def trunkf_f(x):
        return jnp.mean(trunkf.apply(
            jax.tree.map(lambda v: v.astype(bf), pTF), x).astype(jnp.float32))

    variants["ftrunk_fwd"] = lambda: trunkf_f(x64)

    @jax.jit
    def trunk_f(x):
        return jnp.mean(trunk.apply(
            jax.tree.map(lambda v: v.astype(bf), pT), x).astype(jnp.float32))

    variants["trunk_fwd"] = lambda: trunk_f(x64)

    if args.only:
        keep = args.only.split(",")
        variants = {k: v for k, v in variants.items() if k in keep}

    # ---- compile all (cache makes repeats free) ----
    for name, fn in variants.items():
        t0 = time.time()
        out = fn()
        np.asarray(jax.tree.leaves(out)[0].astype(jnp.float32)).ravel()[:1]
        log(f"compile {name}: {time.time() - t0:.1f}s")

    # ---- round-robin timing ----
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

    # conv1 MFU: 2*B*64*64*C*C*9 FLOP
    conv_flop = 2 * B * 64 * 64 * C * C * 9
    trunk_flop = conv_flop * 12 * 3  # fwd+bwd ~3x fwd
    res = {k: round(v * 1e3, 2) for k, v in best.items()}
    if "conv1" in best:
        res["conv1_tflops"] = round(conv_flop / best["conv1"] / 1e12, 1)
    if "trunk" in best:
        res["trunk_tflops"] = round(trunk_flop / best["trunk"] / 1e12, 1)
    if "ftrunk" in best:
        res["ftrunk_tflops"] = round(trunk_flop / best["ftrunk"] / 1e12, 1)
    if "trunk_fwd" in best:
        res["trunk_fwd_tflops"] = round(conv_flop * 12 / best["trunk_fwd"] / 1e12, 1)
    if "ftrunk_fwd" in best:
        res["ftrunk_fwd_tflops"] = round(conv_flop * 12 / best["ftrunk_fwd"] / 1e12, 1)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
