"""Affine-arm diagnosis (VERDICT r2 item 3): why does the affine STN stall
in-model while its oracle fit reached 0.41 px?

Round-2 facts: the affine arm stalls even against a frozen G with no GAN —
flow magnitude sits at ~0.25 px on a 2.5 px task with cos ~ 0 (pure
regressor failure, science_v7_affine/science_v8_affine_r_only). Suspects:
GAP encoder destroying spatial phase, IN killing magnitude cues, lr/beta
mismatch.

Hypothesis under test here: a GLOBAL-AVERAGE-POOLED feature vector is
shift-invariant up to edge effects, so once the border cue is dead
(--synthetic_pad_crop) the GAP head has almost no signal path for the
translation components of theta. The reference affine STN flattens the
conv feature map into the FC head (phase preserved). The old 0.41 px
oracle number predates pad_crop — consistent with GAP reading margins.

Arms (direct photometric fit, no G/GAN, per-sample random affines,
held-out eval — memory note: constant shifts are trivially fittable by
head bias):
    gap_cue       GAP head, border cue ALIVE (zeros-padding margins)
    gap_nocue     GAP head, cue dead (padded render, center crop)
    flatten_cue   flatten head, cue alive
    flatten_nocue flatten head, cue dead        <- the candidate fix
    flatten_noin  flatten head, no-IN encoder, cue dead (IN suspect)

Usage: python scripts/science_affine.py [steps] [res]
Writes docs/science/science_affine_diag.jsonl
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

from nemar_tpu.models.stn.affine_stn import AffineSTN
from nemar_tpu.ops.warp import grid_sample, identity_grid
from nemar_tpu.utils import metrics as M


def octave_scene(rng, res):
    from PIL import Image

    f = np.zeros((res, res), np.float32)
    for scale, w in ((16, 0.5), (6, 0.3), (3, 0.2)):
        s = max(2, res // scale)
        o = rng.standard_normal((s, s)).astype(np.float32)
        f += w * np.asarray(
            Image.fromarray(o, mode="F").resize((res, res), Image.BICUBIC)
        )
    lo, hi = f.min(), f.max()
    return (f - lo) / max(hi - lo, 1e-6) * 2.0 - 1.0


def _affine_flow(theta, height, width):
    """Normalized flow of the center-origin pixel map M: (M(p)-p)·2/size."""
    r, t = theta[:, :2], theta[:, 2]
    ys, xs = np.meshgrid(np.arange(height), np.arange(width), indexing="ij")
    x, y = xs - width / 2.0, ys - height / 2.0
    qx = r[0, 0] * x + r[0, 1] * y + t[0]
    qy = r[1, 0] * x + r[1, 1] * y + t[1]
    return np.stack([(qx - x) * 2.0 / width, (qy - y) * 2.0 / height],
                    -1).astype(np.float32)


def make_pairs(rng, n, res, cue: bool, max_px: float = 3.2):
    """(a, b, gt_flows): b is the scene; a(p) = scene(M(p)) — misaligned.

    Warping a by the GT flow (registration_gt_flow = M⁻¹ displacement)
    re-aligns it to b; self-checked on the first pair. cue=True renders on
    the crop canvas with zero padding (margins encode the misalignment —
    the round-1/2 artifact); cue=False renders padded and center-crops.
    """
    pad = 0 if cue else int(np.ceil(max_px)) + 3
    rp = res + 2 * pad
    a_list, b_list, gts = [], [], []
    for k in range(n):
        scene = octave_scene(rng, rp)[:, :, None]
        # per-sample affine: small rot/scale/shear + pixel translation
        aff = np.eye(2) + rng.uniform(-0.03, 0.03, (2, 2))
        trans = rng.uniform(-max_px, max_px, (2,))
        theta = np.concatenate([aff, trans[:, None]], 1).astype(np.float32)
        gt = M.registration_gt_flow(theta, res, res)
        # render A on the (padded) canvas: sample scene at identity + M-flow
        grid_p = (identity_grid(rp, rp, False, jnp.float32)[None]
                  + jnp.asarray(_affine_flow(theta, rp, rp))[None])
        a_full = np.asarray(grid_sample(
            jnp.asarray(scene)[None], grid_p, padding_mode="zeros",
        ))[0]
        sl = slice(pad, pad + res) if pad else slice(None)
        a_list.append(a_full[sl, sl])
        b_list.append(np.asarray(scene)[sl, sl])
        gts.append(gt)
        if k == 0:
            # convention self-check: warp(a, id+gt) must reproduce b inside
            # the valid interior (borders pull from outside the crop)
            ga = (identity_grid(res, res, False, jnp.float32)[None]
                  + jnp.asarray(gt)[None])
            re = np.asarray(grid_sample(
                jnp.asarray(a_list[0])[None], ga, padding_mode="border"))[0]
            m = int(np.ceil(max_px)) + 2
            err = np.abs(re - b_list[0])[m:-m, m:-m].mean()
            assert err < 0.05, f"GT-flow convention broken: interior L1 {err}"
    return (np.stack(a_list), np.stack(b_list), gts)


def run_arm(name, head, cue, steps, res, encoder_norm=True, log_f=None):
    rng = np.random.default_rng(0)
    a_tr, b_tr, gt_tr = make_pairs(rng, 64, res, cue)
    rng_ho = np.random.default_rng(1000)
    a_ho, b_ho, gt_ho = make_pairs(rng_ho, 16, res, cue)

    stn = AffineSTN(in_channels=2, ngf=16, n_downs=4, head=head)
    if not encoder_norm:
        # monkeypatch-free variant: norm suspect handled by a wrapper module
        import flax.linen as nn

        class NoInSTN(AffineSTN):
            @nn.compact
            def predict_dtheta(self, a, b):
                h = jnp.concatenate([a, b], axis=-1)
                ch = self.ngf
                for i in range(self.n_downs):
                    h = nn.Conv(ch, (3, 3), strides=(2, 2),
                                padding=((1, 1), (1, 1)))(h)
                    h = jax.nn.leaky_relu(h, 0.2)
                    ch = min(ch * 2, self.ngf * 8)
                h = (jnp.mean(h, axis=(1, 2)) if self.head == "gap"
                     else h.reshape(h.shape[0], -1))
                h = nn.Dense(64)(h)
                h = jax.nn.leaky_relu(h, 0.2)
                d = nn.Dense(6, kernel_init=nn.initializers.zeros,
                             bias_init=nn.initializers.zeros)(h)
                return d.reshape(-1, 2, 3)

        stn = NoInSTN(in_channels=2, ngf=16, n_downs=4, head=head)

    at, bt = jnp.asarray(a_tr), jnp.asarray(b_tr)
    params = stn.init(jax.random.key(0), at[:1], bt[:1], (at[:1],))
    tx = optax.adam(1e-3, b1=0.9)
    ost = tx.init(params)

    def loss_fn(p, a, b):
        (wa,), reg, aux = stn.apply(p, a, b, (a,))
        return jnp.mean(jnp.abs(wa - b)) + 0.1 * reg

    @jax.jit
    def step(p, o, a, b):
        l, g = jax.value_and_grad(loss_fn)(p, a, b)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, l

    @jax.jit
    def eval_flow(p, a, b):
        _, _, aux = stn.apply(p, a, b, (a,))
        return aux["flow"]

    def epe(p, a, b, gts):
        fl = np.asarray(eval_flow(p, jnp.asarray(a), jnp.asarray(b)))
        return float(np.mean([M.epe_px(fl[j], gts[j], res, res)
                              for j in range(len(gts))]))

    t0 = time.time()
    bs = 16
    n = len(a_tr)
    order = np.arange(n)
    srng = np.random.default_rng(7)
    rec = None
    for s in range(steps):
        if s % (n // bs) == 0:
            srng.shuffle(order)
        idx = order[(s % (n // bs)) * bs:(s % (n // bs) + 1) * bs]
        params, ost, l = step(params, ost, at[idx], bt[idx])
        if (s + 1) % 100 == 0 or s == steps - 1:
            rec = {
                "arm": name, "step": s + 1,
                "loss": round(float(l), 4),
                "epe_tr": round(epe(params, a_tr[:16], b_tr[:16], gt_tr[:16]), 3),
                "epe_ho": round(epe(params, a_ho, b_ho, gt_ho), 3),
                "epe0": round(float(np.mean([
                    M.epe_px(np.zeros_like(g), g, res, res) for g in gt_ho])), 3),
                "min": round((time.time() - t0) / 60, 2),
            }
            print(rec, flush=True)
            if log_f:
                log_f.write(json.dumps(rec) + "\n")
                log_f.flush()
    return rec


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 600
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs/science/science_affine_diag.jsonl")
    f = open(out, "a")
    arms = [
        ("gap_nocue", "gap", False, True),
        ("flatten_nocue", "flatten", False, True),
        ("gap_cue", "gap", True, True),
        ("flatten_cue", "flatten", True, True),
        ("flatten_noin_nocue", "flatten", False, False),
    ]
    finals = {}
    for name, head, cue, enc_norm in arms:
        r = run_arm(name, head, cue, steps, res, enc_norm, f)
        finals[name] = r["epe_ho"]
    print(json.dumps({"final": finals}))
    f.write(json.dumps({"final": finals}) + "\n")
    f.close()


if __name__ == "__main__":
    main()
