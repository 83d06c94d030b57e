"""Affine-arm diagnosis, part 2: data scaling / modality / capacity.

Part 1 (science_affine_diag.jsonl) showed EVERY head variant fits 64 train
pairs to sub-0.4 px EPE but none generalizes (held-out = identity): the
global 6-param regression memorizes pair->theta at small N — unlike the
UNet arm, which generalizes because it is translation-equivariant (every
pixel is effectively a training sample). So the round-2 'affine stall'
decomposes into (a) generalization starvation and possibly (b) the
G-mediated loss. This script isolates (a):

    n192 / n512       flatten head, same-modal, 192 / 512 fixed pairs
    n192_gap          gap head at 192 (head comparison at scale)
    n192_xmodal       R sees (a 1ch, b 3ch smooth-colorized); loss on gray
    infinite          fresh random pairs every batch (capacity ceiling)

Usage: python scripts/science_affine2.py [steps]
Appends to docs/science/science_affine_diag.jsonl
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

from science_affine import make_pairs  # noqa: E402
from nemar_tpu.models.stn.affine_stn import AffineSTN
from nemar_tpu.utils import metrics as M

RES = 64


def colorize(g):
    """[-1,1] gray -> 3ch smooth monotone remaps (dataset 'smooth' style)."""
    x = (g + 1.0) / 2.0
    return np.concatenate([x ** 0.5, x ** 2.0, 1.0 - x * 0.8], axis=-1) * 2 - 1


def run(name, head, n_train, steps, xmodal=False, infinite=False, log_f=None):
    rng = np.random.default_rng(0)
    a_tr, b_tr, gt_tr = make_pairs(rng, n_train, RES, cue=False)
    rng_ho = np.random.default_rng(1000)
    a_ho, b_ho, gt_ho = make_pairs(rng_ho, 32, RES, cue=False)

    def r_input_b(b):
        return colorize(b) if xmodal else b

    in_ch = 1 + (3 if xmodal else 1)
    stn = AffineSTN(in_channels=in_ch, ngf=16, n_downs=4, head=head)
    params = stn.init(jax.random.key(0), jnp.asarray(a_tr[:1]),
                      jnp.asarray(r_input_b(b_tr[:1])), ())
    tx = optax.adam(1e-3, b1=0.9)
    ost = tx.init(params)

    def loss_fn(p, a, b_in, b_gray):
        # R estimates theta from (a, b_in); warp quality judged on gray
        _, reg, aux = stn.apply(p, a, b_in, ())
        from nemar_tpu.ops.warp import grid_sample

        wa = grid_sample(a, aux["grid"], padding_mode="border")
        return jnp.mean(jnp.abs(wa - b_gray)) + 0.1 * reg

    @jax.jit
    def step(p, o, a, b_in, b_gray):
        l, g = jax.value_and_grad(loss_fn)(p, a, b_in, b_gray)
        u, o = tx.update(g, o, p)
        return optax.apply_updates(p, u), o, l

    @jax.jit
    def eval_flow(p, a, b_in):
        _, _, aux = stn.apply(p, a, b_in, ())
        return aux["flow"]

    def epe(p, a, b, gts):
        fl = np.asarray(eval_flow(p, jnp.asarray(a),
                                  jnp.asarray(r_input_b(b))))
        return float(np.mean([M.epe_px(fl[j], gts[j], RES, RES)
                              for j in range(len(gts))]))

    t0 = time.time()
    bs = 16
    srng = np.random.default_rng(7)
    gen_rng = np.random.default_rng(42)
    rec = None
    for s in range(steps):
        if infinite and s % 4 == 0:
            a_tr, b_tr, gt_tr = make_pairs(gen_rng, 64, RES, cue=False)
        idx = srng.integers(0, len(a_tr), bs)
        params, ost, l = step(
            params, ost, jnp.asarray(a_tr[idx]),
            jnp.asarray(r_input_b(b_tr[idx])), jnp.asarray(b_tr[idx]))
        if (s + 1) % 250 == 0 or s == steps - 1:
            rec = {
                "arm": name, "step": s + 1, "loss": round(float(l), 4),
                "epe_tr": round(epe(params, a_tr[:32], b_tr[:32], gt_tr[:32]), 3),
                "epe_ho": round(epe(params, a_ho, b_ho, gt_ho), 3),
                "epe0": round(float(np.mean([
                    M.epe_px(np.zeros_like(g), g, RES, RES)
                    for g in gt_ho])), 3),
                "min": round((time.time() - t0) / 60, 2),
            }
            print(rec, flush=True)
            if log_f:
                log_f.write(json.dumps(rec) + "\n")
                log_f.flush()
    return rec


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs/science/science_affine_diag.jsonl")
    f = open(out, "a")
    finals = {}
    for name, head, n, xm, inf in [
        ("n192", "flatten", 192, False, False),
        ("n512", "flatten", 512, False, False),
        ("n192_gap", "gap", 192, False, False),
        ("n192_xmodal", "flatten", 192, True, False),
        ("infinite", "flatten", 64, False, True),
    ]:
        r = run(name, head, n, steps, xm, inf, f)
        finals[name] = r["epe_ho"]
    print(json.dumps({"final2": finals}))
    f.write(json.dumps({"final2": finals}) + "\n")
    f.close()


if __name__ == "__main__":
    main()
