"""Probe (VERDICT r2 item 8): does the adversarial direction-lock appear at
a 48²/96-pair miniature within default-CI CPU budget (~4-6 min)?

Runs the proven v7_unet recipe shrunk to 48²/96 pairs and records the
held-out direction cosine + flow magnitude per epoch. If cos > 0.6 locks
by a wall-clock-affordable epoch, tests/test_adversarial_gate.py gains a
default-on variant at that point (64² stays under NEMAR_SLOW_TESTS).

Usage: python scripts/probe_adv_gate48.py [res] [pairs] [epochs]
"""

import copy
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

import numpy as np


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 96
    epochs = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    seed = int(sys.argv[4]) if len(sys.argv) > 4 else 0

    from nemar_tpu.data import create_dataset
    from nemar_tpu.data.synthetic_dataset import SyntheticDataset
    from nemar_tpu.models import create_model
    from nemar_tpu.options import TrainOptions
    from nemar_tpu.utils import metrics as M

    opt = TrainOptions().parse([
        "--dataroot", "__synthetic__", "--dataset_mode", "synthetic",
        "--model", "nemar", "--stn_type", "unet",
        "--name", f"advp{res}_s{seed}", "--checkpoints_dir", f"/tmp/advp{res}_s{seed}",
        "--seed", str(seed),
        "--crop_size", str(res), "--load_size", str(res),
        "--batch_size", "8", "--synthetic_size", str(pairs),
        "--synthetic_pad_crop", "--synthetic_appearance", "smooth",
        "--recon_pyramid", "3", "--border_mask",
        "--stn_multiscale", "--stn_level_scale", "0.25",
        "--stn_warmup_epochs", "3", "--stn_ramp_epochs", "8",
        "--stn_grad_clip", "0.5",
        "--stn_lr", "1e-3", "--stn_beta1", "0.9",
        "--n_epochs", str(epochs), "--n_epochs_decay", "0",
        "--save_epoch_freq", "10000", "--print_freq", "100000",
        "--display_freq", "1000000", "--no_html",
        "--ngf", "32", "--ndf", "32", "--stn_ngf", "16", "--stn_depth", "4",
    ])
    dataset = create_dataset(opt)
    model = create_model(opt)
    model.setup(opt)

    eval_opt = copy.deepcopy(opt)
    eval_opt.seed = seed + 1000
    ds_ho = SyntheticDataset(eval_opt)
    ho = [ds_ho[i] for i in range(12)]
    ea = np.stack([it["A"] for it in ho])
    eb = np.stack([it["B"] for it in ho])
    gts = [M.registration_gt_flow(it["theta_gt"], res, res) for it in ho]

    t0 = time.time()
    for epoch in range(1, epochs + 1):
        model.set_epoch(epoch)
        for data in dataset:
            model.set_input(data)
            model.optimize_parameters()
        model.update_learning_rate(epoch)
        model.set_input({"A": ea, "B": eb, "A_paths": ["e"] * len(ea)})
        out = model.forward()
        flow = np.asarray(out["flow"])
        cos = []
        for j in range(len(gts)):
            pv, gv = flow[j].mean((0, 1)), gts[j].mean((0, 1))
            den = np.linalg.norm(pv) * np.linalg.norm(gv)
            if den > 1e-8:
                cos.append(float(pv @ gv / den))
        epe = float(np.mean([M.epe_px(flow[j], gts[j], res, res)
                             for j in range(len(gts))]))
        rec = {"res": res, "pairs": pairs, "seed": seed, "epoch": epoch,
               "cos": round(float(np.mean(cos)) if cos else 0.0, 3),
               "mag_px": round(float(np.mean(np.abs(flow))) * res / 2, 3),
               "epe_ho": round(epe, 3),
               "min": round((time.time() - t0) / 60, 2)}
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
