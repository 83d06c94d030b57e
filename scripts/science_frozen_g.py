#!/usr/bin/env python
"""Frozen-G two-phase experiment: is the blocker the SIMULTANEOUS
optimization, or can R converge against a realistically-trained G?

Phase 1: train G+D only (R frozen) for E1 epochs on the smooth-appearance
pad-crop synthetic task. Phase 2: freeze G+D (--freeze_g machinery),
train R alone for E2 epochs; track held-out EPE. The oracle-G control
reached 0.41 px (affine STN); if R-vs-frozen-trained-G also converges,
the remaining gap is co-adaptation dynamics, not representation.

Usage: python scripts/science_frozen_g.py [stn_type] [E1] [E2] [extra flags...]
(extra argv entries are appended to the option list verbatim)
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

import numpy as np


def main():
    stn_type = sys.argv[1] if len(sys.argv) > 1 else "affine"
    e1 = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    e2 = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    res, size = 64, 192

    from nemar_tpu.data import create_dataset
    from nemar_tpu.models import create_model
    from nemar_tpu.options import TrainOptions
    from nemar_tpu.utils import metrics as M

    base = [
        "--dataroot", "__synthetic__", "--dataset_mode", "synthetic",
        "--model", "nemar", "--stn_type", stn_type,
        "--name", f"fz_{stn_type}", "--checkpoints_dir", f"/tmp/fz_{stn_type}",
        "--crop_size", str(res), "--load_size", str(res),
        "--batch_size", "8", "--synthetic_size", str(size),
        "--synthetic_pad_crop", "--synthetic_appearance", "smooth",
        "--recon_pyramid", "3", "--border_mask",
        "--stn_lr", "1e-3", "--stn_beta1", "0.9",
        "--n_epochs", str(e1 + e2), "--n_epochs_decay", "0",
        "--save_epoch_freq", "10000", "--print_freq", "100000",
        "--display_freq", "1000000", "--no_html",
        "--ngf", "32", "--ndf", "32", "--stn_ngf", "16", "--stn_depth", "4",
    ]
    if stn_type == "affine":
        base += ["--lambda_smooth", "0.1"]
    else:
        base += ["--stn_multiscale", "--stn_level_scale", "0.5"]
    base += sys.argv[4:]

    # Phase 1: R frozen the whole phase via stn_warmup > e1
    opt = TrainOptions().parse(base + ["--stn_warmup_epochs", str(10 ** 6)])
    dataset = create_dataset(opt)
    model = create_model(opt)
    model.setup(opt)

    import copy

    from nemar_tpu.data.synthetic_dataset import SyntheticDataset

    eval_opt = copy.deepcopy(opt)
    eval_opt.seed = getattr(opt, "seed", 0) + 1000
    ds_ho = SyntheticDataset(eval_opt)
    ho = [ds_ho[i] for i in range(16)]
    ea = np.stack([it["A"] for it in ho])
    eb = np.stack([it["B"] for it in ho])
    gts = [M.registration_gt_flow(it["theta_gt"], res, res) for it in ho]

    def evaluate(tag, epoch):
        model.set_input({"A": ea, "B": eb, "A_paths": ["e"] * len(ea)})
        out = model.forward()
        flow = np.asarray(out["flow"])
        reg = np.asarray(out["reg_fakeB"])
        epe = float(np.mean([M.epe_px(flow[j], gts[j], res, res)
                             for j in range(len(gts))]))
        epe0 = float(np.mean([M.epe_px(np.zeros_like(g), g, res, res)
                              for g in gts]))
        rec = {"phase": tag, "epoch": epoch, "epe_ho": round(epe, 3),
               "epe0": round(epe0, 3),
               "flow_px": round(float(np.mean(np.abs(flow))) * res / 2, 3),
               "ncc": round(M.ncc(reg, eb), 4)}
        print(rec, flush=True)
        return epe

    t0 = time.time()
    for epoch in range(1, e1 + 1):
        model.set_epoch(epoch)
        for data in dataset:
            model.set_input(data)
            model.optimize_parameters()
        if epoch % 4 == 0 or epoch == e1:
            evaluate("P1_GD", epoch)

    # Phase 2: freeze G+D, train R alone — SAME process, fresh jit with
    # freeze_g semantics. Transfer state by flipping the flags.
    model.freeze_g = True
    model.stn_warmup = 0
    model._train_step = __import__("jax").jit(
        model._train_step_impl, donate_argnums=(0,)
    )
    for epoch in range(1, e2 + 1):
        model.set_epoch(e1 + epoch)
        for data in dataset:
            model.set_input(data)
            model.optimize_parameters()
        if epoch % 3 == 0 or epoch == e2:
            epe = evaluate("P2_Ronly", epoch)
    print(json.dumps({"config": f"frozen_g_{stn_type}", "final_epe_px": epe,
                      "minutes": round((time.time() - t0) / 60, 1)}))


if __name__ == "__main__":
    main()
