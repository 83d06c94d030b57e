#!/usr/bin/env python
"""Final round-2 convergence run: v7_unet joint recipe + R-refinement.

Phase 1 (joint): full adversarial NeMAR with the converging recipe —
smooth appearance, pad-crop, recon pyramid, border mask, DAMPED multiscale
UNet STN (level 0.25, clip 0.5), R warm-up 3 + ramp 8, stn_lr 1e-3 b1 0.9.
Phase 2 (refine): freeze G+D (--freeze_g machinery), train R alone — in
the joint end-game G keeps absorbing the residual photometric signal that
R needs (the race), so the last px of alignment comes from a refinement
phase against the frozen, now-sharp translator.

Usage: python scripts/science_final.py [E1] [E1_decay] [E2] [seed] [res] [stn]
stn: unet (default) uses the v7_unet damped-multiscale recipe; affine uses
the round-3 v9_affine recipe (fresh per-visit misalignments — the data-
diversity lever the global 6-param head needs, science_affine_diag).
Writes /tmp/science_final{_s<seed>}{_r<res>}.jsonl and saves 'latest'
checkpoints. res >= 256 bumps the STN depth and pyramid (same relative
receptive field) — run those with SCIENCE_TPU=1.
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
    e1 = int(sys.argv[1]) if len(sys.argv) > 1 else 45
    e1d = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    e2 = int(sys.argv[3]) if len(sys.argv) > 3 else 15
    seed = int(sys.argv[4]) if len(sys.argv) > 4 else 0
    res = int(sys.argv[5]) if len(sys.argv) > 5 else 64
    stn = sys.argv[6] if len(sys.argv) > 6 else "unet"
    # arg 7 'fresh': per-visit random affines for the UNet arm too. At 256²
    # the fixed-192-pair run stalls at ~40% field magnitude; with fixed
    # pairs a G that memorizes per-sample geometry caps the photometric
    # signal R sees (the round-2 memorization finding, and the lever that
    # unlocked the affine arm in v9).
    fresh = "fresh" in sys.argv[7:]
    # Round-4 capture-range scaling: the coarsest recon-pyramid cell is
    # 2^pyr px while the task's misalignment scales with res (identity EPE
    # 2.5/5.6/11.1 px at 64/128/256). Pyramid 3 keeps the misalignment at
    # ~0.3 coarsest-cells at 64² (converges) but 1.4 cells at 256² — no
    # photometric slope reaches R, and the 256² joint run stalled at
    # identity (science_final_r256_fresh.jsonl, round 4). Scale the
    # pyramid with res to hold the capture ratio; override with pyr=N.
    pyr = 3 + max(0, int(np.log2(res / 64)))
    gate = None
    for tok in sys.argv[7:]:
        if tok.startswith("pyr="):
            pyr = int(tok.split("=")[1])
        # gate=E:T — the round-5 trajectory-selection gate. 256² joint
        # convergence is BIMODAL across trajectory draws: converged runs
        # (seed 0: 2.78 px; realdata attempt 3: 1.21 px) separate from
        # stalled ones (seeds 1/2 at 1-2x budget: 0.9x identity) ALREADY
        # at epoch 25 by per-pixel direction cosine (0.42 vs 0.27/0.20 —
        # committed trajectories). Instead of buying stalled draws more
        # budget (s1ext: 310 epochs, no cross), restart with a bumped
        # seed until pcos_ho >= T at epoch E. Epochs are seconds on TPU;
        # a restart costs minutes.
        if tok.startswith("gate="):
            ge_, gt_ = tok.split("=")[1].split(":")
            gate = (int(ge_), float(gt_))
    size = 192
    tag = ((f"_{stn}" if stn != "unet" else "")
           + (f"_s{seed}" if seed else "") + (f"_r{res}" if res != 64 else "")
           + ("_fresh" if fresh else "")
           + (f"_p{pyr}" if pyr != 3 else "")
           + ("_gate" if gate else ""))

    from nemar_tpu.data import create_dataset
    from nemar_tpu.models import create_model
    from nemar_tpu.options import TrainOptions
    from nemar_tpu.utils import metrics as M

    def build(cur_seed):
        opt = TrainOptions().parse([
        "--dataroot", "__synthetic__", "--dataset_mode", "synthetic",
        "--model", "nemar", "--stn_type", stn,
        "--name", f"final{tag}", "--checkpoints_dir", f"/tmp/sci_final{tag}",
        "--seed", str(cur_seed),
        "--crop_size", str(res), "--load_size", str(res),
        "--batch_size", "8", "--synthetic_size", str(size),
        "--synthetic_pad_crop", "--synthetic_appearance", "smooth",
        "--recon_pyramid", str(pyr), "--border_mask",
    ] + (["--synthetic_fresh_affine"] if fresh else []) + ((["--stn_multiscale", "--stn_level_scale", "0.25",
           "--stn_warmup_epochs", "3", "--stn_ramp_epochs", "8",
           "--stn_grad_clip", "0.5"]
          # >=128²: add the tanh flow bound (harmless at the proven 64²
          # point but REQUIRED >=256²; bound 2x the task's max |flow|)
          + (["--stn_bounded_flow", str(round(0.05 * 2 * 2.5, 3)),
              "--stn_smooth_order", "2"] if res >= 128 else [])
          if res < 256 else
          # 256² scaling (round 3, diagnosed in science_256_direct): the
          # d6 multiscale arm DIVERGES even in a DIRECT photometric fit
          # (flow 118 px by step 100) — the ultra-coarse heads random-walk
          # under Adam with weak photometric anchoring. The tanh flow
          # bound fixes it outright: the bounded direct fit reaches
          # 0.5 px vs identity 8.1 in 300 steps. order-2 TV (curvature)
          # stays: order-1 penalizes an affine field's magnitude directly
          # (the v10 40%-magnitude stall).
          ["--stn_multiscale", "--stn_level_scale", "0.25",
           "--stn_bounded_flow", "0.15",
           "--lambda_smooth", "40", "--stn_smooth_order", "2",
           "--stn_warmup_epochs", "3", "--stn_ramp_epochs", "8",
           "--stn_grad_clip", "0.5"])
         if stn == "unet" else
         ["--synthetic_fresh_affine", "--lambda_smooth", "0.1",
          "--stn_warmup_epochs", "3", "--stn_ramp_epochs", "5",
          "--stn_grad_clip", "1.0"]) + [
        "--stn_lr", "1e-3", "--stn_beta1", "0.9",
        "--n_epochs", str(e1), "--n_epochs_decay", str(e1d),
        "--save_epoch_freq", "10000", "--print_freq", "100000",
        "--display_freq", "1000000", "--no_html",
        "--ngf", "32", "--ndf", "32", "--stn_ngf", "16",
        "--stn_depth", "6" if res >= 256 else "4",
    ] + (["--bf16"] if res >= 256 and int(os.environ.get("SCIENCE_TPU", "0"))
         else []))
        dataset = create_dataset(opt)
        model = create_model(opt)
        model.setup(opt)
        return opt, dataset, model

    opt, dataset, model = build(seed)

    import copy

    from nemar_tpu.data.synthetic_dataset import SyntheticDataset

    # held-out eval set is pinned to the BASE seed regardless of gate
    # restarts: the task stays fixed, only the trajectory draw changes
    eval_opt = copy.deepcopy(opt)
    eval_opt.seed = seed + 1000
    ds_ho = SyntheticDataset(eval_opt)
    ho_items = [ds_ho[i] for i in range(16)]

    def pack(items):
        return (
            np.stack([it["A"] for it in items]),
            np.stack([it["B"] for it in items]),
            [M.registration_gt_flow(it["theta_gt"], res, res) for it in items],
        )

    packs = {"tr": pack([dataset.dataset[i] for i in range(16)]),
             "ho": pack(ho_items)}

    f = open("/tmp/science_final{}.jsonl".format(tag), "w")

    def evaluate(tag, epoch):
        rec = {"phase": tag, "epoch": epoch}
        for key, (ea, eb, gts) in packs.items():
            model.set_input({"A": ea, "B": eb, "A_paths": ["e"] * len(ea)})
            out = model.forward()
            flow = np.asarray(out["flow"])
            reg = np.asarray(out["reg_fakeB"])
            epe = float(np.mean([M.epe_px(flow[j], gts[j], res, res)
                                 for j in range(len(gts))]))
            epe0 = float(np.mean([
                M.epe_px(np.zeros_like(g), g, res, res) for g in gts]))
            # direction cosines (round-4 diagnostics): 'cos' matches the
            # adversarial gate's mean-vector form; 'pcos' is per-pixel —
            # distinguishes "globally right, locally noisy" from "antiparallel"
            cos, pcos = [], []
            for j in range(len(gts)):
                pv, gv = flow[j].mean((0, 1)), gts[j].mean((0, 1))
                den = np.linalg.norm(pv) * np.linalg.norm(gv)
                if den > 1e-8:
                    cos.append(float(pv @ gv / den))
                num = (flow[j] * gts[j]).sum(-1)
                dn = (np.linalg.norm(flow[j], axis=-1)
                      * np.linalg.norm(gts[j], axis=-1) + 1e-8)
                pcos.append(float((num / dn).mean()))
            rec.update({
                f"epe_{key}": round(epe, 3), f"epe0_{key}": round(epe0, 3),
                f"flow_{key}": round(float(np.mean(np.abs(flow))) * res / 2, 3),
                f"ncc_{key}": round(M.ncc(reg, eb), 4),
                f"cos_{key}": round(float(np.mean(cos)) if cos else 0.0, 3),
                f"pcos_{key}": round(float(np.mean(pcos)), 3),
            })
        f.write(json.dumps(rec) + "\n")
        f.flush()
        print(rec, flush=True)
        return rec

    t0 = time.time()
    start_epoch = 1
    if gate is not None:
        ge, gth = gate
        restart = 0
        while True:
            rec = None
            for epoch in range(1, ge + 1):
                model.set_epoch(epoch)
                for data in dataset:
                    model.set_input(data)
                    model.optimize_parameters()
                model.update_learning_rate(epoch)
                if epoch % 5 == 0 or epoch == ge:
                    rec = evaluate(f"P1_gate{restart}", epoch)
            if rec["pcos_ho"] >= gth or restart >= 8:
                f.write(json.dumps({"phase": "gate_pass", "restart": restart,
                                    "pcos_ho": rec["pcos_ho"],
                                    "forced": rec["pcos_ho"] < gth}) + "\n")
                f.flush()
                start_epoch = ge + 1
                break
            restart += 1
            f.write(json.dumps({"phase": "gate_fail", "restart": restart - 1,
                                "pcos_ho": rec["pcos_ho"],
                                "next_seed": seed + 100000 * restart}) + "\n")
            f.flush()
            print(f"gate FAIL (pcos_ho {rec['pcos_ho']}) -> restart {restart}",
                  flush=True)
            opt, dataset, model = build(seed + 100000 * restart)
            packs["tr"] = pack([dataset.dataset[i] for i in range(16)])
    for epoch in range(start_epoch, e1 + e1d + 1):
        model.set_epoch(epoch)
        for data in dataset:
            model.set_input(data)
            model.optimize_parameters()
        model.update_learning_rate(epoch)
        if epoch % 5 == 0 or epoch == e1 + e1d:
            evaluate("P1_joint", epoch)
    model.save_networks("latest")

    # Phase 2: R-refinement against the frozen translator, flat lr.
    model.freeze_g = True
    model.stn_warmup = 0
    model.stn_ramp = 0
    model._train_step = __import__("jax").jit(
        model._train_step_impl, donate_argnums=(0,)
    )
    for epoch in range(1, e2 + 1):
        model.set_epoch(e1)  # schedules (warm-up/ramp) pinned past ramp
        # Refinement needs a REAL learning rate: by e1+e1d the P1 schedule
        # has decayed current_lr to ~0, and update_learning_rate is never
        # called here — round-3 audit: every earlier "refine" phase ran at
        # lr=0 and was inert (P2 rows identical to the last P1 row in all
        # committed science logs). Restore the peak LR and decay it
        # linearly to 0 across the refine epochs.
        model.current_lr = opt.lr * (1.0 - (epoch - 1) / max(e2, 1))
        for data in dataset:
            model.set_input(data)
            model.optimize_parameters()
        if epoch % 3 == 0 or epoch == e2:
            epe = evaluate("P2_refine", epoch)["epe_ho"]
    model.save_networks("latest_refined")
    print(json.dumps({"config": f"final{tag}", "final_epe_ho_px": epe,
                      "minutes": round((time.time() - t0) / 60, 1)}))
    f.close()


if __name__ == "__main__":
    main()
