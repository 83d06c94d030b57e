#!/usr/bin/env python
"""Registration-convergence science harness (VERDICT r1 item 3).

Trains full adversarial NeMAR on the synthetic misaligned pairs (CPU,
fp32) under a named intervention config and tracks flow EPE vs the known
ground-truth warp. Goal: EPE < 1.5 px in the FULL adversarial setting.

Usage: python scripts/science_registration.py CONFIG [epochs] [res]
Writes /tmp/science_{CONFIG}.jsonl (one line per eval) + final summary.
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

CONFIGS = {
    # round-1 behavior (control)
    "control": [],
    # round-2 full intervention stack
    "full": ["--stn_multiscale", "--gan_warmup_epochs", "30",
             "--gan_ramp_epochs", "20", "--border_mask",
             "--stn_lr", "1e-3", "--stn_beta1", "0.9"],
    "no_mask": ["--stn_multiscale", "--gan_warmup_epochs", "30",
                "--gan_ramp_epochs", "20",
                "--stn_lr", "1e-3", "--stn_beta1", "0.9"],
    "no_warmup": ["--stn_multiscale", "--border_mask",
                  "--stn_lr", "1e-3", "--stn_beta1", "0.9"],
    "fake_src": ["--stn_multiscale", "--gan_warmup_epochs", "30",
                 "--gan_ramp_epochs", "20", "--border_mask",
                 "--stn_lr", "1e-3", "--stn_beta1", "0.9",
                 "--stn_field_source", "fake"],
    "no_ms": ["--gan_warmup_epochs", "30", "--gan_ramp_epochs", "20",
              "--border_mask", "--stn_lr", "1e-3", "--stn_beta1", "0.9"],
    # tanh-bounded field: explosion impossible by construction
    "full_bounded": ["--stn_multiscale", "--gan_warmup_epochs", "30",
                     "--gan_ramp_epochs", "20", "--border_mask",
                     "--stn_lr", "1e-3", "--stn_beta1", "0.9",
                     "--stn_bounded_flow", "0.2"],
    # pure recon+smooth all the way (isolates the registration machinery)
    "r_only": ["--stn_multiscale", "--lambda_GAN", "0",
               "--stn_lr", "1e-3", "--stn_beta1", "0.9"],
    # STAGED (round-2 second iteration): freeze R while G learns the
    # appearance map — before that, the photometric flow gradient is noise
    # (measured: heads explode to 50+ px within 20 steps)
    "staged": ["--stn_warmup_epochs", "20", "--gan_warmup_epochs", "60",
               "--gan_ramp_epochs", "20", "--border_mask", "--stn_multiscale",
               "--stn_lr", "1e-3", "--stn_beta1", "0.9"],
    "staged_no_ms": ["--stn_warmup_epochs", "20", "--gan_warmup_epochs", "60",
                     "--gan_ramp_epochs", "20", "--border_mask",
                     "--stn_lr", "1e-3", "--stn_beta1", "0.9"],
    "staged_bounded": ["--stn_warmup_epochs", "20", "--gan_warmup_epochs", "60",
                       "--gan_ramp_epochs", "20", "--border_mask",
                       "--stn_multiscale", "--stn_bounded_flow", "0.2",
                       "--stn_lr", "1e-3", "--stn_beta1", "0.9"],
    "staged_low_lr": ["--stn_warmup_epochs", "20", "--gan_warmup_epochs", "60",
                      "--gan_ramp_epochs", "20", "--border_mask",
                      "--stn_multiscale"],
    # v2: damped multiscale heads + R lr ramp + grad clip (the undamped
    # composed heads explode within 16 steps of unfreezing at lr 1e-3)
    "v2_damped": ["--stn_warmup_epochs", "20", "--gan_warmup_epochs", "60",
                  "--gan_ramp_epochs", "20", "--border_mask",
                  "--stn_multiscale", "--stn_level_scale", "0.25",
                  "--stn_ramp_epochs", "10", "--stn_grad_clip", "1.0",
                  "--stn_lr", "1e-3", "--stn_beta1", "0.9"],
    "v2_damped_lowlr": ["--stn_warmup_epochs", "20", "--gan_warmup_epochs", "60",
                        "--gan_ramp_epochs", "20", "--border_mask",
                        "--stn_multiscale", "--stn_level_scale", "0.25",
                        "--stn_ramp_epochs", "10", "--stn_grad_clip", "1.0",
                        "--stn_beta1", "0.9"],
    "v2_heavy_damp": ["--stn_warmup_epochs", "20", "--gan_warmup_epochs", "60",
                      "--gan_ramp_epochs", "20", "--border_mask",
                      "--stn_multiscale", "--stn_level_scale", "0.1",
                      "--stn_ramp_epochs", "20", "--stn_grad_clip", "0.5",
                      "--stn_lr", "1e-3", "--stn_beta1", "0.9"],
    # v3: recon pyramid (multi-octave photometric L1) — bilinear L1 alone is
    # blind past ~1 px; pooled octaves widen the flow's capture radius
    "v3_pyr": ["--stn_warmup_epochs", "20", "--gan_warmup_epochs", "60",
               "--gan_ramp_epochs", "20", "--border_mask", "--recon_pyramid",
               "3", "--stn_multiscale", "--stn_level_scale", "0.25",
               "--stn_ramp_epochs", "10", "--stn_grad_clip", "1.0",
               "--stn_lr", "1e-3", "--stn_beta1", "0.9"],
    # pyramid WITHOUT multiscale heads (single full-res zero-init head):
    # isolates whether the pyramid alone gives the basin the heads were for
    "v3_pyr_no_ms": ["--stn_warmup_epochs", "20", "--gan_warmup_epochs", "60",
                     "--gan_ramp_epochs", "20", "--border_mask",
                     "--recon_pyramid", "3", "--stn_grad_clip", "1.0",
                     "--stn_ramp_epochs", "10",
                     "--stn_lr", "1e-3", "--stn_beta1", "0.9"],
    # pyramid, R-only control (ceiling check for the pyramid lever)
    "v3_pyr_r_only": ["--recon_pyramid", "3", "--lambda_GAN", "0",
                      "--stn_multiscale", "--stn_level_scale", "0.25",
                      "--stn_lr", "1e-3", "--stn_beta1", "0.9"],
    # v4: kill the border cue (--synthetic_pad_crop). Without it the
    # generator can read the misalignment off A's zero-fill margins, align
    # internally, and the joint optimum drives the field to zero — real
    # multimodal data has no such cue, so v1-v3 were fighting a dataset
    # artifact, not the method.
    "v4_padcrop": ["--synthetic_pad_crop", "--recon_pyramid", "3",
                   "--stn_warmup_epochs", "20", "--gan_warmup_epochs", "60",
                   "--gan_ramp_epochs", "20", "--border_mask",
                   "--stn_multiscale", "--stn_level_scale", "0.25",
                   "--stn_ramp_epochs", "10", "--stn_grad_clip", "1.0",
                   "--stn_lr", "1e-3", "--stn_beta1", "0.9"],
    # undamped heads: the pyramid supplies the smooth basin the damping was
    # compensating for; clip alone guards the blow-up
    "v4_light": ["--synthetic_pad_crop", "--recon_pyramid", "3",
                 "--stn_warmup_epochs", "20", "--gan_warmup_epochs", "60",
                 "--gan_ramp_epochs", "20", "--border_mask",
                 "--stn_multiscale", "--stn_grad_clip", "1.0",
                 "--stn_lr", "1e-3", "--stn_beta1", "0.9"],
    "v4_r_only": ["--synthetic_pad_crop", "--recon_pyramid", "3",
                  "--lambda_GAN", "0", "--stn_multiscale",
                  "--stn_lr", "1e-3", "--stn_beta1", "0.9"],
    # v5: JOINT training from scratch (no GAN warm-up). The staged schedule
    # is self-defeating: with the GAN off, G's L1-optimal answer under
    # unknown misalignment is a BLURRED appearance map, which removes the
    # photometric slope R needs — the field decays to zero before the GAN
    # (the sharpening mechanism) arrives. The paper trains D/G/R jointly;
    # with the border cue dead (pad_crop) G can no longer absorb geometry.
    "v5_joint": ["--synthetic_pad_crop", "--recon_pyramid", "3",
                 "--border_mask", "--stn_multiscale",
                 "--stn_level_scale", "0.25", "--stn_ramp_epochs", "5",
                 "--stn_grad_clip", "1.0",
                 "--stn_lr", "1e-3", "--stn_beta1", "0.9"],
    # same but R frozen for the first 5 epochs (G leaves the pure-noise
    # regime first) and undamped heads after
    "v5_joint_warm": ["--synthetic_pad_crop", "--recon_pyramid", "3",
                      "--border_mask", "--stn_multiscale",
                      "--stn_warmup_epochs", "5", "--stn_ramp_epochs", "5",
                      "--stn_grad_clip", "1.0",
                      "--stn_lr", "1e-3", "--stn_beta1", "0.9"],
    # v6: fight MEMORIZATION. With only 32 train pairs, phi=0 plus a G that
    # memorizes each pair's misalignment is a GLOBAL optimum of the recon
    # loss (no border cue needed) — and evaluating on train pairs hides it.
    # v6 runs many pairs (harness: --synthetic_size via small list) and the
    # harness now evals on a HELD-OUT seed. Joint GAN from (almost) the
    # start sharpens G; pyramid gives the capture radius; pad_crop kills
    # the border cue.
    "v6_joint": ["--synthetic_pad_crop", "--recon_pyramid", "3",
                 "--border_mask", "--stn_multiscale",
                 "--stn_warmup_epochs", "3", "--stn_ramp_epochs", "5",
                 "--stn_grad_clip", "1.0", "--stn_level_scale", "0.5",
                 "--stn_lr", "1e-3", "--stn_beta1", "0.9"],
    # generalization ceiling without the GAN (blur theory control)
    "v6_r_only": ["--synthetic_pad_crop", "--recon_pyramid", "3",
                  "--lambda_GAN", "0", "--stn_multiscale",
                  "--stn_grad_clip", "1.0", "--stn_level_scale", "0.5",
                  "--stn_lr", "1e-3", "--stn_beta1", "0.9"],
    # SAME-APPEARANCE control: G's task is ~identity, so the run isolates
    # whether the adversarial/optimizer wrapper (not appearance learning)
    # breaks the otherwise-converging registration (R-only direct fit:
    # EPE 0.24-0.41 px on this content)
    "v6_same_app": ["--synthetic_pad_crop", "--synthetic_same_appearance",
                    "--recon_pyramid", "3", "--stn_multiscale",
                    "--stn_grad_clip", "1.0", "--stn_level_scale", "0.5",
                    "--stn_warmup_epochs", "3", "--stn_ramp_epochs", "5",
                    "--stn_lr", "1e-3", "--stn_beta1", "0.9"],
    # single-head arm (no multiscale): the direct fit converged WITHOUT
    # multiscale too; fewer moving parts in the adversarial setting
    "v6_single": ["--synthetic_pad_crop", "--recon_pyramid", "3",
                  "--border_mask",
                  "--stn_warmup_epochs", "3", "--stn_ramp_epochs", "5",
                  "--stn_grad_clip", "1.0",
                  "--stn_lr", "1e-3", "--stn_beta1", "0.9"],
    # v7: smooth appearance (oracle-G fit: bands stall the flow landscape)
    # + the RIGHT STN for the affine task. Oracle-G ceilings at 32²/0.08:
    # affine STN 0.41 px, unet multiscale 1.19 px — both under the 1.5 px
    # target; the remaining question is purely the adversarial wrapper.
    "v7_affine": ["--synthetic_pad_crop", "--synthetic_appearance", "smooth",
                  "--stn_type", "affine", "--recon_pyramid", "3",
                  "--border_mask", "--lambda_smooth", "0.1",
                  "--stn_warmup_epochs", "3", "--stn_ramp_epochs", "5",
                  "--stn_grad_clip", "1.0",
                  "--stn_lr", "1e-3", "--stn_beta1", "0.9"],
    "v8_affine_r_only": ["--synthetic_pad_crop", "--synthetic_appearance",
                         "smooth", "--stn_type", "affine", "--recon_pyramid",
                         "3", "--lambda_GAN", "0", "--lambda_smooth", "0.1",
                         "--stn_warmup_epochs", "3", "--stn_ramp_epochs", "5",
                         "--stn_lr", "1e-3", "--stn_beta1", "0.9"],
    "v7_unet": ["--synthetic_pad_crop", "--synthetic_appearance", "smooth",
                "--recon_pyramid", "3", "--border_mask", "--stn_multiscale",
                "--stn_level_scale", "0.25",
                "--stn_warmup_epochs", "3", "--stn_ramp_epochs", "8",
                "--stn_grad_clip", "0.5",
                "--stn_lr", "1e-3", "--stn_beta1", "0.9"],
    # v9 (round 3): the affine arm is GENERALIZATION-starved, not broken —
    # direct fits reach held-out 0.51 px with unlimited misalignment draws
    # vs 2.1 px at 192 fixed pairs (science_affine_diag.jsonl). Fresh
    # per-visit affines give the in-model run the same diversity and kill
    # the phi=0+memorizing-G optimum as a side effect.
    "v9_affine": ["--synthetic_pad_crop", "--synthetic_appearance", "smooth",
                  "--synthetic_fresh_affine",
                  "--stn_type", "affine", "--recon_pyramid", "3",
                  "--border_mask", "--lambda_smooth", "0.1",
                  "--stn_warmup_epochs", "3", "--stn_ramp_epochs", "5",
                  "--stn_grad_clip", "1.0",
                  "--stn_lr", "1e-3", "--stn_beta1", "0.9"],
    # control: fresh affines, no GAN (isolates the adversarial wrapper)
    "v9_affine_r_only": ["--synthetic_pad_crop", "--synthetic_appearance",
                         "smooth", "--synthetic_fresh_affine",
                         "--stn_type", "affine", "--recon_pyramid", "3",
                         "--lambda_GAN", "0", "--lambda_smooth", "0.1",
                         "--stn_warmup_epochs", "3", "--stn_ramp_epochs", "5",
                         "--stn_grad_clip", "1.0",
                         "--stn_lr", "1e-3", "--stn_beta1", "0.9"],
    # fresh affines for the UNet arm too (does the proven v7 recipe improve?)
    "v9_unet": ["--synthetic_pad_crop", "--synthetic_appearance", "smooth",
                "--synthetic_fresh_affine",
                "--recon_pyramid", "3", "--border_mask", "--stn_multiscale",
                "--stn_level_scale", "0.25",
                "--stn_warmup_epochs", "3", "--stn_ramp_epochs", "8",
                "--stn_grad_clip", "0.5",
                "--stn_lr", "1e-3", "--stn_beta1", "0.9"],
    # v10 (round 3): the v7 recipe transplanted verbatim to 256² DIVERGES
    # (flow saturates at ~130 px while cos_tr goes negative — sci_256 log).
    # Two scalings the 64² recipe left implicit:
    #   (a) smoothness: TV is mean |Δflow per PIXEL| in normalized units —
    #       the same physical field has 4x smaller per-px deltas at 256²,
    #       so lambda_smooth must scale ~x4 (default 10 -> 40);
    #   (b) head damping: stn_depth 6 (vs 4) adds two coarser heads whose
    #       cell size is 4x larger in px — level_scale and grad clip must
    #       shrink accordingly.
    "v10_256_damped": ["--synthetic_pad_crop", "--synthetic_appearance",
                       "smooth", "--recon_pyramid", "3", "--border_mask",
                       "--stn_multiscale", "--stn_level_scale", "0.12",
                       "--lambda_smooth", "40",
                       "--stn_warmup_epochs", "3", "--stn_ramp_epochs", "12",
                       "--stn_grad_clip", "0.25",
                       "--stn_lr", "1e-3", "--stn_beta1", "0.9"],
    # insurance arm: tanh-bounded field (0.15 normalized = 19 px, ~2x the
    # 10 px task) makes the explosion impossible by construction
    "v10_256_bounded": ["--synthetic_pad_crop", "--synthetic_appearance",
                        "smooth", "--recon_pyramid", "3", "--border_mask",
                        "--stn_multiscale", "--stn_level_scale", "0.25",
                        "--lambda_smooth", "40", "--stn_bounded_flow", "0.15",
                        "--stn_warmup_epochs", "3", "--stn_ramp_epochs", "8",
                        "--stn_grad_clip", "0.5",
                        "--stn_lr", "1e-3", "--stn_beta1", "0.9"],
}


def main():
    cfg = sys.argv[1]
    n_epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 120
    res = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    size = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    seed = int(sys.argv[5]) if len(sys.argv) > 5 else 0
    extra = CONFIGS[cfg] + (["--seed", str(seed)] if seed else [])
    if seed:
        cfg = f"{cfg}_s{seed}"
    # this host is a single weak core (~0.065 TFLOP/s): shrink widths so a
    # config finishes in minutes; the training DYNAMICS (does G absorb the
    # geometry or does R converge) are what's under test, not capacity.
    # At >=256² (run with SCIENCE_TPU=1) the STN needs proportionally more
    # down levels for the same relative receptive field, and bf16 keeps the
    # chip fed.
    small = ["--ngf", "32", "--ndf", "32", "--stn_ngf", "16",
             "--stn_depth", "6" if res >= 256 else "4",
             "--synthetic_size", str(size)]
    if res >= 256 and int(os.environ.get("SCIENCE_TPU", "0")):
        small += ["--bf16"]

    from nemar_tpu.data import create_dataset
    from nemar_tpu.models import create_model
    from nemar_tpu.options import TrainOptions
    from nemar_tpu.utils import metrics as M

    half = n_epochs // 2
    opt = TrainOptions().parse([
        "--dataroot", "__synthetic__", "--dataset_mode", "synthetic",
        "--model", "nemar", "--stn_type", "unet", "--name", f"sci_{cfg}",
        "--checkpoints_dir", f"/tmp/sci_{cfg}",
        "--crop_size", str(res), "--load_size", str(res),
        "--batch_size", "8",
        "--n_epochs", str(n_epochs - half), "--n_epochs_decay", str(half),
        "--save_epoch_freq", "10000",
        "--print_freq", "100000", "--display_freq", "1000000", "--no_html",
    ] + small + extra)
    dataset = create_dataset(opt)
    model = create_model(opt)
    model.setup(opt)

    # TWO fixed eval sets with known GT warps: TRAIN items (does training
    # itself converge?) and a HELD-OUT seed (does R generalize as a
    # registration network — the paper's claim). Train-pair eval alone is
    # blind to G/R memorizing per-sample geometry.
    import copy

    from nemar_tpu.data.synthetic_dataset import SyntheticDataset

    eval_opt = copy.deepcopy(opt)
    eval_opt.seed = getattr(opt, "seed", 0) + 1000
    ds_ho = SyntheticDataset(eval_opt)
    sets = {
        "tr": [dataset.dataset[i] for i in range(16)],
        "ho": [ds_ho[i] for i in range(16)],
    }
    packs = {}
    for key, items in sets.items():
        packs[key] = (
            np.stack([it["A"] for it in items]),
            np.stack([it["B"] for it in items]),
            [M.registration_gt_flow(it["theta_gt"], res, res) for it in items],
        )

    out_path = f"/tmp/science_{cfg}.jsonl"
    f = open(out_path, "w")

    def evaluate(epoch):
        rec = {"epoch": epoch}
        for key, (ea, eb, gts) in packs.items():
            model.set_input({"A": ea, "B": eb, "A_paths": ["e"] * len(ea)})
            out = model.forward()
            flow = np.asarray(out["flow"])
            reg = np.asarray(out["reg_fakeB"])
            epe = float(np.mean([M.epe_px(flow[j], gts[j], res, res)
                                 for j in range(len(gts))]))
            epe0 = float(np.mean([
                M.epe_px(np.zeros_like(gts[j]), gts[j], res, res)
                for j in range(len(gts))
            ]))
            # mean direction alignment: cos between per-sample mean pred
            # and mean gt vectors (+1 aligned / -1 inverted field)
            cos = []
            for j in range(len(gts)):
                pv = flow[j].mean((0, 1))
                gv = gts[j].mean((0, 1))
                den = np.linalg.norm(pv) * np.linalg.norm(gv)
                if den > 1e-8:
                    cos.append(float(pv @ gv / den))
            rec.update({
                f"epe_{key}": round(epe, 3),
                f"epe0_{key}": round(epe0, 3),
                f"flow_{key}": round(float(np.mean(np.abs(flow))) * res / 2, 3),
                f"cos_{key}": round(float(np.mean(cos)) if cos else 0.0, 3),
                f"ncc_{key}": round(M.ncc(reg, eb), 4),
                f"l1_{key}": round(M.l1(reg, eb), 4),
            })
        f.write(json.dumps(rec) + "\n")
        f.flush()
        print(rec, flush=True)
        return rec["epe_ho"]

    t0 = time.time()
    for epoch in range(1, n_epochs + 1):
        model.set_epoch(epoch)
        for data in dataset:
            model.set_input(data)
            model.optimize_parameters()
        model.update_learning_rate(epoch)
        if epoch % 5 == 0 or epoch == n_epochs:
            evaluate(epoch)
    epe = evaluate(n_epochs)
    model.save_networks("latest")  # enables a --continue_train refine phase
    print(json.dumps({"config": cfg, "final_epe_px": epe,
                      "minutes": round((time.time() - t0) / 60, 1)}))
    f.close()


if __name__ == "__main__":
    main()
