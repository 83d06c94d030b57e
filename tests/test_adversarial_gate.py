"""Full-adversarial registration gate (VERDICT r1 item 3).

Runs the round-2 converging recipe (docs/science) at its PROVEN operating
point — 64², 192 border-cue-free smooth-appearance pairs, damped
multiscale UNet STN, joint GAN — shortened to the direction-lock
milestone: by epoch 12 the full-size run's HELD-OUT field direction
cosine measured 0.93 with ~1.2 px mean flow (the full 85-epoch +
frozen-G-refine run reaches held-out EPE 1.44 px vs 2.55 identity;
trajectory in docs/science/science_final.jsonl).

~12-15 min CPU, so opt-in: run with NEMAR_SLOW_TESTS=1. The default CI
gate for the registration machinery is tests/test_registration_gate.py
(direct photometric fit, sub-px in ~3 min). A 32²-miniature of THIS test
does not converge in CI time (direction lock needs ~2000 samples at the
64² operating point; the 32² dynamics differ — measured round 2).

Round 3 (VERDICT r2 item 8): a 48²/96-pair miniature DOES lock — probed
at two seeds (scripts/probe_adv_gate48.py): cos reaches 0.91 by epoch
15-19, ~6-9 min CPU. test_adversarial_direction_locks_48 below runs it
DEFAULT-ON at epoch 22 with margins (cos > 0.5, mag > 0.4 px), so a
regression in the adversarial dynamics now fails ordinary CI; the 64²
full-size gate stays under the env flag.
"""

import copy
import os

import numpy as np
import pytest

RES = 64
PAIRS = 192
EPOCHS = 12


@pytest.mark.skipif(not os.environ.get("NEMAR_SLOW_TESTS"),
                    reason="~12-15 min CPU; set NEMAR_SLOW_TESTS=1")
def test_adversarial_registration_direction_locks(tmp_path):
    from nemar_tpu.data import create_dataset
    from nemar_tpu.data.synthetic_dataset import SyntheticDataset
    from nemar_tpu.models import create_model
    from nemar_tpu.options import TrainOptions
    from nemar_tpu.utils import metrics as M

    opt = TrainOptions().parse([
        "--dataroot", "__synthetic__", "--dataset_mode", "synthetic",
        "--model", "nemar", "--stn_type", "unet",
        "--name", "adv_gate", "--checkpoints_dir", str(tmp_path),
        "--crop_size", str(RES), "--load_size", str(RES),
        "--batch_size", "8", "--synthetic_size", str(PAIRS),
        "--synthetic_pad_crop", "--synthetic_appearance", "smooth",
        "--recon_pyramid", "3", "--border_mask",
        "--stn_multiscale", "--stn_level_scale", "0.25",
        "--stn_warmup_epochs", "3", "--stn_ramp_epochs", "8",
        "--stn_grad_clip", "0.5",
        "--stn_lr", "1e-3", "--stn_beta1", "0.9",
        "--n_epochs", str(EPOCHS), "--n_epochs_decay", "0",
        "--save_epoch_freq", "10000", "--print_freq", "100000",
        "--display_freq", "1000000", "--no_html",
        "--ngf", "32", "--ndf", "32", "--stn_ngf", "16", "--stn_depth", "4",
    ])
    dataset = create_dataset(opt)
    model = create_model(opt)
    model.setup(opt)

    eval_opt = copy.deepcopy(opt)
    eval_opt.seed = 1000
    ds_ho = SyntheticDataset(eval_opt)
    ho = [ds_ho[i] for i in range(12)]
    ea = np.stack([it["A"] for it in ho])
    eb = np.stack([it["B"] for it in ho])
    gts = [M.registration_gt_flow(it["theta_gt"], RES, RES) for it in ho]

    for epoch in range(1, EPOCHS + 1):
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
    cos = float(np.mean(cos))
    mag_px = float(np.mean(np.abs(flow))) * RES / 2
    # direction-lock milestone (measured 0.93 / 1.2 px at this epoch)
    assert cos > 0.6, f"held-out direction cos {cos:.2f} (mag {mag_px:.2f}px)"
    assert mag_px > 0.5, f"field magnitude {mag_px:.2f}px — not moving"


def _run_gate(tmp_path, res, pairs, epochs, ngf=32):
    from nemar_tpu.data import create_dataset
    from nemar_tpu.data.synthetic_dataset import SyntheticDataset
    from nemar_tpu.models import create_model
    from nemar_tpu.options import TrainOptions
    from nemar_tpu.utils import metrics as M

    opt = TrainOptions().parse([
        "--dataroot", "__synthetic__", "--dataset_mode", "synthetic",
        "--model", "nemar", "--stn_type", "unet",
        "--name", f"adv_gate{res}", "--checkpoints_dir", str(tmp_path),
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
        "--ngf", str(ngf), "--ndf", str(ngf), "--stn_ngf", "16",
        "--stn_depth", "4",
    ])
    dataset = create_dataset(opt)
    model = create_model(opt)
    model.setup(opt)

    eval_opt = copy.deepcopy(opt)
    eval_opt.seed = 1000
    ds_ho = SyntheticDataset(eval_opt)
    ho = [ds_ho[i] for i in range(12)]
    ea = np.stack([it["A"] for it in ho])
    eb = np.stack([it["B"] for it in ho])
    gts = [M.registration_gt_flow(it["theta_gt"], res, res) for it in ho]

    def eval_now():
        model.set_input({"A": ea, "B": eb, "A_paths": ["e"] * len(ea)})
        out = model.forward()
        flow = np.asarray(out["flow"])
        cos = []
        for j in range(len(gts)):
            pv, gv = flow[j].mean((0, 1)), gts[j].mean((0, 1))
            den = np.linalg.norm(pv) * np.linalg.norm(gv)
            if den > 1e-8:
                cos.append(float(pv @ gv / den))
        return (float(np.mean(cos)),
                float(np.mean(np.abs(flow))) * res / 2)

    # The adversarial end-game makes the direction cos OSCILLATE epoch to
    # epoch even after lock (probe_adv_gate48.jsonl: 0.05 -> 0.45 -> 0.51
    # -> 0.91 -> 0.68 over epochs 16-20) — the G/R race keeps trading the
    # residual signal. Gate on the BEST late-window eval, not a single
    # epoch: a decayed/antiparallel/exploded field fails at EVERY epoch,
    # while a locked-but-oscillating one passes.
    trail = []
    for epoch in range(1, epochs + 1):
        model.set_epoch(epoch)
        for data in dataset:
            model.set_input(data)
            model.optimize_parameters()
        model.update_learning_rate(epoch)
        if epoch > epochs - 6:
            trail.append(eval_now())
    cos = max(c for c, _ in trail)
    mag = max(m for _, m in trail)
    return cos, mag, trail


def test_adversarial_direction_locks_48(tmp_path):
    """DEFAULT-ON miniature of the adversarial gate (48², 96 pairs, 22
    epochs ≈ 6-9 min CPU). Both probed seeds locked cos > 0.9 by epoch
    15-19 (scripts/probe_adv_gate48.py logs); the gate takes the best of
    the last 6 epochs because the locked cos oscillates (see _run_gate),
    and the 0.5/0.4 margins still fail hard on the round-2 failure modes
    (field decay to zero, antiparallel lock, head blow-up)."""
    cos, mag_px, trail = _run_gate(tmp_path, 48, 96, 22)
    assert cos > 0.5, f"held-out direction cos {cos:.2f} (trail {trail})"
    assert mag_px > 0.4, f"field magnitude {mag_px:.2f}px — not moving"
