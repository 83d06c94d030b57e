"""Real-data-readiness probe (VERDICT r2 item 9).

Exercises the FILE-BASED path end to end: generates a ~50-pair
pseudo-multimodal PNG dataset on disk (IR-like grayscale A, misaligned by
a known affine; RGB-like smooth-remapped B at reference geometry — 8-bit
quantized like real data), then trains the v7_unet recipe through
--dataset_mode multimodal (shared-params loader, PIL decode, normalize)
and reports held-out EPE/NCC against the saved ground-truth affines.

This proves the multimodal loader + recipe train together — the synthetic
in-memory generator is bypassed entirely.

Usage: python scripts/science_realdata.py [epochs] [res] [n_train]
Writes docs/science/science_realdata.jsonl
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

import numpy as np
from PIL import Image


def generate(root, n_train=50, n_test=12, res=64, misalign=0.05, seed=0):
    """Write {root}/{train,test}{A,B}/*.png + gt.json (thetas, center-origin
    pixel maps — the metrics.registration_gt_flow convention)."""
    from nemar_tpu.data.synthetic_dataset import SyntheticDataset

    class O:  # minimal opt for the generator internals
        pass

    gts = {}
    rng_global = np.random.default_rng(seed)
    for phase, n, seed_off in (("train", n_train, 0), ("test", n_test, 10_000)):
        for d in (f"{phase}A", f"{phase}B"):
            os.makedirs(os.path.join(root, d), exist_ok=True)
        for i in range(n):
            rng = np.random.default_rng(seed * 100003 + seed_off + i)
            pad = int(np.ceil(misalign * res * 2.5))
            rp = res + 2 * pad
            # scene via the dataset's own octave generator
            scene = SyntheticDataset._scene(
                SyntheticDataset.__new__(SyntheticDataset), rng, rp)
            b_scene = scene[pad:pad + res, pad:pad + res]
            b = SyntheticDataset._colorize(b_scene, 3, invert=True,
                                           style="smooth")
            m = misalign * res
            angle = rng.uniform(-misalign, misalign)
            tx, ty = rng.uniform(-m, m, size=2)
            ca, sa = np.cos(angle), np.sin(angle)
            c = rp / 2.0
            a_img = Image.fromarray((scene * 255).astype(np.uint8)).transform(
                (rp, rp), Image.AFFINE,
                (ca, -sa, c - ca * c + sa * c + tx,
                 sa, ca, c - sa * c - ca * c + ty),
                resample=Image.BILINEAR, fillcolor=0)
            a_scene = np.asarray(a_img, np.float32)[pad:pad + res,
                                                    pad:pad + res] / 255.0
            name = f"{i:05d}.png"
            Image.fromarray((a_scene * 255).astype(np.uint8), "L").save(
                os.path.join(root, f"{phase}A", name))
            Image.fromarray((np.clip(b, 0, 1) * 255).astype(np.uint8)).save(
                os.path.join(root, f"{phase}B", name))
            gts[f"{phase}/{name}"] = [[float(ca), float(-sa), float(tx)],
                                      [float(sa), float(ca), float(ty)]]
    with open(os.path.join(root, "gt.json"), "w") as f:
        json.dump(gts, f)


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n_train = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    root = ("/tmp/pseudo_mm" + (f"_{n_train}" if n_train != 50 else "")
            + (f"_r{res}" if res != 64 else ""))
    if not os.path.exists(os.path.join(root, "gt.json")):
        print("generating pseudo-multimodal dataset...", flush=True)
        generate(root, n_train=n_train, res=res)

    from nemar_tpu.data import create_dataset
    from nemar_tpu.models import create_model
    from nemar_tpu.options import TrainOptions
    from nemar_tpu.utils import metrics as M

    half = epochs // 3
    # Round-5 (VERDICT r4 item 5): resolution-scaled recipe on the
    # file-based path, mirroring science_final — the capture-range law
    # (round 4) scales the recon pyramid with res so the coarsest cell
    # tracks the misalignment (identity EPE grows with res at fixed
    # RELATIVE misalign), and >=128² needs the tanh flow bound + order-2
    # TV (round-3 science_256_direct: unbounded ultra-coarse heads
    # random-walk; order-1 TV penalizes affine magnitude directly).
    pyr = 3 + max(0, int(np.log2(res / 64)))
    res_flags = []
    if res >= 128:
        res_flags += ["--stn_bounded_flow", str(round(0.05 * 2 * 2.5, 3)),
                      "--stn_smooth_order", "2"]
    if res >= 256:
        res_flags += ["--lambda_smooth", "40"]
        if int(os.environ.get("SCIENCE_TPU", "0")):
            res_flags += ["--bf16"]
    opt = TrainOptions().parse([
        "--dataroot", root, "--dataset_mode", "multimodal",
        "--model", "nemar", "--stn_type", "unet",
        "--name", "realdata", "--checkpoints_dir", f"/tmp/realdata_ckpt_r{res}",
        "--preprocess", "none",
        "--crop_size", str(res), "--load_size", str(res),
        "--batch_size", "10", "--no_flip",
        "--recon_pyramid", str(pyr), "--border_mask", "--stn_multiscale",
        "--stn_level_scale", "0.25",
        "--stn_warmup_epochs", "3", "--stn_ramp_epochs", "8",
        "--stn_grad_clip", "0.5",
        "--stn_lr", "1e-3", "--stn_beta1", "0.9",
        "--n_epochs", str(epochs - half), "--n_epochs_decay", str(half),
        "--save_epoch_freq", "10000", "--print_freq", "100000",
        "--display_freq", "1000000", "--no_html",
        "--ngf", "32", "--ndf", "32", "--stn_ngf", "16",
        "--stn_depth", "6" if res >= 256 else "4",
    ] + res_flags)
    dataset = create_dataset(opt)
    model = create_model(opt)
    model.setup(opt)
    print(f"file-based dataset: {len(dataset)} pairs", flush=True)

    # held-out eval from the test split (files + saved thetas)
    gts_all = json.load(open(os.path.join(root, "gt.json")))
    names = sorted(n for n in gts_all if n.startswith("test/"))
    ea, eb, gts = [], [], []
    for nm in names:
        f = nm.split("/")[1]
        a = np.asarray(Image.open(os.path.join(root, "testA", f)),
                       np.float32)[..., None] / 127.5 - 1.0
        b = np.asarray(Image.open(os.path.join(root, "testB", f)),
                       np.float32) / 127.5 - 1.0
        ea.append(a)
        eb.append(b)
        gts.append(M.registration_gt_flow(
            np.asarray(gts_all[nm], np.float32), res, res))
    ea, eb = np.stack(ea), np.stack(eb)

    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), f"docs/science/science_realdata{'_r%d' % res if res != 64 else ''}.jsonl")
    f = open(out_path, "a")
    # arm header: the file accumulates multiple arms (append mode); each
    # run announces its budget/data config so trajectories don't interleave
    # ambiguously (epoch counters restart per arm).
    f.write(json.dumps({"run": f"e{epochs}_n{n_train}_r{res}"}) + "\n")
    f.flush()

    def evaluate(epoch):
        model.set_input({"A": ea, "B": eb, "A_paths": names})
        out = model.forward()
        flow = np.asarray(out["flow"])
        reg = np.asarray(out["reg_fakeB"])
        epe = float(np.mean([M.epe_px(flow[j], gts[j], res, res)
                             for j in range(len(gts))]))
        epe0 = float(np.mean([M.epe_px(np.zeros_like(g), g, res, res)
                              for g in gts]))
        rec = {"epoch": epoch, "epe_ho": round(epe, 3),
               "epe0": round(epe0, 3),
               "flow_px": round(float(np.mean(np.abs(flow))) * res / 2, 3),
               "ncc": round(M.ncc(reg, eb), 4),
               "l1": round(M.l1(reg, eb), 4),
               "min": round((time.time() - t0) / 60, 1)}
        print(rec, flush=True)
        f.write(json.dumps(rec) + "\n")
        f.flush()
        return epe

    t0 = time.time()
    for epoch in range(1, epochs + 1):
        model.set_epoch(epoch)
        for data in dataset:
            model.set_input(data)
            model.optimize_parameters()
        model.update_learning_rate(epoch)
        # sparser evals at 256²: every eval is a D2H readback, and during
        # relay flaps (round-5) each readback is a hang opportunity that
        # kills the supervisor attempt
        if epoch % (10 if res >= 256 else 5) == 0 or epoch == epochs:
            evaluate(epoch)

    # Phase 2: R-refinement against the frozen translator (science_final
    # P2, incl. the round-3 LR fix: P1's linear schedule has decayed
    # current_lr to ~0 by now — without the reset this phase is inert).
    import jax as _jax

    e2 = max(epochs // 4, 6)
    model.freeze_g = True
    model.stn_warmup = 0
    model.stn_ramp = 0
    model._train_step = _jax.jit(model._train_step_impl, donate_argnums=(0,))
    epe = None
    for epoch in range(1, e2 + 1):
        model.set_epoch(epochs)
        model.current_lr = opt.lr * (1.0 - (epoch - 1) / e2)
        for data in dataset:
            model.set_input(data)
            model.optimize_parameters()
        if epoch % (6 if res >= 256 else 3) == 0 or epoch == e2:
            epe = evaluate(epochs + epoch)
    print(json.dumps({"config": f"realdata_pipeline_n{n_train}_r{res}",
                      "pairs": len(dataset), "final_epe_px": epe}))
    f.close()


if __name__ == "__main__":
    main()
