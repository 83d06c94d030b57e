#!/usr/bin/env python
"""Test/inference entry point (reference test.py — SURVEY.md §4.3).

    python test.py --dataroot ./datasets/xyz --name run1 --model nemar

Loads the checkpoint at --epoch, runs the forward pass over the dataset
(batch 1, ordered, no flip — forced by TestOptions), and writes an HTML
gallery of visuals to {results_dir}/{name}/{phase}_{epoch}/index.html.
"""

import os

from nemar_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from nemar_tpu.data import create_dataset
from nemar_tpu.models import create_model
from nemar_tpu.options import TestOptions
from nemar_tpu.utils import html as html_mod
from nemar_tpu.utils.visualizer import save_images


def main():
    opt = TestOptions().parse()
    dataset = create_dataset(opt)
    model = create_model(opt)
    model.setup(opt)
    if opt.eval:
        model.eval()

    web_dir = os.path.join(opt.results_dir, opt.name, f"{opt.phase}_{opt.epoch}")
    if opt.load_iter > 0:
        web_dir = f"{web_dir}_iter{opt.load_iter}"
    print(f"creating web directory {web_dir}")
    webpage = html_mod.HTML(
        web_dir,
        f"Experiment = {opt.name}, Phase = {opt.phase}, Epoch = {opt.epoch}",
    )

    evaluating = getattr(opt, "eval_registration", False)
    metrics_acc = {"ncc": [], "psnr": [], "l1": [], "epe_px": []}
    for i, data in enumerate(dataset):
        if i >= opt.num_test:
            break
        model.set_input(data)
        model.test()
        visuals = model.get_current_visuals()
        img_path = model.get_image_paths()
        if i % 5 == 0:
            print(f"processing ({i:04d})-th image... {img_path}")
        save_images(
            webpage, visuals, img_path,
            aspect_ratio=opt.aspect_ratio, width=opt.display_winsize,
        )
        if evaluating and "reg_fakeB" in visuals:
            import numpy as np

            from nemar_tpu.utils import metrics as M

            reg, real = visuals["reg_fakeB"], visuals["real_B"]
            metrics_acc["ncc"].append(M.ncc(reg, real))
            metrics_acc["psnr"].append(M.psnr(reg, real))
            metrics_acc["l1"].append(M.l1(reg, real))
            flow = getattr(model, "last_flow", None)
            if flow is not None and "theta_gt" in data:
                h, w = reg.shape[1:3]
                for j in range(reg.shape[0]):
                    gt = M.registration_gt_flow(np.asarray(data["theta_gt"][j]), h, w)
                    metrics_acc["epe_px"].append(
                        M.epe_px(np.asarray(flow[j]), gt, h, w)
                    )
    webpage.save()

    if evaluating:
        import json

        import numpy as np

        summary = {
            k: round(float(np.mean(v)), 4) for k, v in metrics_acc.items() if v
        }
        print(f"registration eval: {summary}")
        with open(os.path.join(web_dir, "eval.json"), "w") as f:
            json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
