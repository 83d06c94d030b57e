#!/usr/bin/env python
"""Test/inference entry point (reference test.py — SURVEY.md §4.3).

    python test.py --dataroot ./datasets/xyz --name run1 --model nemar

Loads the checkpoint at --epoch, runs the forward pass over the dataset
(batch 1, ordered, no flip — forced by TestOptions), and writes an HTML
gallery of visuals to {results_dir}/{name}/{phase}_{epoch}/index.html.
"""

import os

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
    webpage.save()


if __name__ == "__main__":
    main()
