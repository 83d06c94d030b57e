#!/usr/bin/env python
"""Training entry point (reference train.py — SURVEY.md §4.1).

    python train.py --dataroot ./datasets/xyz --name run1 --model nemar \
                    --stn_type unet

Same layer traversal as the reference (options -> data -> model -> epoch
loop with display/print/save frequencies -> per-epoch LR step), TPU-native
execution underneath: the model's optimize_parameters() is one jitted XLA
program (optionally --steps_per_execution fused steps per dispatch), batches
are host-prefetched numpy transferred once per step, and losses are only
pulled to host at --print_freq boundaries (avoids per-step device syncs).
"""

import time

from nemar_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from nemar_tpu.data import create_dataset
from nemar_tpu.models import create_model
from nemar_tpu.options import TrainOptions
from nemar_tpu.utils.visualizer import Visualizer


def main():
    opt = TrainOptions().parse()
    dataset = create_dataset(opt)
    dataset_size = len(dataset)
    print(f"The number of training images = {dataset_size}")

    model = create_model(opt)
    model.setup(opt)
    visualizer = Visualizer(opt)
    total_iters = 0

    profiling = bool(getattr(opt, "profile_dir", ""))
    if profiling:
        import jax

        jax.profiler.start_trace(opt.profile_dir)

    import contextlib

    import jax

    guard = getattr(opt, "transfer_guard", "allow")
    guard_ctx = (
        jax.transfer_guard(guard) if guard != "allow" else contextlib.nullcontext()
    )

    spe = max(1, getattr(opt, "steps_per_execution", 1))
    with guard_ctx:
        _train_epochs(opt, dataset, dataset_size, model, visualizer,
                      total_iters, spe)

    if profiling:
        import jax

        jax.profiler.stop_trace()


def _train_epochs(opt, dataset, dataset_size, model, visualizer, total_iters, spe):
    for epoch in range(opt.epoch_count, opt.n_epochs + opt.n_epochs_decay + 1):
        model.set_epoch(epoch)
        epoch_start_time = time.time()
        iter_data_time = time.time()
        epoch_iter = 0
        visualizer.reset()

        pending = []
        for i, data in enumerate(dataset):
            iter_start_time = time.time()
            t_data = iter_start_time - iter_data_time

            total_iters += opt.batch_size
            epoch_iter += opt.batch_size

            if spe > 1:
                pending.append(data)
                if len(pending) < spe:
                    iter_data_time = time.time()
                    continue
                model.optimize_parameters_scan(pending)
                pending = []
            else:
                model.set_input(data)
                model.optimize_parameters()

            # freq <= 0 disables the periodic action (reference semantics
            # only define positive freqs; 0 would crash the modulo)
            if opt.display_freq > 0 and (
                    total_iters % opt.display_freq < opt.batch_size * spe):
                model.forward()
                visualizer.display_current_results(
                    model.get_current_visuals(), epoch, True
                )

            if opt.print_freq > 0 and (
                    total_iters % opt.print_freq < opt.batch_size * spe):
                losses = model.get_current_losses()  # device sync point
                t_comp = (time.time() - iter_start_time) / opt.batch_size
                visualizer.print_current_losses(epoch, epoch_iter, losses, t_comp, t_data)
                visualizer.plot_current_losses(
                    epoch, float(epoch_iter) / max(dataset_size, 1), losses
                )

            if opt.save_latest_freq > 0 and (
                    total_iters % opt.save_latest_freq < opt.batch_size * spe):
                print(f"saving the latest model (epoch {epoch}, total_iters {total_iters})")
                save_suffix = f"iter_{total_iters}" if opt.save_by_iter else "latest"
                model.save_networks(save_suffix)

            iter_data_time = time.time()

        if pending:
            # flush the tail when spe does not divide the epoch's batch count
            # (otherwise those batches would silently never train; the
            # shorter stack costs one extra compile, once per tail length)
            model.optimize_parameters_scan(pending)
            pending = []

        if opt.save_epoch_freq > 0 and epoch % opt.save_epoch_freq == 0:
            print(f"saving the model at the end of epoch {epoch}, iters {total_iters}")
            model.save_networks("latest")
            model.save_networks(epoch)

        print(
            f"End of epoch {epoch} / {opt.n_epochs + opt.n_epochs_decay}"
            f" \t Time Taken: {time.time() - epoch_start_time:.0f} sec"
        )
        model.update_learning_rate(epoch)


if __name__ == "__main__":
    main()
