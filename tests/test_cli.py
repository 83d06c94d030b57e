"""End-to-end CLI smoke: train.py then test.py on synthetic data (CPU).

This is the reference's primary user workflow (SURVEY §4.1/§4.3) driven
through the real entry points in a subprocess.
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.quick  # fast confidence tier (VERDICT r4 #9)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, cwd):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # keep the TPU out of tests
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable] + args, cwd=cwd, env=env,
        capture_output=True, text=True, timeout=900,
    )


@pytest.mark.slow
def test_train_then_test_cli(tmp_path):
    ckpt = tmp_path / "checkpoints"
    results = tmp_path / "results"
    common = [
        "--dataroot", "__synthetic__", "--model", "nemar", "--name", "smoke",
        "--dataset_mode", "synthetic", "--checkpoints_dir", str(ckpt),
        "--crop_size", "32", "--load_size", "32", "--ngf", "8", "--ndf", "8",
        "--stn_ngf", "8", "--stn_depth", "3", "--stn_type", "affine",
        "--synthetic_size", "8",
    ]
    r = _run(
        [os.path.join(REPO, "train.py"), *common,
         "--batch_size", "8", "--n_epochs", "1", "--n_epochs_decay", "1",
         "--save_epoch_freq", "1", "--print_freq", "8", "--display_freq", "8",
         # freq <= 0 disables the periodic action (regression: used to
         # crash the loop's modulo)
         "--save_latest_freq", "0"],
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, f"train.py failed:\n{r.stdout[-3000:]}\n{r.stderr[-3000:]}"
    # artifacts: opt dump, loss log, metrics stream, checkpoint, web gallery
    exp = ckpt / "smoke"
    assert (exp / "train_opt.txt").exists()
    log = (exp / "loss_log.txt").read_text()
    assert "epoch: 1" in log and "G_recon" in log
    assert (exp / "metrics.jsonl").exists()
    meta = json.loads((exp / "checkpoint_meta.json").read_text())
    assert (exp / f"{meta['latest']}_state").exists()
    assert (exp / "web" / "index.html").exists()

    r = _run(
        [os.path.join(REPO, "test.py"), *common,
         "--results_dir", str(results), "--num_test", "2"],
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, f"test.py failed:\n{r.stdout[-3000:]}\n{r.stderr[-3000:]}"
    gallery = results / "smoke" / "test_latest" / "index.html"
    assert gallery.exists()
    imgs = list((results / "smoke" / "test_latest" / "images").glob("*.png"))
    assert len(imgs) >= 2 * 6  # >= num_test x visuals
