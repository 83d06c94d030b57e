"""Flat (bucketed-vector) Adam parity (models/optim.py make_adam fused=True).

The fused path ravels the gradient tree into a handful of flat buckets
(round 4: <= bucket_elems each, tree order), runs scale_by_adam per
bucket, and unravels the update — elementwise math is identical to the
per-leaf transform, so the resulting updates must agree to f32 roundoff
step after step, for ANY bucket size.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nemar_tpu.models.optim import apply_updates, make_adam


def _tree(key):
    k = jax.random.split(key, 5)
    return {
        "conv": {"kernel": jax.random.normal(k[0], (3, 3, 4, 8)),
                 "bias": jax.random.normal(k[1], (8,))},
        "head": {"kernel": jax.random.normal(k[2], (8, 2)),
                 "bias": jax.random.normal(k[3], (2,))},
        "scale": jax.random.normal(k[4], ()),
    }


def test_fused_adam_matches_per_leaf():
    params = _tree(jax.random.key(0))
    tx_ref = make_adam(0.5)
    tx_fused = make_adam(0.5, fused=True)
    s_ref = tx_ref.init(params)
    s_fused = tx_fused.init(params)
    p_ref = params
    p_fused = params
    for i in range(5):
        grads = jax.tree.map(
            lambda v: jnp.sin(v + i).astype(v.dtype), p_ref)
        u_ref, s_ref = tx_ref.update(grads, s_ref, p_ref)
        p_ref = apply_updates(p_ref, u_ref, 1e-3)
        grads_f = jax.tree.map(
            lambda v: jnp.sin(v + i).astype(v.dtype), p_fused)
        u_fused, s_fused = tx_fused.update(grads_f, s_fused, p_fused)
        p_fused = apply_updates(p_fused, u_fused, 1e-3)
    for a, bv in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_fused)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bv),
                                   atol=1e-6, rtol=1e-6)


def test_fused_adam_state_is_flat():
    params = _tree(jax.random.key(1))
    tx = make_adam(0.9, fused=True)
    state = tx.init(params)
    n = sum(int(np.prod(v.shape)) for v in jax.tree.leaves(params))
    # One bucket at the default bucket_elems: a 1-tuple of flat states.
    assert isinstance(state, tuple) and len(state) == 1
    assert state[0].mu.shape == (n,)
    assert state[0].nu.shape == (n,)


def test_fused_adam_bucketed_matches_per_leaf():
    """Tiny bucket_elems forces multiple buckets; math must not change."""
    params = _tree(jax.random.key(2))
    tx_ref = make_adam(0.5)
    tx_fused = make_adam(0.5, fused=True, bucket_elems=64)
    s_ref = tx_ref.init(params)
    s_fused = tx_fused.init(params)
    assert len(s_fused) > 1  # the point of the test
    p_ref = params
    p_fused = params
    for i in range(3):
        grads = jax.tree.map(
            lambda v: jnp.cos(v + i).astype(v.dtype), p_ref)
        u_ref, s_ref = tx_ref.update(grads, s_ref, p_ref)
        p_ref = apply_updates(p_ref, u_ref, 1e-3)
        grads_f = jax.tree.map(
            lambda v: jnp.cos(v + i).astype(v.dtype), p_fused)
        u_fused, s_fused = tx_fused.update(grads_f, s_fused, p_fused)
        p_fused = apply_updates(p_fused, u_fused, 1e-3)
    for a, bv in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_fused)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bv),
                                   atol=1e-6, rtol=1e-6)


def _tiny_model(extra, name):
    import tempfile

    from nemar_tpu.models import create_model
    from nemar_tpu.options import TrainOptions

    d = tempfile.mkdtemp()
    opt = TrainOptions().parse([
        "--dataroot", "__synthetic__", "--dataset_mode", "synthetic",
        "--model", "nemar", "--stn_type", "unet", "--name", name,
        "--checkpoints_dir", d, "--crop_size", "32", "--load_size", "32",
        "--synthetic_size", "8", "--batch_size", "2",
        "--ngf", "8", "--ndf", "8", "--stn_ngf", "8", "--stn_depth", "3",
    ] + extra)
    model = create_model(opt)
    model.setup(opt)
    return model, opt


def test_opt_split_matches_baseline():
    """--opt_split (two programs: grads, then flat Adam) is the SAME math
    as the single-program step.

    The parity gate is ONE step (SURVEY §8.3.5: GAN training amplifies
    roundoff — Adam's g/|g| normalization turns a 1e-11 program-boundary
    reassociation into full-lr sign flips within 3 steps; measured here:
    2.9e-11 after step 1, 4e-4 after step 3). Losses are additionally
    tracked over 3 steps at a loose tolerance.
    """
    ref, opt = _tiny_model([], "split_ref")
    split, _ = _tiny_model(["--opt_split"], "split_ab")
    rng = np.random.default_rng(3)
    for step in range(3):
        batch = {
            "A": rng.standard_normal((2, 32, 32, opt.input_nc),
                                     dtype=np.float32),
            "B": rng.standard_normal((2, 32, 32, opt.output_nc),
                                     dtype=np.float32),
            "A_paths": ["x", "y"],
        }
        ref.set_input(batch)
        ref.optimize_parameters()
        split.set_input(batch)
        split.optimize_parameters()
        if step == 0:
            for net in ("params_G", "params_R", "params_D"):
                for a, bv in zip(
                        jax.tree.leaves(getattr(ref.state, net)),
                        jax.tree.leaves(getattr(split.state, net))):
                    np.testing.assert_allclose(
                        np.asarray(a), np.asarray(bv), atol=1e-8,
                        err_msg=net)
        lr, ls = ref.get_current_losses(), split.get_current_losses()
        for k in lr:
            np.testing.assert_allclose(lr[k], ls[k], atol=1e-3, rtol=1e-3,
                                       err_msg=f"step {step} loss {k}")


def test_opt_split_rejects_scan_and_accum():
    import pytest

    with pytest.raises(ValueError):
        _tiny_model(["--opt_split", "--steps_per_execution", "4"], "sx")
    with pytest.raises(ValueError):
        _tiny_model(["--opt_split", "--grad_accum", "2"], "sy")


def test_opt_fused_flag_trains():
    """One jitted nemar step under --opt_fused runs and updates params."""
    import os
    import tempfile

    from nemar_tpu.models import create_model
    from nemar_tpu.options import TrainOptions

    d = tempfile.mkdtemp()
    opt = TrainOptions().parse([
        "--dataroot", "__synthetic__", "--dataset_mode", "synthetic",
        "--model", "nemar", "--stn_type", "unet", "--name", "fa",
        "--checkpoints_dir", d, "--crop_size", "32", "--load_size", "32",
        "--synthetic_size", "8", "--batch_size", "2",
        "--ngf", "8", "--ndf", "8", "--stn_ngf", "8", "--stn_depth", "3",
        "--opt_fused",
    ])
    model = create_model(opt)
    model.setup(opt)
    rng = np.random.default_rng(0)
    batch = {
        "A": rng.standard_normal((2, 32, 32, opt.input_nc),
                                 dtype=np.float32),
        "B": rng.standard_normal((2, 32, 32, opt.output_nc),
                                 dtype=np.float32),
        "A_paths": ["x", "y"],
    }
    model.set_input(batch)
    before = np.asarray(jax.tree.leaves(model.state.params_G)[0]).copy()
    model.optimize_parameters()
    losses = model.get_current_losses()
    assert all(np.isfinite(v) for v in losses.values()), losses
    after = np.asarray(jax.tree.leaves(model.state.params_G)[0])
    assert not np.allclose(before, after)
