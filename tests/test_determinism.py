"""Determinism golden test (SURVEY §6 'race detection' analog).

Fixed PRNG keys + fixed batch => bit-identical losses across two fresh
model instances. Guards against nondeterministic reductions, stateful
leaks, or accidental host randomness in the jitted step.
"""

import numpy as np

from nemar_tpu.models import create_model
from tests.test_model_step import make_batch, make_opt


def test_two_fresh_runs_bit_identical(tmp_path, rng):
    batch = None
    results = []
    for name in ("d1", "d2"):
        opt = make_opt(tmp_path, ["--name", name, "--pool_size", "4"])
        model = create_model(opt)
        model.setup(opt)
        if batch is None:
            batch = make_batch(opt, rng)
        model.set_input(batch)
        model.optimize_parameters()
        model.optimize_parameters()
        results.append(model.get_current_losses())
    for k in results[0]:
        assert results[0][k] == results[1][k], (
            f"loss {k} differs across identical runs: "
            f"{results[0][k]} vs {results[1][k]}"
        )
