"""Option parsing (reference options/ package — SURVEY.md §3.1).

argparse-based, two-pass, with dynamic per-model/per-dataset flag injection
via modify_commandline_options — the registry+flag-injection pattern is part
of the public API surface (SURVEY.md §2)."""

from nemar_tpu.options.base_options import BaseOptions
from nemar_tpu.options.train_options import TrainOptions
from nemar_tpu.options.test_options import TestOptions

__all__ = ["BaseOptions", "TrainOptions", "TestOptions"]
