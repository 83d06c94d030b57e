"""Utilities (reference util/ package — SURVEY.md §3.1)."""

from nemar_tpu.utils.util import tensor2im, save_image, mkdirs, diagnose_network

__all__ = ["tensor2im", "save_image", "mkdirs", "diagnose_network"]
