"""nemar_tpu.ops — TPU-native compute primitives.

The reference delegates its performance-critical math to torch's C++/CUDA
kernels (SURVEY.md §3.3). Here those are first-class ops:

  warp          affine_grid / grid_sample / displacement-field warps
                (reference XLA impl + Pallas TPU kernel, torch-parity tested)
  norm          instance norm and the fused instance-norm+activation kernel
"""

from nemar_tpu.ops.warp import (
    affine_grid,
    grid_sample,
    grid_sample_nchw,
    identity_grid,
    warp_with_flow,
    compose_flows,
)
from nemar_tpu.ops.norm import instance_norm, instance_norm_act

__all__ = [
    "affine_grid",
    "grid_sample",
    "grid_sample_nchw",
    "identity_grid",
    "warp_with_flow",
    "compose_flows",
    "instance_norm",
    "instance_norm_act",
]
