"""nemar_tpu — a TPU-native multimodal image registration/translation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
NeMAR implementation (moabarar/nemar, CVPR 2020: "Unsupervised Multi-Modal
Image Registration via Geometry Preserving Image-to-Image Translation").

Design notes (TPU-first, not a port):
  * NHWC layout everywhere (XLA:TPU's native conv layout).
  * Pure-functional models (flax.linen) + optax; the whole NeMAR training
    step (D update + G/R update) compiles into ONE jitted XLA program.
  * The grid-sample warp core is a first-class op with a Pallas TPU kernel
    and a reference XLA implementation, parity-tested against the torch
    oracle to <1e-5 (see tests/test_warp.py).
  * Data parallelism via jax.sharding.Mesh + NamedSharding (no DataParallel
    translation); collectives are XLA-inserted psums over ICI.

Public surface mirrors the reference's (SURVEY.md §2): train/test entry
points, `--model nemar --stn_type {affine,unet}` string registries, dynamic
per-model/per-dataset flag injection.
"""

__version__ = "0.1.0"
