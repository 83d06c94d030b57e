"""Device mesh + sharding helpers (TPU-native replacement for DataParallel).

The reference scales with single-process nn.DataParallel over --gpu_ids
(reference models/networks.py init_net — SURVEY.md §3.4): replicate module,
scatter batch, NCCL gather. Here the same data parallelism is expressed
declaratively: a 1-or-2-axis Mesh ('data', optionally 'spatial'),
NamedSharding(P('data')) on the batch dimension of inputs, replicated
params — XLA/GSPMD inserts the psum for gradient reduction over ICI.

The optional 'spatial' axis shards the image HEIGHT dimension across
devices; GSPMD generates halo exchanges for the convs (useful >HBM
resolutions, SURVEY.md §6 long-context analog).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_devices: int = -1,
    spatial: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data', 'spatial') mesh.

    num_devices -1 uses all local devices. spatial > 1 carves that many
    devices out of the total for spatial (height) sharding.
    """
    devs = list(devices if devices is not None else jax.devices())
    if num_devices > 0:
        devs = devs[:num_devices]
    n = len(devs)
    if spatial < 1 or n % spatial != 0:
        raise ValueError(f"spatial={spatial} must divide device count {n}")
    arr = np.asarray(devs).reshape(n // spatial, spatial)
    return Mesh(arr, axis_names=("data", "spatial"))


def batch_sharding(mesh: Mesh, spatial_dim: Optional[int] = None) -> NamedSharding:
    """Sharding for an NHWC batch: batch over 'data', optionally H over 'spatial'."""
    if spatial_dim is None:
        return NamedSharding(mesh, P("data"))
    spec = [None, None, None, None]
    spec[0] = "data"
    spec[spatial_dim] = "spatial"
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: dict, shard_spatial: bool = False) -> dict:
    """Host numpy batch -> device arrays, batch-sharded over the mesh.

    Batches whose leading dim doesn't divide the 'data' axis (e.g. the
    forced batch_size=1 of test.py on a multi-device mesh) are replicated
    instead — correctness over parallelism for the tail case.
    """
    n_data = mesh.shape["data"]
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray) and v.ndim >= 1:
            if v.shape[0] % n_data == 0:
                sd = batch_sharding(mesh, 1 if (shard_spatial and v.ndim == 4) else None)
            else:
                sd = replicated_sharding(mesh)
            out[k] = jax.device_put(v, sd)
        else:
            out[k] = v
    return out


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/opt state) across the mesh.

    Works on multi-PROCESS meshes too: device_put rejects shardings with
    non-addressable devices, so there every process contributes its full
    local copy via make_array_from_process_local_data (all processes build
    identical state — same seed).
    """
    sd = replicated_sharding(mesh)
    multiprocess = any(
        d.process_index != jax.process_index() for d in mesh.devices.flat
    )
    if multiprocess:
        def mk(x):
            if jax.dtypes.issubdtype(
                getattr(x, "dtype", None), jax.dtypes.prng_key
            ):
                data = jax.random.key_data(x)
                arr = jax.make_array_from_process_local_data(
                    sd, np.asarray(data), data.shape
                )
                return jax.random.wrap_key_data(arr, impl=jax.random.key_impl(x))
            return jax.make_array_from_process_local_data(
                sd, np.asarray(x), np.shape(x)
            )

        return jax.tree.map(mk, tree)
    return jax.device_put(tree, sd)
