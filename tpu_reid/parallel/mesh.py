"""Device mesh + sharding helpers.

The reference is single-GPU with literal .cuda() placement and no
collectives (SURVEY.md §2.6). Here every multi-chip axis goes through one
`jax.sharding.Mesh`:

  * "data"  — batch axis for the encoder sweep and training (the primary
    scale axis: gallery embedding extraction),
  * "model" — optional tensor-parallel axis for the tower widths; kept in
    the mesh so layers stay mesh-aware, size 1 by default at ViT-B scale.

XLA inserts the collectives (psum for gradient reduction, all_gather for
eval feature collection) from the shardings — no hand-written NCCL/MPI
analog anywhere (scaling-book recipe: annotate, compile, profile).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    use = n_data * n_model
    grid = np.asarray(devices[:use]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-sharded leading axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a (host) batch pytree with the leading axis split over "data"."""
    return jax.device_put(batch, data_sharding(mesh))


def replicate(mesh: Mesh, tree):
    return jax.device_put(tree, replicated(mesh))


def pad_to_multiple(n: int, multiple: int) -> int:
    return -(-n // multiple) * multiple


def shard_map_nocheck(fn, mesh: Mesh, in_specs, out_specs):
    """shard_map with replication checking off, across jax versions
    (jax >= 0.8: `jax.shard_map(check_vma=...)`; older: experimental
    `shard_map(check_rep=...)`). Checking is off because every wrapped
    body here uses `lax.axis_index` / per-device row offsets, which the
    replication checker cannot type."""
    try:
        from jax import shard_map as _sm
        return _sm(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_vma=False)
    except (ImportError, TypeError):  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map as _sm
        return _sm(fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                   check_rep=False)
