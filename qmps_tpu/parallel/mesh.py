"""Device-mesh helpers for sharded sweeps."""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axis: str = "sweep") -> Mesh:
    """1-D mesh over the first n devices (default: all)."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_over_sweep(f, mesh: Mesh | None, axis: str = "sweep", **kw):
    """Shard a batched function's leading axis across ``mesh`` (identity
    when mesh is None).  Every input and output is partitioned on its
    leading dimension — the data-parallel mapping all the sweep workloads
    here use (docs/DESIGN.md 4c); extra kwargs (e.g. ``check_vma=False``
    for pallas-calling bodies) pass through to shard_map."""
    if mesh is None:
        return f
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    return shard_map(f, mesh=mesh, in_specs=P(axis), out_specs=P(axis), **kw)
