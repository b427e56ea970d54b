"""Device-mesh sharding for ray batches.

The trace is elementwise over the ray axis, so data-parallel scaling is
expressed entirely through shardings: rays sharded along the ``rays`` mesh
axis, lens parameters replicated, reductions (spot centroids, merit sums,
parameter gradients) turned into ``psum`` collectives by XLA automatically
under jit. This replaces the reference's absence of any multi-device path
(reference is single-process; see optiland/backend/__init__.py:28-32).

Usage:
    mesh = make_mesh()                       # all local devices
    f = jax.jit(merit_fn, in_shardings=(replicated(mesh), ray_sharding(mesh)))
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_name: str = "rays") -> Mesh:
    """Create a 1-D device mesh over (up to) all available devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def ray_sharding(mesh: Mesh, axis_name: str = "rays") -> NamedSharding:
    """Sharding for per-ray arrays: split the leading axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    """Sharding for replicated values (lens parameters, scalars)."""
    return NamedSharding(mesh, P())


def shard_rays(tree, mesh: Mesh, axis_name: str = "rays"):
    """Device-put every leaf of a per-ray pytree with ray-axis sharding."""
    sh = ray_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), tree)


def replicate(tree, mesh: Mesh):
    """Device-put every leaf of a pytree fully replicated."""
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), tree)


def pad_to_multiple(n: int, m: int) -> int:
    """Smallest multiple of m that is >= n (ray counts must divide the mesh)."""
    return ((n + m - 1) // m) * m
