"""Multi-chip sharded tracing: shard_map over the ray axis.

XLA's GSPMD partitioner cannot split custom Pallas kernels automatically,
so the fused trace is scaled across chips with ``shard_map``: each device
runs the Pallas kernel on its ray shard, lens parameters are replicated,
and reverse-mode AD inserts the ``psum`` over parameter gradients — the
ICI collective pattern of data-parallel training applied to ray batches.

The plain XLA trace needs none of this: jit + NamedSharding annotations
(optiland_tpu.parallel.mesh) partition it automatically.
"""

from __future__ import annotations

import jax
from jax.sharding import PartitionSpec as P

from optiland_tpu.parallel.mesh import make_mesh, pad_to_multiple

try:  # JAX >= 0.4.35 exposes shard_map at the top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover - older JAX
    from jax.experimental.shard_map import shard_map as _shard_map


def _replicated_specs(tree):
    return jax.tree_util.tree_map(lambda _: P(), tree)


def _ray_specs(tree, axis: str):
    return jax.tree_util.tree_map(lambda _: P(axis), tree)


def trace_fast_sharded(system, rays, wavelength, mesh=None,
                       newton_iters: int = 10, axis: str = "rays"):
    """Data-parallel fused Pallas trace over a device mesh.

    The ray pytree is split along the leading axis across ``mesh``; the
    system is replicated. The ray count must be divisible by the mesh size
    (use mesh.pad_to_multiple). Differentiable: parameter cotangents are
    psum-reduced across the mesh by shard_map's transpose.
    """
    from optiland_tpu.ops.pallas_trace import trace_fast

    if mesh is None:
        mesh = make_mesh()
    n_dev = int(mesh.devices.size)
    if rays.x.shape[0] % n_dev != 0:
        raise ValueError(
            f"Ray count {rays.x.shape[0]} must be divisible by the mesh "
            f"size {n_dev}; pad with pad_to_multiple()."
        )

    def local(sys_, rays_):
        from optiland_tpu.ops.pallas_trace import TILE_ROWS_BWD_SHARDED

        return trace_fast(
            sys_, rays_, wavelength, newton_iters=newton_iters,
            bwd_tile=TILE_ROWS_BWD_SHARDED,
        )

    fn = _shard_map(
        local,
        mesh=mesh,
        in_specs=(_replicated_specs(system), _ray_specs(rays, axis)),
        out_specs=_ray_specs(rays, axis),
        check_vma=False,
    )
    return fn(system, rays)


def sharded_merit(system, rays, wavelength, mesh=None,
                  newton_iters: int = 10, axis: str = "rays"):
    """Example end-to-end sharded objective: RMS spot radius of the traced
    bundle. The mean reductions become psum collectives over ICI."""
    import jax.numpy as jnp

    out = trace_fast_sharded(
        system, rays, wavelength, mesh=mesh, newton_iters=newton_iters,
        axis=axis,
    )
    w = jnp.where(out.i > 0, 1.0, 0.0)
    tw = jnp.maximum(jnp.sum(w), 1.0)
    cx = jnp.sum(out.x * w) / tw
    cy = jnp.sum(out.y * w) / tw
    r2 = ((out.x - cx) ** 2 + (out.y - cy) ** 2) * w
    return jnp.sqrt(jnp.sum(r2) / tw)


__all__ = ["trace_fast_sharded", "sharded_merit", "pad_to_multiple"]
