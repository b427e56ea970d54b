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


def spot_rms_fast_field_sharded(system, Hx, Hy, wavelength, num_rays=None,
                                mesh=None, seed=0, Px=None, Py=None,
                                newton_iters: int = 10,
                                bwd_tile: int | None = None,
                                axis: str = "rays"):
    """Data-parallel fused RMS-spot merit over a device mesh.

    Each device runs the fused merit kernels
    (ops/pallas_trace.spot_rms_fast_field) on its ray shard. The only
    forward collective is an ``all_gather`` of the per-tile Chan statistic
    rows (5 floats per 64k-ray tile); every device merges the gathered
    rows identically, so the loss is replicated and — given the same
    sample set — bit-identical to the unsharded kernel. The backward runs
    the local adjoint kernel against the replicated global centroid, and
    shard_map's transpose psums the parameter cotangents over ICI: the
    full fwd+bwd merit step moves O(tiles) floats between devices, never
    O(rays).

    In PRNG mode (``Px is None``) each shard offsets the sub-block stream
    by its mesh position, so the mesh jointly draws exactly the sample
    set the unsharded kernel would draw for the same ``seed`` — sharding
    changes the hardware, not the measurement. Explicit ``Px/Py`` are
    split along the ray axis (used by the CPU-mesh parity tests).
    """
    import jax.numpy as jnp

    from optiland_tpu.ops import pallas_trace as pt

    if mesh is None:
        mesh = make_mesh()
    n_dev = int(mesh.devices.size)

    spec = pt._spec_of(system, newton_iters, poly=False)
    params = pt.build_param_table(system, wavelength)
    aim = pt.aim_vector(system, Hx, Hy)

    prng = Px is None
    dt = jnp.float32 if jax.default_backend() != "cpu" else (
        jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
    )
    if prng:
        if num_rays is None:
            raise ValueError("num_rays is required in PRNG mode")
        if jax.default_backend() == "cpu":
            raise NotImplementedError(
                "in-kernel pupil PRNG (pltpu.prng_*) has no interpret-mode "
                "lowering; pass explicit Px/Py on CPU"
            )
        R = int(num_rays)
        if R % n_dev:
            raise ValueError(
                f"Ray count {R} must be divisible by the mesh size {n_dev}"
            )
        R_local = R // n_dev
        sub = pt.SUB_ROWS * pt.LANE
        if R_local % sub:
            raise ValueError(
                f"per-shard ray count {R_local} must be a multiple of the "
                f"PRNG sub-block ({sub} rays) so shard sample streams tile "
                f"the unsharded stream exactly"
            )
        Px_in = Py_in = jnp.zeros((0,), dt)
    else:
        Px_in = jnp.asarray(Px, dt)
        Py_in = jnp.asarray(Py, dt)
        R = int(Px_in.shape[0])
        if R % n_dev:
            raise ValueError(
                f"Ray count {R} must be divisible by the mesh size {n_dev}"
            )
        R_local = R // n_dev

    S = system.cfg.num_surfaces
    coeffs = system.stack.coeffs.astype(dt)
    if coeffs.shape[1] == 0:
        coeffs = jnp.zeros((S, 1), dt)
    mats = jnp.zeros((S, 1), dt)
    params = params.astype(dt)
    aim = aim.astype(dt)
    seed_base = jnp.asarray(seed, jnp.int32)
    fwd_tile = pt._tile_rows(R_local, pt._fwd_cap(spec))
    bwd_tile = bwd_tile or pt._tile_rows(
        R_local, min(pt.TILE_ROWS_MERIT_BWD, pt._bwd_cap(spec))
    )
    nsub_local = R_local // (pt.SUB_ROWS * pt.LANE) if prng else 0

    def _seed_arr(seed_b, axis_name):
        idx = jax.lax.axis_index(axis_name)
        return jnp.stack([seed_b, (idx * nsub_local).astype(jnp.int32)])

    # The custom_vjp sits OUTSIDE the shard_maps: forward and backward are
    # each a standalone collective program (no reliance on shard_map
    # transpose rules — with check_vma=False the transpose of a replicated
    # output scales cotangents by 1/n_dev, which is wrong for this psum
    # pattern), and the parameter cotangents are psum'd explicitly.
    def _fwd_local(params, coeffs, aim, seed_b, Px_l, Py_l):
        s = pt._pallas_merit_fwd(
            params, coeffs, mats, aim, _seed_arr(seed_b, axis), Px_l, Py_l,
            spec=spec, R=R_local, prng=prng, tile=fwd_tile,
        )
        s_all = jax.lax.all_gather(s, axis)
        return pt._chan_combine(s_all.reshape(-1, s.shape[-1]), R)

    def _bwd_local(params, coeffs, aim, stats, seed_b, Px_l, Py_l):
        d = pt._pallas_merit_bwd(
            params, coeffs, mats, aim, stats, _seed_arr(seed_b, axis),
            Px_l, Py_l, spec=spec, R=R_local, prng=prng, tile=bwd_tile,
        )
        return jax.tree_util.tree_map(
            lambda a: jax.lax.psum(a, axis), d
        )

    fwd_sm = _shard_map(
        _fwd_local,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(axis), P(axis)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    bwd_sm = _shard_map(
        _bwd_local,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P(axis), P(axis)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )

    @jax.custom_vjp
    def _loss(params, coeffs, aim):
        return fwd_sm(params, coeffs, aim, seed_base, Px_in, Py_in)[0]

    def _fwd(params, coeffs, aim):
        loss, xbar, ybar = fwd_sm(
            params, coeffs, aim, seed_base, Px_in, Py_in
        )
        return loss, (params, coeffs, aim, xbar, ybar)

    def _bwd(res, gl):
        params, coeffs, aim, xbar, ybar = res
        stats = jnp.stack(
            [xbar, ybar, jnp.asarray(gl, params.dtype) / R, 0.0 * xbar]
        ).astype(params.dtype)
        return bwd_sm(
            params, coeffs, aim, stats, seed_base, Px_in, Py_in
        )

    _loss.defvjp(_fwd, _bwd)
    return _loss(params, coeffs, aim)


def trace_fast_pol_sharded(system, rays, wavelength, state=None,
                           mesh=None, newton_iters: int = 10,
                           axis: str = "rays"):
    """Data-parallel fused POLARIZED trace over a device mesh: each
    device runs trace_fast_pol_intensity (Jones/TMM update + in-kernel
    exit intensity) on its ray shard; the system is replicated and
    shard_map's transpose psums the parameter cotangents — the same
    pattern as trace_fast_sharded, for polarized systems."""
    from optiland_tpu.ops.pallas_pol import (
        TILE_ROWS_POL_BWD_SHARDED,
        trace_fast_pol_intensity,
    )

    if mesh is None:
        mesh = make_mesh()
    n_dev = int(mesh.devices.size)
    if rays.x.shape[0] % n_dev != 0:
        raise ValueError(
            f"Ray count {rays.x.shape[0]} must be divisible by the mesh "
            f"size {n_dev}; pad with pad_to_multiple()."
        )

    def local(sys_, rays_):
        return trace_fast_pol_intensity(
            sys_, rays_, wavelength, state=state,
            newton_iters=newton_iters,
            bwd_tile=TILE_ROWS_POL_BWD_SHARDED,
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


__all__ = [
    "trace_fast_sharded",
    "trace_fast_pol_sharded",
    "spot_rms_fast_field_sharded",
    "sharded_merit",
    "pad_to_multiple",
]
