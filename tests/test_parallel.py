"""Multi-device sharding tests on the 8-way virtual CPU mesh.

Covers jit+NamedSharding auto-partitioning of the XLA trace and the
shard_map path for the fused Pallas kernel (GSPMD cannot split custom
kernels automatically)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optiland_tpu.core import raygen
from optiland_tpu.core import trace as trace_core
from optiland_tpu.parallel.mesh import (
    make_mesh,
    pad_to_multiple,
    ray_sharding,
    replicated,
    shard_rays,
)
from optiland_tpu.samples import CookeTriplet
from tests.conftest import assert_allclose


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 2:
        pytest.skip("virtual multi-device mesh unavailable")
    return make_mesh()


@pytest.fixture(scope="module")
def system():
    return CookeTriplet().system


def _rays(system, n, dtype=None):
    rng = np.random.default_rng(0)
    r = np.sqrt(rng.uniform(size=n))
    th = rng.uniform(0, 2 * np.pi, size=n)
    Px = jnp.asarray(r * np.cos(th))
    Py = jnp.asarray(r * np.sin(th))
    rays = raygen.generate_rays(
        system, jnp.zeros(n), jnp.zeros(n), Px, Py, 0.55
    )
    if dtype is not None:
        rays = jax.tree_util.tree_map(lambda a: a.astype(dtype), rays)
    return rays


def test_xla_trace_auto_partitions(mesh, system):
    """jit + NamedSharding splits the standard trace across devices and
    matches the single-device result exactly."""
    n = pad_to_multiple(1000, len(jax.devices()))
    rays = _rays(system, n)
    ref, _ = trace_core.trace(system, rays, record=False)

    rays_sh = shard_rays(rays, mesh)
    sys_sh = jax.device_put(system, replicated(mesh))
    traced = jax.jit(lambda s, r: trace_core.trace(s, r, record=False)[0])
    out = traced(sys_sh, rays_sh)
    assert_allclose(out.y, ref.y, rtol=1e-12, atol=1e-12)
    # output really is sharded over the mesh
    assert ray_sharding(mesh).is_equivalent_to(out.y.sharding, out.y.ndim)


def test_sharded_pallas_forward_matches(mesh, system):
    from optiland_tpu.parallel.sharded_trace import trace_fast_sharded

    n = pad_to_multiple(2048, len(jax.devices()))
    rays = _rays(system, n, dtype=jnp.float32)
    rays_sh = shard_rays(rays, mesh)
    out = trace_fast_sharded(system, rays_sh, 0.55)
    ref, _ = trace_core.trace(system, rays, record=False)
    assert_allclose(out.y, np.asarray(ref.y, np.float32), rtol=0, atol=2e-5)


@pytest.mark.slow
def test_sharded_pallas_gradient_matches_unsharded(mesh, system):
    """shard_map transpose psums the replicated-parameter cotangents; the
    result is bit-identical to the single-shard gradient."""
    from optiland_tpu.ops.pallas_trace import trace_fast
    from optiland_tpu.parallel.sharded_trace import sharded_merit

    n = pad_to_multiple(2048, len(jax.devices()))
    rays = _rays(system, n, dtype=jnp.float32)
    rays_sh = shard_rays(rays, mesh)

    def merit_unsharded(r1):
        s = system.replace(
            stack=system.stack.replace(
                radius=system.stack.radius.at[1].set(r1)
            )
        )
        out = trace_fast(s, rays, 0.55)
        w = jnp.where(out.i > 0, 1.0, 0.0)
        tw = jnp.maximum(jnp.sum(w), 1.0)
        cx = jnp.sum(out.x * w) / tw
        cy = jnp.sum(out.y * w) / tw
        return jnp.sqrt(
            jnp.sum(((out.x - cx) ** 2 + (out.y - cy) ** 2) * w) / tw
        )

    def merit_shard(r1):
        s = system.replace(
            stack=system.stack.replace(
                radius=system.stack.radius.at[1].set(r1)
            )
        )
        return sharded_merit(s, rays_sh, 0.55, mesh=mesh)

    g1 = float(jax.grad(merit_unsharded)(jnp.float32(22.01359)))
    g2 = float(jax.grad(merit_shard)(jnp.float32(22.01359)))
    np.testing.assert_allclose(g2, g1, rtol=1e-6)


def _disk_samples(n, seed=3):
    rng = np.random.default_rng(seed)
    r = np.sqrt(rng.uniform(size=n))
    th = rng.uniform(0, 2 * np.pi, size=n)
    return jnp.asarray(r * np.cos(th)), jnp.asarray(r * np.sin(th))


def test_sharded_fused_merit_matches_unsharded(mesh, system):
    """The sharded fused merit (all_gather of per-tile Chan stats + psum'd
    parameter cotangents) reproduces the unsharded kernel's loss and
    gradient on the same explicit pupil samples."""
    from optiland_tpu.ops.pallas_trace import spot_rms_fast_field
    from optiland_tpu.parallel.sharded_trace import (
        spot_rms_fast_field_sharded,
    )

    n = pad_to_multiple(2048, len(jax.devices()))
    Px, Py = _disk_samples(n)

    def with_r1(r1):
        return system.replace(
            stack=system.stack.replace(
                radius=system.stack.radius.at[1].set(r1)
            )
        )

    def loss_unsharded(r1):
        return spot_rms_fast_field(
            with_r1(r1), 0.0, 0.7, 0.55, Px=Px, Py=Py
        )

    def loss_sharded(r1):
        return spot_rms_fast_field_sharded(
            with_r1(r1), 0.0, 0.7, 0.55, Px=Px, Py=Py, mesh=mesh
        )

    r1 = jnp.asarray(22.01359, system.stack.radius.dtype)
    v1, g1 = jax.value_and_grad(loss_unsharded)(r1)
    v2, g2 = jax.value_and_grad(loss_sharded)(r1)
    assert_allclose(v2, v1, rtol=1e-12, atol=0)
    assert_allclose(g2, g1, rtol=1e-9, atol=0)


def test_sharded_fused_merit_full_stack_grads(mesh, system):
    """Cotangents reach every differentiable stack leaf (radius, thickness,
    conic) identically sharded vs unsharded."""
    from optiland_tpu.ops.pallas_trace import spot_rms_fast_field
    from optiland_tpu.parallel.sharded_trace import (
        spot_rms_fast_field_sharded,
    )

    n = pad_to_multiple(1024, len(jax.devices()))
    Px, Py = _disk_samples(n, seed=7)

    def loss(stack, sharded):
        s = system.replace(stack=stack)
        if sharded:
            return spot_rms_fast_field_sharded(
                s, 0.3, 0.5, 0.55, Px=Px, Py=Py, mesh=mesh
            )
        return spot_rms_fast_field(s, 0.3, 0.5, 0.55, Px=Px, Py=Py)

    g1 = jax.grad(lambda st: loss(st, False))(system.stack)
    g2 = jax.grad(lambda st: loss(st, True))(system.stack)
    for leaf in ("radius", "thickness", "conic"):
        assert_allclose(
            getattr(g2, leaf), getattr(g1, leaf), rtol=1e-9, atol=1e-12
        )


def test_sharded_fused_merit_indivisible_raises(mesh, system):
    from optiland_tpu.parallel.sharded_trace import (
        spot_rms_fast_field_sharded,
    )

    n = len(jax.devices()) * 64 + 1
    Px, Py = _disk_samples(n)
    with pytest.raises(ValueError, match="divisible"):
        spot_rms_fast_field_sharded(
            system, 0.0, 0.7, 0.55, Px=Px, Py=Py, mesh=mesh
        )


def test_indivisible_ray_count_raises(mesh, system):
    from optiland_tpu.parallel.sharded_trace import trace_fast_sharded

    n = len(jax.devices()) * 64 + 1
    rays = _rays(system, n, dtype=jnp.float32)
    with pytest.raises(ValueError, match="divisible"):
        trace_fast_sharded(system, rays, 0.55, mesh=mesh)


def test_pad_to_multiple():
    assert pad_to_multiple(1000, 8) == 1000
    assert pad_to_multiple(1001, 8) == 1008
    assert pad_to_multiple(8, 8) == 8


def _pol_fresnel_system():
    from optiland_tpu.optic import Optic
    from optiland_tpu.polarization import create_polarization

    o = Optic()
    o.surfaces.add(index=0, radius=np.inf, thickness=np.inf)
    o.surfaces.add(index=1, radius=50.0, thickness=5.0, material="N-BK7",
                   is_stop=True, coating="fresnel")
    o.surfaces.add(index=2, radius=-50.0, thickness=45.0,
                   coating="fresnel")
    o.surfaces.add(index=3)
    o.set_aperture("EPD", 20.0)
    o.fields.set_type("angle")
    o.fields.add(y=0)
    o.wavelengths.add(0.55, is_primary=True)
    o.set_polarization("H")
    return o.system, create_polarization("H")


def test_sharded_polarized_forward_matches(mesh):
    """trace_fast_pol_intensity under shard_map: per-shard Jones/Fresnel
    kernels reproduce the unsharded polarized trace."""
    from optiland_tpu.ops.pallas_pol import trace_fast_pol_intensity
    from optiland_tpu.parallel.sharded_trace import trace_fast_pol_sharded

    system, state = _pol_fresnel_system()
    n = pad_to_multiple(1024, len(jax.devices()))
    rays = _rays(system, n, dtype=jnp.float32)
    rays_sh = shard_rays(rays, mesh)

    ref = trace_fast_pol_intensity(system, rays, 0.55, state=state)
    out = trace_fast_pol_sharded(system, rays_sh, 0.55, state=state,
                                 mesh=mesh)
    assert_allclose(out.y, ref.y, rtol=0, atol=2e-5)
    assert_allclose(out.i, ref.i, rtol=1e-5, atol=1e-7)


@pytest.mark.slow  # the polarized adjoint's interpret compile is heavy
def test_sharded_polarized_gradient_matches_unsharded(mesh):
    """shard_map transpose psums the polarized kernel's parameter
    cotangents identically to the unsharded gradient."""
    from optiland_tpu.ops.pallas_pol import trace_fast_pol_intensity
    from optiland_tpu.parallel.sharded_trace import trace_fast_pol_sharded

    system, state = _pol_fresnel_system()
    n = pad_to_multiple(1024, len(jax.devices()))
    rays = _rays(system, n, dtype=jnp.float32)
    rays_sh = shard_rays(rays, mesh)

    def merit(r1, sharded):
        s = system.replace(
            stack=system.stack.replace(
                radius=system.stack.radius.at[1].set(r1)
            )
        )
        if sharded:
            res = trace_fast_pol_sharded(s, rays_sh, 0.55, state=state,
                                         mesh=mesh)
        else:
            res = trace_fast_pol_intensity(s, rays, 0.55, state=state)
        return jnp.mean(res.i * res.y**2)

    r1 = jnp.float32(50.0)
    g1 = float(jax.grad(lambda r: merit(r, False))(r1))
    g2 = float(jax.grad(lambda r: merit(r, True))(r1))
    np.testing.assert_allclose(g2, g1, rtol=1e-5)
