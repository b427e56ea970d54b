"""GRIN propagation physics: analytic SELFOC solution, homogeneous limit,
OPD bookkeeping, differentiability (beyond reference — its grin.py:14
raises NotImplementedError)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optiland_tpu.core.rays import RealRays
from optiland_tpu.propagation import (
    BasePropagationModel,
    GRINMedium,
    GRINPropagation,
    HomogeneousPropagation,
)


def _ray(x=0.0, L=0.0, n0_dir=(0.0, 0.0, 1.0)):
    Lx, Ly, Lz = n0_dir
    return RealRays.create(x, 0.0, 0.0, L, Ly, np.sqrt(1 - L**2 - Ly**2),
                           1.0, 0.55)


def test_homogeneous_limit_is_straight_line():
    """Zero gradient => identical to homogeneous propagation."""
    med = GRINMedium(n0=1.5)
    r = RealRays.create(0.5, -0.2, 0.0, 0.1, 0.05,
                        np.sqrt(1 - 0.1**2 - 0.05**2), 1.0, 0.55)
    out = GRINPropagation(med, num_steps=16).propagate(r, 30.0)
    np.testing.assert_allclose(float(out.x[0]), 0.5 + 30.0 * 0.1, atol=1e-12)
    np.testing.assert_allclose(float(out.z[0]), 30.0 * float(r.N[0]),
                               atol=1e-12)
    # OPD = n * path length
    np.testing.assert_allclose(float(out.opd[0]), 1.5 * 30.0, rtol=1e-12)


def test_selfoc_ray_oscillates_at_pitch():
    """SELFOC n(r) = n0 (1 - A r^2 / 2): a paraxial ray at offset r0
    oscillates as r(z) = r0 cos(sqrt(A) z)."""
    n0, A = 1.6, 0.25  # 1/mm^2
    med = GRINMedium(n0=n0, nr2=-n0 * A / 2)
    r0 = 0.05  # small offset: paraxial regime
    ray = RealRays.create(r0, 0.0, 0.0, 0.0, 0.0, 1.0, 1.0, 0.55)
    # propagate a quarter pitch: ray crosses the axis
    z_quarter = (np.pi / 2) / np.sqrt(A)
    out = GRINPropagation(med, num_steps=512).propagate(ray, z_quarter)
    assert abs(float(out.x[0])) < 1e-4 * r0 + 1e-7
    # slope at the axis: u = -r0 sqrt(A) sin(sqrt(A) z) = -r0 sqrt(A)
    np.testing.assert_allclose(float(out.L[0]), -r0 * np.sqrt(A), rtol=1e-3)


def test_selfoc_half_pitch_inverts_ray():
    n0, A = 1.5, 0.1
    med = GRINMedium(n0=n0, nr2=-n0 * A / 2)
    r0 = 0.02
    ray = RealRays.create(r0, 0.0, 0.0, 0.0, 0.0, 1.0, 1.0, 0.55)
    z_half = np.pi / np.sqrt(A)
    out = GRINPropagation(med, num_steps=512).propagate(ray, z_half)
    np.testing.assert_allclose(float(out.x[0]), -r0, rtol=1e-3)
    assert abs(float(out.L[0])) < 1e-5


def test_grin_bends_toward_higher_index():
    """Rays curve toward increasing n (positive nr2 pulls outward ray in)."""
    med = GRINMedium(n0=1.5, nr2=-0.02)  # index decreases off-axis
    ray = RealRays.create(1.0, 0.0, 0.0, 0.0, 0.0, 1.0, 1.0, 0.55)
    out = GRINPropagation(med, num_steps=128).propagate(ray, 10.0)
    assert float(out.x[0]) < 1.0  # bent toward the axis (higher n)


def test_grin_direction_stays_unit():
    med = GRINMedium(n0=1.5, nr2=-0.01, nr4=1e-4, nz1=5e-4)
    rng = np.random.default_rng(0)
    n = 32
    L = rng.uniform(-0.2, 0.2, n)
    M = rng.uniform(-0.2, 0.2, n)
    N = np.sqrt(1 - L**2 - M**2)
    rays = RealRays.create(rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
                           0.0, L, M, N, 1.0, 0.55)
    out = GRINPropagation(med, num_steps=64).propagate(rays, 20.0)
    norm = np.asarray(out.L**2 + out.M**2 + out.N**2)
    np.testing.assert_allclose(norm, 1.0, atol=1e-8)


def test_grin_opd_exceeds_homogeneous_on_axis_for_raised_center():
    """With n highest on axis, the axial ray's OPD uses the peak index."""
    med = GRINMedium(n0=1.7, nr2=-0.05)
    ray = RealRays.create(0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 1.0, 0.55)
    out = GRINPropagation(med, num_steps=32).propagate(ray, 10.0)
    np.testing.assert_allclose(float(out.opd[0]), 17.0, rtol=1e-10)


def test_grin_is_differentiable():
    med = GRINMedium(n0=1.5, nr2=-0.02)
    ray = RealRays.create(0.5, 0.0, 0.0, 0.0, 0.0, 1.0, 1.0, 0.55)

    def exit_x(nr2):
        m = GRINMedium(n0=1.5, nr2=nr2)
        return GRINPropagation(m, num_steps=64).propagate(ray, 10.0).x[0]

    g = jax.grad(exit_x)(jnp.asarray(-0.02))
    assert np.isfinite(float(g)) and float(g) != 0.0


def test_grin_jits_cleanly():
    med = GRINMedium(n0=1.5, nr2=-0.02)
    prop = GRINPropagation(med, num_steps=32)
    ray = RealRays.create(0.3, 0.0, 0.0, 0.0, 0.0, 1.0, 1.0, 0.55)
    f = jax.jit(lambda r, t: prop.propagate(r, t))
    out = f(ray, 5.0)
    assert np.isfinite(float(out.x[0]))


def test_grin_dict_round_trip():
    med = GRINMedium(n0=1.6, nr2=-0.03, nr4=1e-5, nz1=1e-4, nz2=0.0)
    p = GRINPropagation(med, num_steps=48)
    p2 = BasePropagationModel.from_dict(p.to_dict())
    assert isinstance(p2, GRINPropagation)
    assert p2.num_steps == 48
    assert p2.medium.to_dict() == med.to_dict()


def test_axial_gradient_accelerates_opd():
    """nz1 > 0: index rises along z; OPD > n0 * t."""
    med = GRINMedium(n0=1.5, nz1=0.01)
    ray = RealRays.create(0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 1.0, 0.55)
    out = GRINPropagation(med, num_steps=64).propagate(ray, 10.0)
    expected = 1.5 * 10.0 + 0.01 * 10.0**2 / 2  # integral of n0 + nz1 z
    np.testing.assert_allclose(float(out.opd[0]), expected, rtol=1e-9)


def test_homogeneous_propagation_unchanged():
    from optiland_tpu.materials import IdealMaterial

    h = HomogeneousPropagation(IdealMaterial(1.5))
    r = _ray(x=0.0)
    out = h.propagate(r, 20.0)
    np.testing.assert_allclose(float(out.z[0]), 20.0)
    np.testing.assert_allclose(float(out.opd[0]), 30.0)
