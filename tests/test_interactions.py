"""Thin-lens / phase interactions, scatter, and phase-profile tests."""

import jax
import numpy as np
import pytest

from optiland_tpu.optic import Optic
from optiland_tpu.phase import (
    ConstantPhaseProfile,
    GridPhaseProfile,
    LinearGratingPhaseProfile,
    RadialPhaseProfile,
)
from optiland_tpu.scatter import GaussianBSDF, LambertianBSDF
from tests.conftest import assert_allclose


def _thin_lens_system(f=50.0):
    o = Optic()
    o.surfaces.add(index=0, radius=np.inf, thickness=np.inf)
    o.surfaces.add(index=1, surface_type="paraxial", f=f, thickness=f,
                   is_stop=True)
    o.surfaces.add(index=2)
    o.set_aperture("EPD", 10.0)
    o.fields.set_type("angle")
    o.fields.add(y=0)
    o.fields.add(y=5)
    o.wavelengths.add(0.55, is_primary=True)
    return o


def test_thin_lens_focal_length():
    o = _thin_lens_system(50.0)
    assert_allclose(float(np.ravel(o.paraxial.f2())[0]), 50.0, rtol=1e-10)


def test_thin_lens_perfect_focus():
    o = _thin_lens_system(50.0)
    r = o.trace(Hy=0.0, num_rays=5)
    assert float(np.std(np.asarray(r.y))) < 1e-12


def test_thin_lens_off_axis_field():
    o = _thin_lens_system(50.0)
    r = o.trace(Hy=1.0, num_rays=5)
    y = np.asarray(r.y)
    # ideal lens: all rays land at f*tan(theta)
    assert_allclose(y, np.full_like(y, 50.0 * np.tan(np.radians(5.0))),
                    rtol=1e-9)


def _phase_system(profile):
    o = Optic()
    o.surfaces.add(index=0, radius=np.inf, thickness=np.inf)
    o.surfaces.add(index=1, surface_type="standard", thickness=50.0,
                   is_stop=True, phase_profile=profile)
    o.surfaces.add(index=2)
    o.set_aperture("EPD", 10.0)
    o.fields.set_type("angle")
    o.fields.add(y=0)
    o.wavelengths.add(0.55, is_primary=True)
    return o


def test_phase_constant_is_noop_direction():
    o = _phase_system(ConstantPhaseProfile(1.0))
    r = o.trace(Hy=0.0, num_rays=4)
    N = np.asarray(r.N)
    assert_allclose(N, np.ones_like(N), rtol=1e-12)


def test_phase_radial_focuses():
    """A radial phase a2 r^2 with a2 = -pi/(lambda f) acts as a lens."""
    f = 100.0
    wl_mm = 0.55e-3
    a2 = -np.pi / (wl_mm * f)
    o = _phase_system(RadialPhaseProfile([a2]))
    o.surfaces.surfaces[1].thickness = f
    o._invalidate()
    r = o.trace(Hy=0.0, num_rays=5)
    assert float(np.std(np.asarray(r.y))) < 0.01  # residual spherical aberration of the flat metalens


def test_phase_grating_deflects():
    period = 0.01  # mm -> strong deflection
    o = _phase_system(LinearGratingPhaseProfile(period, angle=np.pi / 2))
    r = o.trace(Hy=0.0, num_rays=3)
    M = np.asarray(r.M)
    # grating equation: sin(theta) = lambda/period
    assert_allclose(M, np.full_like(M, 0.55e-3 / period), rtol=1e-9)


def test_grid_phase_profile_interpolates():
    xs = np.linspace(-1, 1, 11)
    ys = np.linspace(-1, 1, 11)
    X, Y = np.meshgrid(xs, ys)
    grid = 2.0 * X + 3.0 * Y
    p = GridPhaseProfile(xs, ys, grid)
    val = np.asarray(p.get_phase(np.array([0.25]), np.array([-0.5])))
    assert_allclose(val, [2 * 0.25 + 3 * -0.5], rtol=1e-9)
    gx, gy, _ = p.get_gradient(np.array([0.25]), np.array([-0.5]))
    assert_allclose(np.asarray(gx), [2.0], rtol=1e-9)
    assert_allclose(np.asarray(gy), [3.0], rtol=1e-9)


def test_lambertian_scatter_statistics():
    key = jax.random.PRNGKey(0)
    n = 20000
    z = np.zeros(n)
    L, M, N = LambertianBSDF().scatter(
        key, z, z, np.ones(n), z, z, -np.ones(n)
    )
    L, M, N = np.asarray(L), np.asarray(M), np.asarray(N)
    # unit vectors in the -z hemisphere
    assert_allclose(L**2 + M**2 + N**2, np.ones(n), rtol=1e-9)
    assert np.all(N <= 0)
    assert abs(np.mean(L)) < 0.02 and abs(np.mean(M)) < 0.02


def test_gaussian_scatter_width():
    key = jax.random.PRNGKey(1)
    n = 20000
    z = np.zeros(n)
    sigma = 0.05
    L, M, N = GaussianBSDF(sigma).scatter(
        key, z, z, np.ones(n), z, z, -np.ones(n)
    )
    L = np.asarray(L)
    assert abs(np.std(L) - sigma) < 0.005
