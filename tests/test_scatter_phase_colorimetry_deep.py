"""Scatter BSDFs (sampling statistics + energy), diffractive phase profiles
(gradient consistency, grating orders), and colorimetry invariants
(reference: tests/test_scatter.py-style, optiland/scatter.py,
optiland/phase/, optiland/colorimetry/)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optiland_tpu.colorimetry import (
    spectrum_to_xyz,
    xyz_to_srgb,
    xyz_to_xyY,
)
from optiland_tpu.phase import (
    BasePhaseProfile,
    ConstantPhaseProfile,
    GridPhaseProfile,
    LinearGratingPhaseProfile,
    RadialPhaseProfile,
)
from optiland_tpu.scatter import BaseBSDF, GaussianBSDF, LambertianBSDF


# -- BSDFs ---------------------------------------------------------------------


def test_lambertian_scatter_unit_directions():
    b = LambertianBSDF()
    key = jax.random.PRNGKey(0)
    n = 512
    L = jnp.zeros(n)
    M = jnp.zeros(n)
    N = jnp.ones(n)
    nx, ny, nz = jnp.zeros(n), jnp.zeros(n), -jnp.ones(n)
    L2, M2, N2 = b.scatter(key, L, M, N, nx, ny, nz)
    norm = np.asarray(L2**2 + M2**2 + N2**2)
    np.testing.assert_allclose(norm, 1.0, atol=1e-6)


def test_lambertian_forward_about_aligned_normal():
    # The trace passes the normal aligned with propagation; scattered rays
    # fill the hemisphere about it.
    b = LambertianBSDF()
    key = jax.random.PRNGKey(1)
    n = 512
    L, M, N = jnp.zeros(n), jnp.zeros(n), jnp.ones(n)
    nx, ny, nz = jnp.zeros(n), jnp.zeros(n), jnp.ones(n)
    _, _, N2 = b.scatter(key, L, M, N, nx, ny, nz)
    assert np.mean(np.asarray(N2)) > 0.5


def test_gaussian_sigma_controls_spread():
    key = jax.random.PRNGKey(2)
    n = 2048
    L, M, N = jnp.zeros(n), jnp.zeros(n), jnp.ones(n)
    nx, ny, nz = jnp.zeros(n), jnp.zeros(n), -jnp.ones(n)
    narrow = GaussianBSDF(sigma=0.01)
    wide = GaussianBSDF(sigma=0.2)
    Ln, _, _ = narrow.scatter(key, L, M, N, nx, ny, nz)
    Lw, _, _ = wide.scatter(key, L, M, N, nx, ny, nz)
    assert np.std(np.asarray(Ln)) < np.std(np.asarray(Lw)) / 3


def test_gaussian_scatter_centered_on_specular():
    key = jax.random.PRNGKey(3)
    n = 4096
    L, M, N = jnp.zeros(n), jnp.zeros(n), jnp.ones(n)
    nx, ny, nz = jnp.zeros(n), jnp.zeros(n), -jnp.ones(n)
    L2, M2, _ = GaussianBSDF(sigma=0.05).scatter(key, L, M, N, nx, ny, nz)
    assert abs(np.mean(np.asarray(L2))) < 5e-3
    assert abs(np.mean(np.asarray(M2))) < 5e-3


def test_bsdf_dict_round_trip():
    g = GaussianBSDF(sigma=0.07)
    g2 = BaseBSDF.from_dict(g.to_dict())
    assert isinstance(g2, GaussianBSDF)
    assert g2.sigma == 0.07
    l2 = BaseBSDF.from_dict(LambertianBSDF().to_dict())
    assert isinstance(l2, LambertianBSDF)


def test_scatter_deterministic_under_same_key():
    b = LambertianBSDF()
    n = 64
    args = (jnp.zeros(n), jnp.zeros(n), jnp.ones(n),
            jnp.zeros(n), jnp.zeros(n), -jnp.ones(n))
    out1 = b.scatter(jax.random.PRNGKey(9), *args)
    out2 = b.scatter(jax.random.PRNGKey(9), *args)
    np.testing.assert_allclose(np.asarray(out1[0]), np.asarray(out2[0]))


# -- phase profiles --------------------------------------------------------------

X = np.linspace(-3, 3, 11)
Y = np.linspace(-3, 3, 11)


def _grad_fd(profile, x, y, wl=0.55, h=1e-6):
    gx = (np.asarray(profile.get_phase(x + h, y, wl))
          - np.asarray(profile.get_phase(x - h, y, wl))) / (2 * h)
    gy = (np.asarray(profile.get_phase(x, y + h, wl))
          - np.asarray(profile.get_phase(x, y - h, wl))) / (2 * h)
    return gx, gy


def test_constant_phase_zero_gradient():
    p = ConstantPhaseProfile(phase=1.5)
    np.testing.assert_allclose(np.asarray(p.get_phase(X, Y)), 1.5)
    gx, gy = p.get_gradient(X, Y)[:2]
    np.testing.assert_allclose(np.asarray(gx), 0.0)
    np.testing.assert_allclose(np.asarray(gy), 0.0)


@pytest.mark.parametrize("profile", [
    RadialPhaseProfile(coefficients=[2.0, -0.3]),
    LinearGratingPhaseProfile(period=2.0, angle=0.3, order=1),
])
def test_phase_gradient_matches_fd(profile):
    gx, gy = profile.get_gradient(X, Y, 0.55)[:2]
    fx, fy = _grad_fd(profile, X, Y)
    np.testing.assert_allclose(np.asarray(gx), fx, rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(gy), fy, rtol=1e-5, atol=1e-7)


def test_linear_grating_constant_gradient():
    p = LinearGratingPhaseProfile(period=2.0, order=1)
    gx, gy = p.get_gradient(X, Y, 0.55)[:2]
    gx = np.asarray(gx)
    np.testing.assert_allclose(gx, gx.flat[0])
    np.testing.assert_allclose(np.asarray(gy), 0.0, atol=1e-15)


def test_grid_phase_interpolates():
    gx_ = np.linspace(-5, 5, 21)
    gy_ = np.linspace(-5, 5, 21)
    XX, YY = np.meshgrid(gx_, gy_, indexing="ij")
    table = 0.5 * YY**2 - 0.2 * XX**2  # grid is (ny, nx): rows follow y
    p = GridPhaseProfile(x_coords=gx_, y_coords=gy_, phase_grid=table.T)
    got = np.asarray(p.get_phase(np.array([1.0]), np.array([2.0])))
    assert got[0] == pytest.approx(0.5 * 4.0 - 0.2 * 1.0, abs=0.05)


def test_phase_profile_dict_round_trip():
    for p in (ConstantPhaseProfile(0.7),
              RadialPhaseProfile(coefficients=[1.0, -0.1]),
              LinearGratingPhaseProfile(period=3.0, angle=0.2, order=2)):
        p2 = BasePhaseProfile.from_dict(p.to_dict())
        np.testing.assert_allclose(
            np.asarray(p2.get_phase(X, Y, 0.55)),
            np.asarray(p.get_phase(X, Y, 0.55)),
            atol=1e-12,
        )


# -- colorimetry ------------------------------------------------------------------


def test_perfect_white_reflectance_is_d65():
    # spectrum_to_xyz is a reflectance against D65 (Y=100 for perfect
    # white), so a flat reflector lands on the D65 white point.
    wl = np.linspace(380, 780, 201)
    X_, Y_, Z_ = spectrum_to_xyz(wl, np.ones_like(wl))
    assert float(Y_) == pytest.approx(100.0, abs=0.5)
    x, y, _ = xyz_to_xyY(X_, Y_, Z_)
    assert float(x) == pytest.approx(0.3127, abs=0.005)
    assert float(y) == pytest.approx(0.3290, abs=0.005)


def test_monochromatic_green_chromaticity():
    wl = np.linspace(380, 780, 401)
    spect = np.where(np.abs(wl - 550) < 2, 1.0, 0.0)
    X_, Y_, Z_ = spectrum_to_xyz(wl, spect)
    x, y, _ = xyz_to_xyY(X_, Y_, Z_)
    # 550 nm locus point: approx (0.30, 0.69)
    assert float(x) == pytest.approx(0.30, abs=0.02)
    assert float(y) == pytest.approx(0.69, abs=0.02)


def test_srgb_white_point():
    # D65 white (Y=100 scale) maps to (255,255,255) 8-bit sRGB
    rgb = np.ravel(np.asarray(xyz_to_srgb(95.047, 100.0, 108.883)))
    # the reference truncates (astype(int)), so exact-white channels may
    # land on 254 (reference: colorimetry/core.py:250-258)
    assert (rgb >= 254).all() and (rgb <= 255).all()


def test_srgb_clipped_to_8bit_range():
    rgb = np.asarray(xyz_to_srgb(150.0, 20.0, 10.0))
    assert (rgb >= 0).all() and (rgb <= 255).all()


def test_xyY_round_trip_luminance():
    x, y, Yl = xyz_to_xyY(0.4, 0.5, 0.3)
    assert float(Yl) == pytest.approx(0.5)
