"""Zernike polynomial mathematical properties: orthogonality, known closed
forms, norm constants, fit round trips, derivative consistency
(reference: tests/test_zernike.py, optiland/zernike/)."""

import numpy as np
import pytest

from optiland_tpu.zernike import (
    ZernikeFit,
    ZernikeFringe,
    ZernikeNoll,
    ZernikeStandard,
    radial_derivative,
    radial_term,
)


# -- radial polynomial closed forms --------------------------------------------

R = np.linspace(0.0, 1.0, 101)


def test_radial_r00_is_one():
    np.testing.assert_allclose(np.asarray(radial_term(0, 0, R)), 1.0)


def test_radial_r11_is_r():
    np.testing.assert_allclose(np.asarray(radial_term(1, 1, R)), R,
                               atol=1e-14)


def test_radial_r20_defocus():
    np.testing.assert_allclose(
        np.asarray(radial_term(2, 0, R)), 2 * R**2 - 1, atol=1e-13
    )


def test_radial_r22_astig():
    np.testing.assert_allclose(
        np.asarray(radial_term(2, 2, R)), R**2, atol=1e-13
    )


def test_radial_r31_coma():
    np.testing.assert_allclose(
        np.asarray(radial_term(3, 1, R)), 3 * R**3 - 2 * R, atol=1e-12
    )


def test_radial_r40_spherical():
    np.testing.assert_allclose(
        np.asarray(radial_term(4, 0, R)), 6 * R**4 - 6 * R**2 + 1, atol=1e-12
    )


def test_radial_derivative_matches_fd():
    h = 1e-6
    for n, m in [(2, 0), (3, 1), (4, 0), (4, 2), (5, 3), (6, 0)]:
        r = np.linspace(0.05, 0.95, 19)
        fd = (np.asarray(radial_term(n, m, r + h))
              - np.asarray(radial_term(n, m, r - h))) / (2 * h)
        np.testing.assert_allclose(
            np.asarray(radial_derivative(n, m, r)), fd, rtol=1e-5,
            atol=1e-6,
        )


def test_radial_at_unit_radius_is_one():
    """R_n^m(1) = 1 for all (n, m)."""
    for n, m in [(0, 0), (2, 0), (3, 1), (4, 0), (5, 5), (6, 2)]:
        assert float(np.asarray(radial_term(n, m, 1.0))) == pytest.approx(1.0)


# -- orthogonality / indexing ---------------------------------------------------


def _disk_grid(n=301):
    x, y = np.meshgrid(np.linspace(-1, 1, n), np.linspace(-1, 1, n))
    mask = x**2 + y**2 <= 1.0
    r = np.sqrt(x**2 + y**2)[mask]
    phi = np.arctan2(y, x)[mask]
    return r, phi


def test_standard_terms_orthogonal_on_disk():
    r, phi = _disk_grid()
    z = ZernikeStandard(num_terms=10)
    vals = []
    for n, m in z.indices[:8]:
        c = 1.0
        vals.append(np.asarray(z.get_term(c, n, m, r, phi)))
    for i in range(8):
        for j in range(i + 1, 8):
            dot = np.mean(vals[i] * vals[j])
            norm = np.sqrt(np.mean(vals[i] ** 2) * np.mean(vals[j] ** 2))
            assert abs(dot) < 0.02 * norm, (i, j)


def test_standard_indices_ansi_order():
    z = ZernikeStandard(num_terms=6)
    assert z.indices[:6] == [(0, 0), (1, -1), (1, 1), (2, -2), (2, 0), (2, 2)]


def test_fringe_indices_start():
    z = ZernikeFringe(num_terms=5)
    assert z.indices[0] == (0, 0)
    assert (1, 1) in z.indices[:3] and (1, -1) in z.indices[:3]


def test_noll_indices_start():
    z = ZernikeNoll(num_terms=4)
    assert z.indices[0] == (0, 0)
    # Noll #2 is x-tilt (1,1), #3 is y-tilt (1,-1)
    assert z.indices[1] == (1, 1)
    assert z.indices[2] == (1, -1)


def test_poly_sums_terms():
    r, phi = np.array([0.3, 0.7]), np.array([0.2, -1.0])
    coeffs = [0.5, -0.2, 0.1]
    z = ZernikeStandard(coeffs=coeffs)
    total = np.asarray(z.poly(r, phi))
    parts = z.terms(r, phi)
    np.testing.assert_allclose(total, np.sum(np.asarray(parts), axis=0),
                               atol=1e-12)


def test_derivatives_cartesian_match_fd():
    z = ZernikeFringe(coeffs=[0.1, -0.05, 0.02, 0.03, -0.01])
    x = np.array([0.2, -0.4, 0.55])
    y = np.array([0.1, 0.3, -0.25])
    h = 1e-6

    def s(xx, yy):
        r = np.sqrt(xx**2 + yy**2)
        phi = np.arctan2(yy, xx)
        return np.asarray(z.poly(r, phi))

    dzdx, dzdy = z.derivatives_cartesian(x, y)
    np.testing.assert_allclose(
        np.asarray(dzdx), (s(x + h, y) - s(x - h, y)) / (2 * h),
        rtol=1e-4, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(dzdy), (s(x, y + h) - s(x, y - h)) / (2 * h),
        rtol=1e-4, atol=1e-7,
    )


# -- fitting --------------------------------------------------------------------


def _surface(x, y):
    r = np.sqrt(x**2 + y**2)
    phi = np.arctan2(y, x)
    z = ZernikeFringe(coeffs=[0.2, 0.05, -0.08, 0.12, 0.0, 0.03])
    return np.asarray(z.poly(r, phi))


def test_fit_recovers_coefficients():
    rng = np.random.default_rng(7)
    n = 600
    r = np.sqrt(rng.uniform(size=n))
    phi = rng.uniform(0, 2 * np.pi, n)
    x, y = r * np.cos(phi), r * np.sin(phi)
    fit = ZernikeFit(x, y, _surface(x, y), zernike_type="fringe",
                     num_terms=8)
    got = np.asarray(fit.coeffs)[:6]
    np.testing.assert_allclose(
        got, [0.2, 0.05, -0.08, 0.12, 0.0, 0.03], atol=1e-8
    )


def test_fit_noise_robustness():
    rng = np.random.default_rng(8)
    n = 2000
    r = np.sqrt(rng.uniform(size=n))
    phi = rng.uniform(0, 2 * np.pi, n)
    x, y = r * np.cos(phi), r * np.sin(phi)
    z = _surface(x, y) + rng.normal(0, 1e-3, n)
    fit = ZernikeFit(x, y, z, zernike_type="fringe", num_terms=8)
    np.testing.assert_allclose(
        np.asarray(fit.coeffs)[:4], [0.2, 0.05, -0.08, 0.12], atol=1e-3
    )


def test_fit_types_dispatch():
    rng = np.random.default_rng(9)
    n = 400
    r = np.sqrt(rng.uniform(size=n))
    phi = rng.uniform(0, 2 * np.pi, n)
    x, y = r * np.cos(phi), r * np.sin(phi)
    z = _surface(x, y)
    for t in ("fringe", "standard", "noll"):
        fit = ZernikeFit(x, y, z, zernike_type=t, num_terms=10)
        # all bases span the same low-order space: residual ~ 0
        r2 = np.sqrt(x**2 + y**2)
        recon = np.asarray(fit.zernike.poly(r2, np.arctan2(y, x)))
        np.testing.assert_allclose(recon, z, atol=1e-7)
