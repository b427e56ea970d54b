"""Zernike polynomial tests: analytic values, indexing, fitting."""

import numpy as np
import pytest

from optiland_tpu.zernike import (
    ZernikeFit,
    ZernikeFringe,
    ZernikeNoll,
    ZernikeStandard,
)
from tests.conftest import assert_allclose


def test_standard_indices_first_terms():
    z = ZernikeStandard(num_terms=10)
    # OSA/ANSI ordering: (0,0),(1,-1),(1,1),(2,-2),(2,0),(2,2),...
    assert z.indices[:6] == [(0, 0), (1, -1), (1, 1), (2, -2), (2, 0), (2, 2)]


def test_noll_indices_first_terms():
    z = ZernikeNoll(num_terms=8)
    # Noll: j=1:(0,0), j=2:(1,1), j=3:(1,-1), j=4:(2,0), j=5:(2,-2), j=6:(2,2)
    assert z.indices[:6] == [(0, 0), (1, 1), (1, -1), (2, 0), (2, -2), (2, 2)]


def test_fringe_indices_first_terms():
    z = ZernikeFringe(num_terms=9)
    # Fringe: 1:(0,0), 2:(1,1), 3:(1,-1), 4:(2,0), 5:(2,2), 6:(2,-2), 7:(3,1)
    assert z.indices[:7] == [
        (0, 0), (1, 1), (1, -1), (2, 0), (2, 2), (2, -2), (3, 1)
    ]


def test_fringe_defocus_analytic():
    # Fringe term 4 is 2r^2 - 1 (unnormalized)
    c = np.zeros(9)
    c[3] = 1.0
    z = ZernikeFringe(coeffs=c)
    r = np.array([0.0, 0.5, 1.0])
    assert_allclose(z.poly(r, np.zeros(3)), 2 * r**2 - 1, rtol=1e-12)


def test_standard_defocus_normalized():
    # Standard Z(2,0) = sqrt(3) (2r^2 - 1)
    c = np.zeros(6)
    c[4] = 1.0
    z = ZernikeStandard(coeffs=c)
    r = np.array([0.0, 0.5, 1.0])
    assert_allclose(z.poly(r, np.zeros(3)), np.sqrt(3) * (2 * r**2 - 1), rtol=1e-12)


def test_azimuthal_signs():
    # m<0 -> sin, m>0 -> cos
    c = np.zeros(3)
    c[1] = 1.0  # standard index 1 = (1,-1): 2 r sin(phi)
    z = ZernikeStandard(coeffs=c)
    val = z.poly(np.array([1.0]), np.array([np.pi / 2]))
    assert_allclose(val, [2.0], rtol=1e-12)


@pytest.mark.parametrize("scheme", ["standard", "fringe", "noll"])
def test_fit_roundtrip(scheme):
    """Fitting samples of a known Zernike sum recovers its coefficients."""
    rng = np.random.default_rng(42)
    n_terms = 10
    true_coeffs = rng.normal(size=n_terms)
    x = rng.uniform(-0.7, 0.7, 400)
    y = rng.uniform(-0.7, 0.7, 400)
    from optiland_tpu.zernike import ZERNIKE_CLASSES

    zc = ZERNIKE_CLASSES[scheme](coeffs=true_coeffs)
    r = np.sqrt(x**2 + y**2)
    phi = np.arctan2(y, x)
    z = np.asarray(zc.poly(r, phi))
    fit = ZernikeFit(x, y, z, zernike_type=scheme, num_terms=n_terms)
    assert_allclose(fit.coeffs, true_coeffs, rtol=1e-8, atol=1e-10)
    assert float(fit.rms_error()) < 1e-10


def test_cartesian_derivatives_match_finite_difference():
    c = np.zeros(10)
    c[4] = 0.7
    c[7] = -0.3
    z = ZernikeStandard(coeffs=c)
    x = np.array([0.3, -0.2, 0.5])
    y = np.array([0.1, 0.4, -0.3])
    eps = 1e-6

    def poly_xy(xx, yy):
        return np.asarray(
            z.poly(np.sqrt(xx**2 + yy**2), np.arctan2(yy, xx))
        )

    dzdx, dzdy = z.derivatives_cartesian(x, y)
    fd_x = (poly_xy(x + eps, y) - poly_xy(x - eps, y)) / (2 * eps)
    fd_y = (poly_xy(x, y + eps) - poly_xy(x, y - eps)) / (2 * eps)
    assert_allclose(dzdx, fd_x, rtol=1e-5, atol=1e-8)
    assert_allclose(dzdy, fd_y, rtol=1e-5, atol=1e-8)
