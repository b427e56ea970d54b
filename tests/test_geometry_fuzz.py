"""Randomized self-consistency sweeps over geometry families and the
refraction kernel — invariants that must hold for ARBITRARY parameters,
complementing the fixed-point goldens:

1. AD surface normal == finite differences of the sag (same surface).
2. distance_static lands rays exactly ON the surface (sag residual ~ 0).
3. Vector refraction satisfies Snell's law (tangential momentum) and
   keeps the refracted ray in the plane of incidence.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from optiland_tpu.core import geometry as G
from optiland_tpu.ops import kernels

RNG = np.random.default_rng(2026)


def _rand_case(code, rng):
    """Random parameters for one geometry family (moderate curvatures so
    the test grid stays inside the valid conic domain)."""
    radius = float(rng.uniform(25.0, 120.0) * rng.choice([-1.0, 1.0]))
    conic = float(rng.uniform(-1.5, 0.8))
    p1 = p2 = 1.0
    coeffs = jnp.zeros(0)
    if code == G.PLANE:
        radius, conic = np.inf, 0.0
    elif code == G.EVEN_ASPHERE:
        coeffs = jnp.asarray(rng.uniform(-1, 1, 3) * [1e-4, 1e-7, 1e-10])
    elif code == G.ODD_ASPHERE:
        coeffs = jnp.asarray(rng.uniform(-1, 1, 3) * [1e-3, 1e-5, 1e-7])
    elif code == G.POLYNOMIAL_XY:
        coeffs = jnp.asarray(rng.uniform(-1, 1, 9) * 2e-4)
    elif code == G.CHEBYSHEV:
        coeffs = jnp.asarray(rng.uniform(-1, 1, 9) * 1e-3)
        p1, p2 = 9.0, 10.0
    elif code == G.ZERNIKE_SAG:
        coeffs = jnp.asarray(rng.uniform(-1, 1, 6) * 1e-3)
        p1 = 10.0
    elif code == G.TOROIDAL:
        coeffs = jnp.asarray(rng.uniform(-1, 1, 2) * [1e-4, 1e-7])
        p1 = float(rng.uniform(30.0, 90.0))  # Y-Z curve radius
    elif code == G.BICONIC:
        p1 = float(rng.uniform(30.0, 90.0))
        p2 = float(rng.uniform(-1.0, 0.5))
    return radius, conic, coeffs, p1, p2


FAMILIES = [G.PLANE, G.STANDARD, G.EVEN_ASPHERE, G.ODD_ASPHERE,
            G.POLYNOMIAL_XY, G.CHEBYSHEV, G.ZERNIKE_SAG, G.TOROIDAL,
            G.BICONIC]
IDS = ["plane", "standard", "even", "odd", "poly", "cheb", "zern",
       "toroid", "biconic"]


@pytest.mark.parametrize("code", FAMILIES, ids=IDS)
@pytest.mark.parametrize("trial", range(3))
def test_normal_matches_fd_of_sag(code, trial):
    rng = np.random.default_rng(100 * code + trial)
    radius, conic, coeffs, p1, p2 = _rand_case(code, rng)
    x = jnp.asarray(rng.uniform(-6, 6, 20))
    y = jnp.asarray(rng.uniform(-6, 6, 20))
    h = 1e-6

    def sag(xx, yy):
        return np.asarray(G.sag_static(code, radius, conic, coeffs, xx, yy,
                                       p1=p1, p2=p2))

    dzdx = (sag(x + h, y) - sag(x - h, y)) / (2 * h)
    dzdy = (sag(x, y + h) - sag(x, y - h)) / (2 * h)
    mag = np.sqrt(dzdx**2 + dzdy**2 + 1)
    fx, fy, fz = dzdx / mag, dzdy / mag, -1.0 / mag

    nx, ny, nz = G.surface_normal_static(code, radius, conic, coeffs, x, y,
                                         p1=p1, p2=p2)
    if code == G.CHEBYSHEV:
        pytest.skip("chebyshev normal intentionally replicates the "
                    "reference's missing chain-rule factor")
    np.testing.assert_allclose(np.asarray(nx), fx, rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(ny), fy, rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(nz), fz, rtol=2e-5, atol=1e-7)


@pytest.mark.parametrize("code", FAMILIES, ids=IDS)
@pytest.mark.parametrize("trial", range(3))
def test_distance_lands_on_surface(code, trial):
    rng = np.random.default_rng(900 + 100 * code + trial)
    radius, conic, coeffs, p1, p2 = _rand_case(code, rng)
    n = 24
    x = jnp.asarray(rng.uniform(-4, 4, n))
    y = jnp.asarray(rng.uniform(-4, 4, n))
    z = jnp.full((n,), -15.0)
    L = jnp.asarray(rng.uniform(-0.1, 0.1, n))
    M = jnp.asarray(rng.uniform(-0.1, 0.1, n))
    N = jnp.sqrt(1 - L**2 - M**2)

    t = G.distance_static(code, radius, conic, coeffs, x, y, z, L, M, N,
                          p1=p1, p2=p2)
    xh = np.asarray(x + t * L)
    yh = np.asarray(y + t * M)
    zh = np.asarray(z + t * N)
    sag_h = np.asarray(G.sag_static(code, radius, conic, coeffs,
                                    jnp.asarray(xh), jnp.asarray(yh),
                                    p1=p1, p2=p2))
    resid = zh - sag_h
    np.testing.assert_allclose(resid, 0.0, atol=5e-9)
    assert (np.asarray(t) > 0).all()  # forward intersection


@pytest.mark.parametrize("trial", range(5))
def test_refract_snell_invariant(trial):
    """|n sin(theta)| tangential to the surface is conserved, and the
    refracted ray stays in the plane of incidence, for random normals and
    directions."""
    rng = np.random.default_rng(31 + trial)
    n = 64
    L, M, N = kernels.normalize(*[jnp.asarray(rng.normal(size=n))
                                  for _ in range(3)])
    nx, ny, nz = kernels.normalize(*[jnp.asarray(rng.normal(size=n))
                                     for _ in range(3)])
    n1 = float(rng.uniform(1.0, 1.9))
    n2 = float(rng.uniform(1.0, 1.9))
    L2, M2, N2 = kernels.refract(L, M, N, nx, ny, nz, n1, n2)

    # tangential component: n * (d x n_hat) is conserved in magnitude
    def tangential(Lv, Mv, Nv, scale):
        tx = Mv * nz - Nv * ny
        ty = Nv * nx - Lv * nz
        tz = Lv * ny - Mv * nx
        return scale * np.sqrt(np.asarray(tx**2 + ty**2 + tz**2))

    t_in = tangential(L, M, N, n1)
    t_out = tangential(L2, M2, N2, n2)
    ok = np.isfinite(np.asarray(L2))  # exclude TIR rays (NaN by design)
    assert ok.sum() >= 5  # TIR rays are NaN by design; keep enough refracted
    np.testing.assert_allclose(t_out[ok], t_in[ok], rtol=1e-10, atol=1e-12)

    # refracted direction is unit
    norm = np.asarray(L2**2 + M2**2 + N2**2)
    np.testing.assert_allclose(norm[ok], 1.0, atol=1e-10)

    # coplanarity: d_out . (d_in x n_hat) == 0
    cx = np.asarray(M * nz - N * ny)
    cy = np.asarray(N * nx - L * nz)
    cz = np.asarray(L * ny - M * nx)
    copl = np.asarray(L2) * cx + np.asarray(M2) * cy + np.asarray(N2) * cz
    np.testing.assert_allclose(copl[ok], 0.0, atol=1e-10)
