"""Deep geometry-family parity: sag, normal, and oblique ray distance for
extra parameter sets of every family, vs reference-generated goldens
(reference: tests/test_geometries.py breadth; goldens from
tools/gen_goldens_r3.py geom)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from optiland_tpu.core import geometry as G
from tests.conftest import assert_allclose

C1 = np.array([[0.0, 2e-4, -1e-6], [1e-4, -2e-5, 1e-7],
               [0.0, 5e-7, 0.0]]).ravel()
ZC = [1e-3, -2e-3, 5e-4, 3e-4, 1e-4, 2e-4]

# tag -> (code, radius, conic, coeffs, p1, p2, aux); parameter slots follow
# the library convention (toroidal: p1=radius_y, p2=conic; biconic:
# p1=radius_y, p2=conic_y; chebyshev: p1/p2 = norm_x/norm_y; zernike:
# p1 = norm_radius, aux = (convention,)).
CASES = {
    "plane_0": (G.PLANE, np.inf, 0.0, [], 1.0, 1.0, None),
    "standard_sphere": (G.STANDARD, 25.0, 0.0, [], 1.0, 1.0, None),
    "standard_hyper": (G.STANDARD, -60.0, -2.5, [], 1.0, 1.0, None),
    "standard_oblate": (G.STANDARD, 40.0, 1.5, [], 1.0, 1.0, None),
    "even_strong": (G.EVEN_ASPHERE, 18.0, -0.9, [5e-4, -2e-6, 3e-9],
                    1.0, 1.0, None),
    "even_flat": (G.EVEN_ASPHERE, np.inf, 0.0, [1e-4, 1e-7],
                  1.0, 1.0, None),
    "odd_strong": (G.ODD_ASPHERE, 30.0, 0.3, [1e-3, -1e-5, 1e-7],
                   1.0, 1.0, None),
    "poly_xy": (G.POLYNOMIAL_XY, 45.0, -0.2, C1, 1.0, 1.0, None),
    "cheb_1": (G.CHEBYSHEV, 45.0, -0.2, C1, 9.0, 10.0, None),
    "zern_1": (G.ZERNIKE_SAG, 45.0, -0.2, ZC, 10.0, 1.0, ("standard",)),
    "toroid_1": (G.TOROIDAL, 80.0, 0.0, [1e-4, -1e-7], 40.0, -0.5, None),
    "biconic_1": (G.BICONIC, 70.0, -0.3, [], 45.0, -0.7, None),
}


def _args(tag):
    code, radius, conic, coeffs, p1, p2, aux = CASES[tag]
    return (
        code, jnp.asarray(radius), jnp.asarray(conic),
        jnp.asarray(np.asarray(coeffs, float)),
        jnp.asarray(p1), jnp.asarray(p2), aux,
    )


@pytest.mark.parametrize("tag", list(CASES))
def test_sag_deep(goldens, tag):
    g = goldens("geom_deep")
    code, radius, conic, coeffs, p1, p2, aux = _args(tag)
    val = G.sag_static(code, radius, conic, coeffs,
                       jnp.asarray(g["x"]), jnp.asarray(g["y"]),
                       p1=p1, p2=p2, aux=aux)
    assert_allclose(val, g[f"{tag}_sag"], rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("tag", list(CASES))
def test_normal_deep(goldens, tag):
    g = goldens("geom_deep")
    code, radius, conic, coeffs, p1, p2, aux = _args(tag)
    nx, ny, nz = G.surface_normal_static(
        code, radius, conic, coeffs,
        jnp.asarray(g["x"]), jnp.asarray(g["y"]), p1=p1, p2=p2, aux=aux,
    )
    assert_allclose(nx, g[f"{tag}_nx"], rtol=1e-6, atol=1e-9)
    assert_allclose(ny, g[f"{tag}_ny"], rtol=1e-6, atol=1e-9)
    assert_allclose(nz, g[f"{tag}_nz"], rtol=1e-6, atol=1e-9)


@pytest.mark.parametrize("tag", list(CASES))
def test_distance_deep(goldens, tag):
    g = goldens("geom_deep")
    key = f"{tag}_dist"
    if key not in g:
        pytest.skip("no reference distance for this case")
    code, radius, conic, coeffs, p1, p2, aux = _args(tag)
    x = np.asarray(g["x"]) * 0.6
    y = np.asarray(g["y"]) * 0.6
    z = np.full_like(x, -12.0)
    L = np.full_like(x, 0.08)
    M = np.full_like(x, -0.05)
    N = np.sqrt(1 - L**2 - M**2)
    t = G.distance_static(
        code, radius, conic, coeffs,
        jnp.asarray(x), jnp.asarray(y), jnp.asarray(z),
        jnp.asarray(L), jnp.asarray(M), jnp.asarray(N),
        p1=p1, p2=p2, aux=aux,
    )
    # Reference Newton tolerance is 1e-10; compare where both converged to
    # a real intersection.
    ref = np.asarray(g[key])
    ours = np.asarray(t)
    ok = np.isfinite(ref)
    assert ok.any()
    np.testing.assert_allclose(ours[ok], ref[ok], rtol=1e-6, atol=1e-7)
