"""Geometry family parity tests: sag, normals, and aspheric traces."""

import jax.numpy as jnp
import numpy as np
import pytest

from optiland_tpu.core import geometry as G
from optiland_tpu.samples import AsphericSinglet
from tests.conftest import assert_allclose

CMAT = np.array([[0, 1e-4, -1e-6], [2e-4, 1e-5, 0], [1e-6, 0, 1e-8]])
ZC = [0.001, -0.002, 0.0005, 0.0003, 0.0001, 0.0002]

# name -> (code, radius, conic, coeffs, p1, p2, aux)
FAMILIES = {
    "even_asphere": (G.EVEN_ASPHERE, 50.0, -0.5, [1e-5, -2e-8, 3e-11], 1.0, 1.0, None),
    "odd_asphere": (G.ODD_ASPHERE, 50.0, -0.5, [1e-4, -1e-6, 1e-8], 1.0, 1.0, None),
    "polynomial": (G.POLYNOMIAL_XY, 50.0, -0.5, CMAT.ravel(), 1.0, 1.0, None),
    "chebyshev": (G.CHEBYSHEV, 50.0, -0.5, CMAT.ravel(), 6.0, 7.0, None),
    "zernike": (G.ZERNIKE_SAG, 50.0, -0.5, ZC, 8.0, 1.0, ("fringe",)),
    "toroidal": (G.TOROIDAL, 100.0, 0.0, [1e-5, -1e-8], 50.0, -0.5, None),
    "biconic": (G.BICONIC, 80.0, -0.2, [], 50.0, -0.8, None),
}


@pytest.mark.parametrize("name", list(FAMILIES))
def test_sag_parity(goldens, name):
    g = goldens("geometries")
    code, radius, conic, coeffs, p1, p2, aux = FAMILIES[name]
    coeffs = jnp.asarray(np.asarray(coeffs, float))
    val = G.sag_static(
        code, jnp.asarray(radius), jnp.asarray(conic), coeffs,
        jnp.asarray(g["x"]), jnp.asarray(g["y"]),
        p1=jnp.asarray(p1), p2=jnp.asarray(p2), aux=aux,
    )
    assert_allclose(val, g[f"{name}_sag"], rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("name", list(FAMILIES))
def test_normal_parity(goldens, name):
    g = goldens("geometries")
    code, radius, conic, coeffs, p1, p2, aux = FAMILIES[name]
    coeffs = jnp.asarray(np.asarray(coeffs, float))
    nx, ny, nz = G.surface_normal_static(
        code, jnp.asarray(radius), jnp.asarray(conic), coeffs,
        jnp.asarray(g["x"]), jnp.asarray(g["y"]),
        p1=jnp.asarray(p1), p2=jnp.asarray(p2), aux=aux,
    )
    assert_allclose(nx, g[f"{name}_nx"], rtol=1e-6, atol=1e-9)
    assert_allclose(ny, g[f"{name}_ny"], rtol=1e-6, atol=1e-9)
    assert_allclose(nz, g[f"{name}_nz"], rtol=1e-6, atol=1e-9)


def test_aspheric_singlet_trace_parity(goldens):
    g = goldens("geometries")
    lens = AsphericSinglet()
    res = lens.trace(Hy=0.0, wavelength=0.587, num_rays=5)
    for c in ("x", "y", "z", "L", "M", "N", "opd"):
        # Reference Newton tolerance is 1e-6; ours converges to roundoff.
        assert_allclose(getattr(res, c), g[f"asph_{c}"], rtol=1e-6, atol=1e-7)


def test_tilted_aspheric_trace_parity(goldens):
    g = goldens("geometries")
    from optiland_tpu.optic import Optic

    lens = Optic()
    lens.surfaces.add(index=0, radius=np.inf, thickness=np.inf)
    lens.surfaces.add(
        index=1, thickness=7, radius=20.0, is_stop=True, material="N-SF11",
        surface_type="even_asphere", conic=0.0,
        coefficients=[-2.248851e-4, -4.690412e-6, -6.404376e-8],
        rx=0.02, dy=0.3,
    )
    lens.surfaces.add(index=2, thickness=21.56201105)
    lens.surfaces.add(index=3)
    lens.set_aperture(aperture_type="EPD", value=20.0)
    lens.fields.set_type(field_type="angle")
    lens.fields.add(y=0)
    lens.wavelengths.add(value=0.587, is_primary=True)
    res = lens.trace(Hy=0.0, wavelength=0.587, num_rays=5)
    for c in ("x", "y", "z", "L", "M", "N", "opd"):
        assert_allclose(getattr(res, c), g[f"tilted_{c}"], rtol=1e-5, atol=1e-7)


def test_aspheric_gradient_flows():
    import jax

    lens = AsphericSinglet()
    system = lens.system
    Px = jnp.linspace(-1, 1, 16)
    Py = jnp.zeros(16)
    from optiland_tpu.analysis.spot import rms_spot_size

    def merit(c0):
        s = system.replace(
            stack=system.stack.replace(
                coeffs=system.stack.coeffs.at[1, 0].set(c0)
            )
        )
        return rms_spot_size(s, jnp.zeros(16), jnp.zeros(16), Px, Py, 0.587)

    g = jax.grad(merit)(jnp.asarray(-2.248851e-4))
    fd = (merit(jnp.asarray(-2.248851e-4 + 1e-9)) -
          merit(jnp.asarray(-2.248851e-4 - 1e-9))) / 2e-9
    assert np.isfinite(float(g))
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-3)
