"""User-registered surface families (``register_geometry``).

Capability parity with the reference's custom-surface-type extension path
(reference: docs/examples/Tutorial_10a_Custom_Surface_Types.ipynb;
subclassing optiland/geometries/base.py:15-115). Here one sag function is
enough — normals, intersection, and gradients come from the static
dispatchers in core/geometry.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import optiland_tpu
from optiland_tpu.core import geometry as G
from optiland_tpu.optic import Optic
from tests.conftest import assert_allclose


def _even_asphere_clone(radius, conic, coeffs, p1, p2, x, y, aux=None):
    """Same math as the built-in even asphere, registered as a custom type."""
    r2 = x * x + y * y
    z = G._conic_sag(radius, conic, r2)
    # accumulate sum_i C_i r^(2i+2) without relying on the builtin
    z_add = jnp.zeros_like(r2)
    rp = r2
    for i in range(coeffs.shape[0]):
        z_add = z_add + coeffs[i] * rp
        rp = rp * r2
    return z + z_add


def _bump_sag(radius, conic, coeffs, p1, p2, x, y, aux=None):
    r2 = x * x + y * y
    base = jnp.where(jnp.isinf(radius), jnp.zeros_like(r2),
                     G._conic_sag(radius, conic, r2))
    return base + coeffs[0] * jnp.exp(-r2 / (p1 * p1))


CODE_CLONE = optiland_tpu.register_geometry("ea_clone", _even_asphere_clone)
CODE_BUMP = optiland_tpu.register_geometry("gauss_bump", _bump_sag)


def test_registration_contract():
    # stable code on re-registration; reserved names rejected
    assert optiland_tpu.register_geometry("ea_clone", _even_asphere_clone) == CODE_CLONE
    assert CODE_CLONE >= 100 and CODE_BUMP != CODE_CLONE
    with pytest.raises(ValueError):
        optiland_tpu.register_geometry("standard", _bump_sag)
    with pytest.raises(NotImplementedError):
        o = Optic()
        o.add_surface(index=0, thickness=np.inf)
        o.add_surface(index=1, surface_type="never_registered", thickness=1.0)
        o.add_surface(index=2)
        o.set_aperture(aperture_type="EPD", value=4.0)
        o.set_field_type("angle")
        o.add_field(0.0)
        o.add_wavelength(0.55, is_primary=True)
        o.system  # compile triggers the lookup


def test_sag_normal_distance_match_builtin():
    """A custom clone of the even asphere must agree with the built-in
    family through every derived quantity (sag, AD normal, Newton+IFT
    intersection)."""
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.uniform(-8, 8, 64))
    y = jnp.asarray(rng.uniform(-8, 8, 64))
    radius, conic = jnp.asarray(55.0), jnp.asarray(-0.7)
    coeffs = jnp.asarray([1e-5, -2e-8, 3e-11])
    s_ref = G.sag_static(G.EVEN_ASPHERE, radius, conic, coeffs, x, y)
    s_new = G.sag_static(CODE_CLONE, radius, conic, coeffs, x, y)
    assert_allclose(s_new, s_ref, rtol=1e-12, atol=1e-14)
    n_ref = G.surface_normal_static(G.EVEN_ASPHERE, radius, conic, coeffs, x, y)
    n_new = G.surface_normal_static(CODE_CLONE, radius, conic, coeffs, x, y)
    for a, b in zip(n_new, n_ref):
        assert_allclose(a, b, rtol=1e-10, atol=1e-12)
    z = jnp.full_like(x, -3.0)
    L = jnp.zeros_like(x)
    M = jnp.full_like(x, 0.05)
    N = jnp.sqrt(1 - M * M)
    t_ref = G.distance_static(G.EVEN_ASPHERE, radius, conic, coeffs,
                              x, y, z, L, M, N)
    t_new = G.distance_static(CODE_CLONE, radius, conic, coeffs,
                              x, y, z, L, M, N)
    assert_allclose(t_new, t_ref, rtol=1e-10, atol=1e-12)


def _bump_singlet(amp=0.0015):
    o = Optic()
    o.add_surface(index=0, thickness=np.inf)
    o.add_surface(index=1, surface_type="gauss_bump", radius=60.0,
                  thickness=5.0, material="N-BK7", is_stop=True,
                  coefficients=[amp], p1=4.0)
    o.add_surface(index=2, radius=-60.0, thickness=95.0)
    o.add_surface(index=3)
    o.set_aperture(aperture_type="EPD", value=10.0)
    o.set_field_type("angle")
    o.add_field(0.0)
    o.add_wavelength(0.55, is_primary=True)
    return o


def test_custom_surface_traces_and_perturbs_rays():
    o = _bump_singlet()
    res = o.trace(Hx=0.0, Hy=0.0, num_rays=64, distribution="hexapolar")
    y = np.asarray(res.y)
    assert np.all(np.isfinite(y))
    # the bump must actually change the trace vs a plain singlet
    res0 = _bump_singlet(amp=0.0).trace(Hx=0.0, Hy=0.0, num_rays=64,
                                        distribution="hexapolar")
    assert np.max(np.abs(y - np.asarray(res0.y))) > 1e-5


def test_gradient_through_custom_sag():
    """jax.grad through the registered family's coefficient matches
    central finite differences (the IFT correction carries the adjoint)."""
    from optiland_tpu.analysis.spot import rms_spot_size

    system = _bump_singlet().system
    Px = jnp.linspace(-0.9, 0.9, 16)
    Py = jnp.zeros(16)

    def merit(amp):
        s = system.replace(
            stack=system.stack.replace(
                coeffs=system.stack.coeffs.at[1, 0].set(amp)
            )
        )
        return rms_spot_size(s, jnp.zeros(16), jnp.zeros(16), Px, Py, 0.55)

    a0 = jnp.asarray(0.0015)
    g = jax.grad(merit)(a0)
    fd = (merit(a0 + 1e-7) - merit(a0 - 1e-7)) / 2e-7
    assert np.isfinite(float(g))
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-4)


def test_custom_family_excluded_from_fast_paths():
    """Custom codes fall back to the unrolled XLA engine — never the
    scan/Pallas fast paths (their family sets are static)."""
    from optiland_tpu.core import trace as tr
    from optiland_tpu.ops import pallas_trace

    system = _bump_singlet().system
    assert not tr.scan_supported(system.cfg)
    assert not pallas_trace.pallas_supported(system)
