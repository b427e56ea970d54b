"""Breadth matrix: physics properties over geometry-family x coating x
multi-wavelength combinations.

One compiled trace per system (module-scoped), many cheap property
assertions per trace — grows risk coverage without growing wall-clock
(the suite is compile-dominated). Properties asserted are implementation
independent: direction-cosine normalization, OPD monotonicity, passive
energy bounds, on-axis symmetry, dispersion activity, and gradient
finiteness (reference behaviors: rays/real_rays.py:154-205,
surfaces/standard_surface.py:232-248).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optiland_tpu.core import raygen, trace as trace_core
from optiland_tpu.optic import Optic

WAVELENGTHS = (0.48, 0.55, 0.65)


def _finish(o, epd=12.0):
    o.surfaces.add(index=len(o.surfaces.surfaces))
    o.set_aperture("EPD", epd)
    o.fields.set_type("angle")
    o.fields.add(y=0)
    for i, wl in enumerate(WAVELENGTHS):
        o.wavelengths.add(wl, is_primary=(i == 1))
    return o


def _base(mat="N-BK7"):
    o = Optic()
    o.surfaces.add(index=0, radius=np.inf, thickness=np.inf)
    o.surfaces.add(index=1, radius=40.0, thickness=5.0, material=mat,
                   is_stop=True)
    return o


def build_family(name):
    """One representative system per geometry family."""
    o = _base()
    if name == "standard":
        o.surfaces.add(index=2, radius=-40.0, thickness=40.0)
    elif name == "even_asphere":
        o.surfaces.add(index=2, surface_type="even_asphere", radius=-40.0,
                       coefficients=[1e-6, -2e-9], thickness=40.0)
    elif name == "odd_asphere":
        o.surfaces.add(index=2, surface_type="odd_asphere", radius=-40.0,
                       coefficients=[1e-6, 1e-8], thickness=40.0)
    elif name == "polynomial":
        o.surfaces.add(index=2, surface_type="polynomial", radius=-40.0,
                       coefficients=[[0, 1e-5], [1e-5, 2e-6]],
                       thickness=40.0)
    elif name == "chebyshev":
        o.surfaces.add(index=2, surface_type="chebyshev", radius=-40.0,
                       coefficients=[[0, 1e-4], [1e-4, 0]],
                       norm_x=12.0, norm_y=12.0, thickness=40.0)
    elif name == "zernike":
        o.surfaces.add(index=2, surface_type="zernike", radius=-40.0,
                       coefficients=[0, 0, 0, 2e-4], norm_radius=12.0,
                       thickness=40.0)
    elif name == "toroidal":
        o.surfaces.add(index=2, surface_type="toroidal", radius=-40.0,
                       radius_y=-55.0, thickness=40.0)
    elif name == "biconic":
        o.surfaces.add(index=2, surface_type="biconic", radius_x=-40.0,
                       radius_y=-60.0, conic_y=-0.3, thickness=40.0)
    elif name == "forbes_qbfs":
        o.surfaces.add(index=2, surface_type="forbes_qbfs", radius=-40.0,
                       coefficients=[1e-5, -1e-6], norm_radius=12.0,
                       thickness=40.0)
    elif name == "tilted":
        o.surfaces.add(index=2, radius=-40.0, thickness=40.0,
                       rx=np.radians(1.5), dy=0.2)
    elif name == "mirror":
        o = Optic()
        o.surfaces.add(index=0, radius=np.inf, thickness=np.inf)
        o.surfaces.add(index=1, radius=-80.0, thickness=-35.0,
                       material="mirror", is_stop=True, conic=-1.0)
        return _finish(o)
    else:
        raise ValueError(name)
    return _finish(o)


FAMILIES = (
    "standard", "even_asphere", "odd_asphere", "polynomial", "chebyshev",
    "zernike", "toroidal", "biconic", "forbes_qbfs", "tilted", "mirror",
)


@pytest.fixture(scope="module")
def traced():
    """{family: (system, launch_rays, final, history)} — one multi-
    wavelength bundle traced per family."""
    out = {}
    rng = np.random.default_rng(7)
    n = 120
    r = np.sqrt(rng.uniform(size=n)) * 0.92
    th = rng.uniform(0, 2 * np.pi, n)
    Px = jnp.asarray(r * np.cos(th))
    Py = jnp.asarray(r * np.sin(th))
    H = jnp.zeros(n)
    for fam in FAMILIES:
        system = build_family(fam).system
        wl = jnp.asarray(np.resize(WAVELENGTHS, n))
        rays = raygen.generate_rays(system, H, H, Px, Py, wl)
        final, hist = trace_core.trace(system, rays, record=True)
        out[fam] = (system, rays, final, hist)
    return out


@pytest.mark.parametrize("fam", FAMILIES)
def test_directions_stay_normalized(traced, fam):
    _, _, _, hist = traced[fam]
    L, M, N = (np.asarray(hist[k]) for k in ("L", "M", "N"))
    i = np.asarray(hist["intensity"])
    norm = L**2 + M**2 + N**2
    ok = np.isfinite(norm) & (i > 0)
    assert ok.any()
    assert np.allclose(norm[ok], 1.0, atol=1e-9)


@pytest.mark.parametrize("fam", FAMILIES)
def test_opd_monotone_nondecreasing(traced, fam):
    _, _, _, hist = traced[fam]
    opd = np.asarray(hist["opd"])
    i = np.asarray(hist["intensity"])
    alive = i[-1] > 0
    d = np.diff(opd[:, alive], axis=0)
    assert np.all(d[np.isfinite(d)] >= -1e-9)


@pytest.mark.parametrize("fam", FAMILIES)
def test_intensity_bounded_and_nonincreasing(traced, fam):
    _, rays, _, hist = traced[fam]
    i = np.asarray(hist["intensity"])
    assert np.all(i >= 0)
    assert np.all(i <= np.asarray(rays.i)[None, :] + 1e-12)
    assert np.all(np.diff(i, axis=0) <= 1e-12)


@pytest.mark.parametrize("fam", FAMILIES)
def test_surviving_rays_land_finite(traced, fam):
    _, _, final, _ = traced[fam]
    alive = np.asarray(final.i) > 0
    assert alive.sum() > 10, "bundle mostly vignetted - bad fixture"
    for arr in (final.x, final.y, final.z):
        assert np.isfinite(np.asarray(arr)[alive]).all()


@pytest.mark.parametrize("fam", FAMILIES)
def test_dispersion_is_active(traced, fam):
    """Different wavelengths must land differently through glass (the
    per-ray wavelength column is honored, reference: materials
    dispersion in trace)."""
    _, rays, final, _ = traced[fam]
    if fam == "mirror":
        pytest.skip("no glass in the mirror system")
    w = np.asarray(rays.w)
    y = np.asarray(final.y)
    alive = np.asarray(final.i) > 0
    y1 = y[alive & (w == WAVELENGTHS[0])]
    y2 = y[alive & (w == WAVELENGTHS[2])]
    assert y1.size and y2.size
    assert abs(np.mean(np.abs(y1)) - np.mean(np.abs(y2))) > 1e-7


@pytest.mark.parametrize("fam", FAMILIES)
def test_on_axis_y_symmetry(traced, fam):
    """On-axis field: reflecting the pupil about y flips y at the image
    (holds for every family here except the intentionally asymmetric
    ones)."""
    if fam in ("tilted", "polynomial", "chebyshev"):
        pytest.skip("intentionally y-asymmetric system")
    system, _, _, _ = traced[fam]
    Py = jnp.asarray([0.5, -0.5])
    Px = jnp.zeros(2)
    H = jnp.zeros(2)
    rays = raygen.generate_rays(system, H, H, Px, Py, 0.55)
    out, _ = trace_core.trace(system, rays, record=False)
    y = np.asarray(out.y)
    assert y[0] == pytest.approx(-y[1], abs=1e-9)


@pytest.mark.parametrize("fam", FAMILIES)
def test_radius_gradient_finite_and_nonzero(traced, fam):
    system, rays, _, _ = traced[fam]

    def f(stack):
        out, _ = trace_core.trace(
            system.replace(stack=stack), rays, record=False
        )
        ok = out.i > 0
        return jnp.sum(jnp.where(ok, out.y**2, 0.0))

    g = jax.grad(f)(system.stack)
    gr = np.asarray(g.radius)[1:-1]
    assert np.isfinite(gr).all()
    assert np.abs(gr).max() > 0


@pytest.mark.parametrize("fam", FAMILIES)
def test_scan_engine_parity(traced, fam, monkeypatch):
    """Unrolled and scan engines agree exactly where scan is supported."""
    system, rays, final, _ = traced[fam]
    if not trace_core.scan_supported(system.cfg):
        pytest.skip("family not scan-supported")
    monkeypatch.setenv("OPTILAND_TPU_TRACE_ENGINE", "scan")
    out_s, _ = trace_core.trace(system, rays, record=False)
    monkeypatch.setenv("OPTILAND_TPU_TRACE_ENGINE", "unrolled")
    out_u, _ = trace_core.trace(system, rays, record=False)
    for name in ("x", "y", "z", "L", "M", "N", "i", "opd"):
        a = np.asarray(getattr(out_s, name))
        b = np.asarray(getattr(out_u, name))
        ok = np.isfinite(a) & np.isfinite(b)
        np.testing.assert_allclose(a[ok], b[ok], rtol=1e-12, atol=1e-12)
