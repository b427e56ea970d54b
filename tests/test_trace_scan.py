"""Scan-based trace engine parity vs the unrolled path: identical results
with compile time independent of surface count (addresses the unrolled
loop's O(S) compile cost for deep systems)."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optiland_tpu.core import raygen, trace
from optiland_tpu.samples import (
    CookeTriplet,
    DoubleGauss,
    HubbleTelescope,
    TessarLens,
)
from tests.conftest import assert_allclose


def _bundle(system, n=64, hy=0.7, wl=0.55):
    rng = np.random.default_rng(0)
    r = np.sqrt(rng.uniform(size=n)) * 0.9
    th = rng.uniform(0, 2 * np.pi, n)
    Px = jnp.asarray(r * np.cos(th))
    Py = jnp.asarray(r * np.sin(th))
    return raygen.generate_rays(
        system, jnp.zeros(n), jnp.full((n,), hy), Px, Py, wl
    )


@pytest.mark.parametrize("cls", [CookeTriplet, DoubleGauss, TessarLens,
                                 HubbleTelescope],
                         ids=lambda c: c.__name__)
def test_scan_matches_unrolled(cls):
    lens = cls()
    system = lens.system
    assert trace.scan_supported(system.cfg)
    wl = lens.primary_wavelength
    rays = _bundle(system, wl=wl)
    ref, hist_ref = trace.trace(system, rays, record=True)
    out, hist = trace.trace_scan(system, rays, record=True)
    # Newton-from-the-closed-form-root vs pure closed form differ by a few
    # ulps of rounding per surface
    for c in ("x", "y", "z", "L", "M", "N", "opd"):
        assert_allclose(getattr(out, c), getattr(ref, c),
                        rtol=1e-8, atol=1e-10)
    np.testing.assert_array_equal(
        np.asarray(out.i) > 0.5, np.asarray(ref.i) > 0.5
    )
    for c in ("x", "y", "intensity"):
        assert_allclose(hist[c], hist_ref[c], rtol=1e-8, atol=1e-10)


def test_scan_matches_unrolled_tilted():
    lens = CookeTriplet()
    lens.surfaces.surfaces[2].rx = 0.01
    lens.surfaces.surfaces[3].dy = 0.05
    lens._invalidate()
    system = lens.system
    assert trace.scan_supported(system.cfg)
    rays = _bundle(system)
    ref, _ = trace.trace(system, rays, record=False)
    out, _ = trace.trace_scan(system, rays, record=False)
    for c in ("x", "y", "L", "M", "N", "opd"):
        assert_allclose(getattr(out, c), getattr(ref, c),
                        rtol=1e-10, atol=1e-12)


def test_scan_gradients_match_unrolled():
    system = CookeTriplet().system
    rays = _bundle(system, n=32)

    def merit(path):
        def f(stack):
            out, _ = path(system.replace(stack=stack), rays, record=False)
            return jnp.mean(out.x**2 + out.y**2)
        return f

    g_ref = jax.grad(merit(trace.trace))(system.stack)
    g_scan = jax.grad(merit(trace.trace_scan))(system.stack)
    assert_allclose(g_scan.radius, g_ref.radius, rtol=1e-8, atol=1e-12)
    assert_allclose(g_scan.thickness, g_ref.thickness, rtol=1e-8, atol=1e-12)
    assert_allclose(g_scan.conic, g_ref.conic, rtol=1e-8, atol=1e-12)


def test_scan_not_supported_structures():
    from optiland_tpu.physical_apertures import RectangularAperture

    lens = CookeTriplet()
    lens.surfaces.surfaces[1].aperture = RectangularAperture(-4, 4, -3, 3)
    lens._invalidate()
    assert not trace.scan_supported(lens.system.cfg)


def test_scan_compiles_faster_on_deep_system():
    """Compile-time scaling: the scan path compiles a 19-surface system
    much faster than the unrolled path (fresh jaxprs, no persistent-cache
    hits because the merit closure differs per variant)."""
    from optiland_tpu.samples import UVProjectionLens

    lens = UVProjectionLens()
    system = lens.system
    if not trace.scan_supported(system.cfg):
        pytest.skip("UVProjectionLens structure outgrew the scan path")
    rays = _bundle(system, n=16, hy=0.0, wl=lens.primary_wavelength)

    t0 = time.perf_counter()
    out, _ = jax.jit(lambda s, r: trace.trace_scan(s, r, record=False))(
        system, rays
    )
    jax.block_until_ready(out.x)
    t_scan = time.perf_counter() - t0
    # generous sanity bound: the unrolled path costs minutes cold on CPU
    assert t_scan < 60.0
    ref, _ = trace.trace(system, rays, record=False)
    assert_allclose(out.x, ref.x, rtol=1e-9, atol=1e-11)


def _mixed_family_lens():
    """Heterogeneous system: conic + even asphere + zernike sag + biconic
    (each family compiles one scan branch via lax.switch)."""
    from optiland_tpu.optic import Optic

    o = Optic()
    o.surfaces.add(index=0, radius=np.inf, thickness=np.inf)
    o.surfaces.add(index=1, radius=45.0, thickness=5.0, material="N-BK7",
                   is_stop=True, surface_type="even_asphere",
                   coefficients=[1e-5, -2e-8])
    o.surfaces.add(index=2, radius=-60.0, thickness=4.0)
    o.surfaces.add(index=3, radius=80.0, thickness=4.0, material="N-SF11",
                   surface_type="zernike", coefficients=[5e-5, 0.0, 1e-4],
                   norm_radius=12.0)
    o.surfaces.add(index=4, surface_type="biconic", radius_x=-90.0,
                   conic_x=-0.2, radius_y=-70.0, conic_y=0.1, thickness=40.0)
    o.surfaces.add(index=5)
    o.set_aperture("EPD", 10.0)
    o.fields.set_type("angle")
    o.fields.add(y=0)
    o.fields.add(y=2)
    o.wavelengths.add(0.55, is_primary=True)
    return o


def test_scan_matches_unrolled_mixed_families():
    system = _mixed_family_lens().system
    assert trace.scan_supported(system.cfg)
    rays = _bundle(system, n=48, hy=0.4)
    ref, hist_ref = trace.trace(system, rays, record=True)
    out, hist = trace.trace_scan(system, rays, record=True)
    for c in ("x", "y", "z", "L", "M", "N", "opd"):
        assert_allclose(getattr(out, c), getattr(ref, c),
                        rtol=1e-8, atol=1e-10)
    for c in ("x", "y", "intensity"):
        assert_allclose(hist[c], hist_ref[c], rtol=1e-8, atol=1e-10)


def test_scan_gradients_mixed_families():
    system = _mixed_family_lens().system
    rays = _bundle(system, n=24, hy=0.3)

    def merit(path):
        def f(stack):
            out, _ = path(system.replace(stack=stack), rays, record=False)
            return jnp.mean(out.x**2 + out.y**2)
        return f

    g_ref = jax.grad(merit(trace.trace))(system.stack)
    g_scan = jax.grad(merit(trace.trace_scan))(system.stack)
    assert_allclose(g_scan.radius, g_ref.radius, rtol=1e-7, atol=1e-12)
    assert_allclose(g_scan.coeffs, g_ref.coeffs, rtol=1e-7, atol=1e-12)
    assert_allclose(g_scan.geo_p1, g_ref.geo_p1, rtol=1e-7, atol=1e-12)


def test_engine_env_var_validated_and_per_call(monkeypatch):
    """OPTILAND_TPU_TRACE_ENGINE is read per call, accepts only
    auto/unrolled/scan, and 'scan' forces the scan engine (advisor
    finding: the round-2 value was read once at import time and unknown
    values silently meant 'auto')."""
    system = CookeTriplet().system
    rays = _bundle(system, n=8)

    monkeypatch.setenv("OPTILAND_TPU_TRACE_ENGINE", "bogus")
    with pytest.raises(ValueError, match="OPTILAND_TPU_TRACE_ENGINE"):
        trace.trace(system, rays, record=False)

    monkeypatch.setenv("OPTILAND_TPU_TRACE_ENGINE", "scan")
    out_forced, _ = trace.trace(system, rays, record=False)
    out_scan, _ = trace.trace_scan(system, rays, record=False)
    np.testing.assert_array_equal(np.asarray(out_forced.x),
                                  np.asarray(out_scan.x))

    # forcing scan on an unsupported structure is an explicit error
    from optiland_tpu.physical_apertures import RectangularAperture

    lens = CookeTriplet()
    lens.surfaces.surfaces[1].aperture = RectangularAperture(-4, 4, -3, 3)
    lens._invalidate()
    with pytest.raises(ValueError, match="not.*scan-supported"):
        trace.trace(lens.system, _bundle(lens.system, n=8), record=False)
