"""Ray aiming parity tests (iterative / robust / cached)
(reference: optiland/rays/ray_aiming/)."""

from __future__ import annotations

import numpy as np
import pytest

from optiland_tpu.optic import Optic
from tests.conftest import assert_allclose

PX = np.array([0.0, 0.5, 1.0, -0.8])
PY = np.array([0.0, 0.0, 0.5, -0.3])


@pytest.fixture
def cooke():
    from optiland_tpu.samples import CookeTriplet

    return CookeTriplet()


def finite_singlet():
    o = Optic()
    o.surfaces.add(index=0, thickness=60.0)
    o.surfaces.add(index=1, radius=30.0, thickness=6.0, material="N-BK7")
    o.surfaces.add(index=2, radius=-30.0, thickness=40.0, is_stop=True)
    o.surfaces.add(index=3)
    o.set_aperture("EPD", 12.0)
    o.fields.set_type("angle")
    o.fields.add(y=0)
    o.fields.add(y=3)
    o.wavelengths.add(0.55, is_primary=True)
    return o


@pytest.mark.parametrize("mode", ["iterative", "robust"])
def test_aimed_trace_parity_infinite(goldens, cooke, mode):
    g = goldens("aiming")
    cooke.set_ray_aiming(mode)
    r = cooke.trace_generic(Hx=0.0, Hy=0.7, Px=PX, Py=PY, wavelength=0.55)
    # both implementations converge to tol=1e-8 on the stop, so final image
    # coordinates agree to ~tol
    assert_allclose(r.x, g[f"{mode}_x"], rtol=0, atol=2e-7)
    assert_allclose(r.y, g[f"{mode}_y"], rtol=0, atol=2e-7)


@pytest.mark.parametrize("mode", ["iterative", "robust"])
def test_aimed_trace_parity_finite(goldens, mode):
    g = goldens("aiming")
    o = finite_singlet()
    o.set_ray_aiming(mode)
    r = o.trace_generic(Hx=0.0, Hy=1.0, Px=PX, Py=PY, wavelength=0.55)
    assert_allclose(r.y, g[f"finite_{mode}_y"], rtol=0, atol=2e-7)


def test_aimed_rays_hit_stop(cooke):
    """The aimed rays land exactly on Px*r_stop in the stop's local frame."""
    from optiland_tpu.core.aiming import stop_radius, trace_to_stop_local

    cooke.set_ray_aiming("iterative")
    r_stop = stop_radius(cooke.system, "iterative")
    aimer = cooke._aimer
    x, y, z, L, M, N = aimer.aim_rays(
        (np.full(4, 0.0), np.full(4, 0.7)), 0.55, (PX, PY)
    )
    lx, ly = trace_to_stop_local(cooke.system, x, y, z, L, M, N, 0.55)
    assert np.abs(np.asarray(lx) - PX * r_stop).max() < 1e-7
    assert np.abs(np.asarray(ly) - PY * r_stop).max() < 1e-7


def test_cached_aimer_reuses_and_invalidates(cooke):
    cooke.set_ray_aiming("iterative", cache=True)
    r1 = cooke.trace_generic(Hx=0.0, Hy=0.7, Px=PX, Py=PY, wavelength=0.55)
    aimer = cooke._aimer
    assert len(aimer._cache) == 1
    r2 = cooke.trace_generic(Hx=0.0, Hy=0.7, Px=PX, Py=PY, wavelength=0.55)
    assert_allclose(r2.y, r1.y, rtol=0, atol=0)
    assert len(aimer._cache) == 1
    # perturb the system: cache entry becomes a warm-start, result changes
    cooke.set_radius(22.5, 1)
    r3 = cooke.trace_generic(Hx=0.0, Hy=0.7, Px=PX, Py=PY, wavelength=0.55)
    assert not np.allclose(np.asarray(r3.y), np.asarray(r1.y))


def test_unknown_aiming_mode_raises(cooke):
    with pytest.raises(ValueError):
        cooke.set_ray_aiming("bogus")


def test_paraxial_mode_keeps_jit_path(cooke):
    cooke.set_ray_aiming("paraxial")
    r = cooke.trace(Hy=1.0, wavelength=0.55, num_rays=6)
    assert np.isfinite(np.asarray(r.y)).all()
