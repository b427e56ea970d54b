"""Deep analysis-class and solve parity on the Cooke triplet vs
reference-generated goldens (reference: optiland/analysis/rms_vs_field.py,
pupil_aberration.py, encircled_energy.py, solves/; goldens from
tools/gen_goldens_r3.py analysis/solves)."""

from __future__ import annotations

import numpy as np
import pytest

from optiland_tpu.samples import CookeTriplet
from tests.conftest import assert_allclose


@pytest.fixture(scope="module")
def cooke():
    return CookeTriplet()


@pytest.mark.parametrize("fi", range(3))
def test_encircled_energy_fractions(goldens, cooke, fi):
    g = goldens("analysis_deep")
    coords = cooke.fields.get_field_coords()
    hx, hy = coords[fi]
    rays = cooke.trace(Hx=hx, Hy=hy, wavelength=0.55, num_rays=8,
                       distribution="hexapolar")
    xx, yy, ii = (np.asarray(a) for a in (rays.x, rays.y, rays.i))
    cx = np.sum(xx * ii) / np.sum(ii)
    cy = np.sum(yy * ii) / np.sum(ii)
    rr = np.hypot(xx - cx, yy - cy)
    radii = np.asarray(g["ee_radii"])
    frac = np.array([np.sum(ii[rr <= r]) / np.sum(ii) for r in radii])
    assert_allclose(frac, g[f"ee_frac_{fi}"], rtol=1e-9, atol=1e-12)


def test_rms_spot_size_vs_field(goldens, cooke):
    from optiland_tpu.analysis import RmsSpotSizeVsField

    g = goldens("analysis_deep")
    rs = RmsSpotSizeVsField(cooke, num_fields=12, num_rings=4)
    assert_allclose(rs.data["Hy"] * cooke.fields.max_field,
                    g["rmsfield_field"] * cooke.fields.max_field,
                    rtol=1e-9, atol=1e-12)
    assert_allclose(np.ravel(rs.data["rms"]),
                    np.ravel(np.asarray(g["rmsfield_rms"])),
                    rtol=1e-6, atol=1e-9)


def test_rms_wavefront_error_vs_field(goldens, cooke):
    from optiland_tpu.analysis import RmsWavefrontErrorVsField

    g = goldens("analysis_deep")
    rw = RmsWavefrontErrorVsField(cooke, num_fields=10, num_rays=24)
    ours = np.ravel(rw.data["rms"])
    ref = np.ravel(np.asarray(g["rmswave_rms"]))
    # The reference averages opd**2 over ALL rays, so entries where some
    # rays vignette carry garbage OPD (tens of waves on a <1-wave system);
    # we mask vignetted rays. Compare where the reference is unvignetted.
    sane = ref < 10.0
    assert sane.sum() >= ref.size // 2
    np.testing.assert_allclose(ours[sane], ref[sane], rtol=1e-5, atol=1e-7)
    assert np.isfinite(ours).all()


@pytest.mark.parametrize("fi", range(3))
@pytest.mark.parametrize("wi", range(3))
def test_pupil_aberration_parity(goldens, cooke, fi, wi):
    from optiland_tpu.analysis import PupilAberration

    g = goldens("analysis_deep")
    key = f"pa_{fi}_{wi}_y"
    if key not in g:
        pytest.skip("missing golden")
    pa = PupilAberration(cooke, num_points=17)
    coords = cooke.fields.get_field_coords()
    fkey = f"{tuple(coords[fi])}"
    wl = cooke.wavelengths.get_wavelengths()[wi]
    d = pa.data[fkey][f"{wl}"]
    for axis in ("x", "y"):
        ref = np.asarray(g[f"pa_{fi}_{wi}_{axis}"])
        ours = np.asarray(d[axis])
        both_nan = np.isnan(ref) & np.isnan(ours)
        np.testing.assert_array_equal(np.isnan(ref), np.isnan(ours))
        ok = ~both_nan
        np.testing.assert_allclose(ours[ok], ref[ok], rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("tag,kind,idx,val", [
    ("mrh0", "marginal_ray_height", 7, 0.0),
    ("mrh05", "marginal_ray_height", 7, 0.5),
    ("crh0", "chief_ray_height", 7, 0.0),
])
def test_height_solves_parity(goldens, tag, kind, idx, val):
    from optiland_tpu.solves import SolveManager

    g = goldens("solves_deep")
    lens = CookeTriplet()
    m = SolveManager(lens)
    m.add(kind, idx, val)
    got = float(lens.surfaces.surfaces[6].thickness)
    assert_allclose(got, float(g[f"{tag}_thickness"]), rtol=1e-8, atol=1e-10)


def test_quick_focus_solve_parity(goldens):
    from optiland_tpu.solves import SolveManager

    g = goldens("solves_deep")
    lens = CookeTriplet()
    m = SolveManager(lens)
    m.add("quick_focus")
    got = float(lens.surfaces.surfaces[6].thickness)
    assert_allclose(got, float(g["qf_thickness"]), rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("fi", range(3))
def test_bestfit_rayfan_parity(goldens, cooke, fi):
    """BestFitRayFan fans match the reference referenced to the best-fit
    sphere center (reference: analysis/ray_fan.py:247-320)."""
    from optiland_tpu.analysis import BestFitRayFan

    g = goldens("bestfit_rayfan")
    fan = BestFitRayFan(cooke, num_points=9, num_rays_for_fit=6)
    assert_allclose(fan.data["Px"], g["Px"], rtol=1e-12, atol=1e-14)
    coord = tuple(float(v) for v in g[f"f{fi}_coord"])
    fkey = f"{coord}"
    for wi in range(int(g["num_wl"])):
        wl = float(g[f"f{fi}_w{wi}_wl"])
        rec = fan.data[fkey][f"{wl}"]
        # atol 5e-7 mm: the algebraic best-fit sphere solve differs from
        # the reference's formulation at the sub-nanometre level.
        assert_allclose(rec["x"], g[f"f{fi}_w{wi}_x"], rtol=1e-6, atol=5e-7)
        assert_allclose(rec["y"], g[f"f{fi}_w{wi}_y"], rtol=1e-6, atol=5e-7)
