"""Analysis regression on DoubleGauss and TessarLens — the Cooke battery
pinned to two more designs (goldens from tools/gen_goldens_r4.py running
the reference; reference: optiland/analysis/, psf/, mtf/)."""

from __future__ import annotations

import numpy as np
import pytest

from optiland_tpu.samples import DoubleGauss, TessarLens
from tests.conftest import assert_allclose

SAMPLES = {"dg": DoubleGauss, "tessar": TessarLens}


@pytest.fixture(scope="module")
def reg(goldens):
    return goldens("analysis_multi")


@pytest.fixture(scope="module", params=sorted(SAMPLES), ids=str)
def lens_tag(request):
    return SAMPLES[request.param](), request.param


def test_spot_radii(reg, lens_tag):
    from optiland_tpu.analysis import SpotDiagram

    lens, tag = lens_tag
    spot = SpotDiagram(lens)
    rms = np.asarray([[float(v) for v in row]
                      for row in spot.rms_spot_radius()])
    geo = np.asarray([[float(v) for v in row]
                      for row in spot.geometric_spot_radius()])
    assert_allclose(rms, reg[f"{tag}_spot_rms"], rtol=1e-6, atol=1e-9)
    assert_allclose(geo, reg[f"{tag}_spot_geo"], rtol=1e-6, atol=1e-9)


def test_distortion(reg, lens_tag):
    from optiland_tpu.analysis import Distortion

    lens, tag = lens_tag
    d = Distortion(lens, num_points=24)
    ours = np.stack([np.ravel(np.asarray(v)) for v in d.data])
    assert_allclose(ours, reg[f"{tag}_distortion"], rtol=1e-5, atol=1e-8)


def test_field_curvature(reg, lens_tag):
    from optiland_tpu.analysis import FieldCurvature

    lens, tag = lens_tag
    fc = FieldCurvature(lens, num_points=24)
    ours = np.stack([
        np.stack([np.ravel(np.asarray(t)) for t in pair]) for pair in fc.data
    ])
    assert_allclose(ours, reg[f"{tag}_field_curv"], rtol=1e-5, atol=1e-7)


def test_rms_vs_field(reg, lens_tag):
    from optiland_tpu.analysis import RmsSpotSizeVsField

    lens, tag = lens_tag
    rv = RmsSpotSizeVsField(lens, num_fields=16)
    ours = np.ravel(np.asarray(rv.data["rms"]))
    assert_allclose(ours, np.ravel(reg[f"{tag}_rms_field"]),
                    rtol=1e-5, atol=1e-8)


def test_strehl(reg, lens_tag):
    from optiland_tpu.psf import FFTPSF

    lens, tag = lens_tag
    psf = FFTPSF(lens, field=(0, 0), wavelength=0.55, num_rays=64)
    assert_allclose(float(psf.strehl_ratio()),
                    float(reg[f"{tag}_strehl"]), rtol=1e-4)


def test_fft_mtf(reg, lens_tag):
    from optiland_tpu.mtf import FFTMTF

    lens, tag = lens_tag
    m = FFTMTF(lens, fields=[(0, 0)], wavelength=0.55,
               num_rays=32, grid_size=64)
    assert_allclose(np.asarray(m.mtf[0][0]), reg[f"{tag}_mtf_tan"],
                    rtol=1e-4, atol=1e-6)
    assert_allclose(np.asarray(m.mtf[0][1]), reg[f"{tag}_mtf_sag"],
                    rtol=1e-4, atol=1e-6)


def test_seidels(reg, lens_tag):
    from optiland_tpu.aberrations import Aberrations

    lens, tag = lens_tag
    ours = np.ravel(np.asarray(Aberrations(lens).seidels()))
    assert_allclose(ours, np.ravel(reg[f"{tag}_seidels"]),
                    rtol=1e-5, atol=1e-8)


# -- wavefront strategies on DoubleGauss (incl. best_fit) ----------------------


@pytest.mark.parametrize("strategy", ["chief_ray", "centroid", "best_fit"])
@pytest.mark.parametrize("fk", [0, 1])
def test_wavefront_strategy_parity_dg(goldens, strategy, fk):
    from optiland_tpu.wavefront import Wavefront

    g = goldens("wave_dg")
    lens = DoubleGauss()
    fields = lens.fields.get_field_coords()
    wf = Wavefront(lens, num_rays=6, strategy=strategy)
    d = wf.get_data(fields[fk], 0.5876)
    tag = f"{strategy}_{fk}"
    # best_fit: the reference fits the sphere via unweighted lstsq on a
    # different (equivalent) parameterization; agreement is ~1e-5 waves
    # rather than machine precision.
    rtol, atol = ((1e-3, 2e-5) if strategy == "best_fit"
                  else (1e-6, 1e-9))
    assert_allclose(np.asarray(d.opd), g[f"wf_{tag}_opd"],
                    rtol=rtol, atol=atol)
    assert_allclose(np.asarray(d.pupil_x), g[f"wf_{tag}_px"],
                    rtol=1e-6, atol=1e-9)
    assert_allclose(np.ravel(np.asarray(d.radius)),
                    np.ravel(g[f"wf_{tag}_radius"]),
                    rtol=1e-3 if strategy == "best_fit" else 1e-6)


# -- polarized reflective trace (Hubble) ----------------------------------------


@pytest.mark.parametrize("pol", ["unpolarized", "H", "RCP"])
def test_polarized_mirror_trace_parity(goldens, pol):
    """Reflection p-matrices vs the reference through a two-mirror system
    (reference: rays/polarized_rays.py reflection branch)."""
    from optiland_tpu.polarization import create_polarization
    from optiland_tpu.samples import HubbleTelescope

    g = goldens("pol_mirror")
    lens = HubbleTelescope()
    lens.set_polarization(create_polarization(pol))
    rays = lens.trace(Hx=0, Hy=0.7, wavelength=0.55, num_rays=5)
    assert_allclose(np.asarray(rays.y), g[f"hubble_{pol}_y"],
                    rtol=1e-8, atol=1e-8)
    # The reference's reflection p-matrices drift from orthogonality by up
    # to ~2e-2 on curved mirrors (its local basis uses slightly non-unit
    # k vectors); ours are unitary to 2e-15. Compare loosely — the drift
    # is the reference's numerical artifact, not physics.
    assert_allclose(np.asarray(rays.i), g[f"hubble_{pol}_i"],
                    rtol=2e-3, atol=2e-3)
    assert_allclose(np.asarray(rays.p), g[f"hubble_{pol}_p"],
                    rtol=0.1, atol=3e-2)
    # physical invariant the reference misses: unitarity
    P = np.asarray(rays.p)
    PtP = np.einsum("rij,rik->rjk", P, P)
    np.testing.assert_allclose(PtP, np.broadcast_to(np.eye(3), PtP.shape),
                               atol=1e-12)


def test_grid_distortion_on_axis_point_finite():
    """Odd num_points puts H=(0,0) in the grid; max_distortion must stay
    finite (0/0 guard on the ideal radius)."""
    from optiland_tpu.analysis import GridDistortion
    from optiland_tpu.samples import CookeTriplet

    gd = GridDistortion(CookeTriplet(), num_points=11)
    assert np.isfinite(gd.data["max_distortion"])
