"""OPD / OPDFan / ZernikeOPD analysis behavior (previously untested):
consistency with the Wavefront engine, Zernike-fit sanity, view smoke
(reference: optiland/wavefront/opd.py, zernike_opd.py, analysis/ray_fan.py
OPD fan)."""

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from optiland_tpu.analysis import OPD, OPDFan, ZernikeOPD
from optiland_tpu.samples import CookeTriplet
from optiland_tpu.wavefront import Wavefront


@pytest.fixture(scope="module")
def cooke():
    return CookeTriplet()


def test_opd_matches_wavefront_engine(cooke):
    opd = OPD(cooke, (0.0, 1.0), 0.55, num_rings=6)
    d1 = opd.get_data((0.0, 1.0), 0.55)
    wf = Wavefront(cooke, fields=[(0.0, 1.0)], wavelengths=[0.55],
                   num_rays=6, distribution="hexapolar")
    d2 = wf.get_data((0.0, 1.0), 0.55)
    np.testing.assert_allclose(np.asarray(d1.opd), np.asarray(d2.opd),
                               rtol=1e-12)


def test_opd_rms_and_pv_relationship(cooke):
    opd = OPD(cooke, (0.0, 1.0), 0.55, num_rings=6)
    rms = opd.rms()
    pv = opd.peak_to_valley()
    assert 0 < rms < pv  # PV always exceeds RMS for a non-flat map
    assert pv < 50  # waves; sane magnitude for the Cooke at full field


def test_opd_on_axis_smaller_than_full_field(cooke):
    on_axis = OPD(cooke, (0.0, 0.0), 0.55, num_rings=6).rms()
    full = OPD(cooke, (0.0, 1.0), 0.55, num_rings=6).rms()
    assert on_axis < full


def test_opd_view_smoke(cooke):
    fig, ax = OPD(cooke, (0.0, 0.0), 0.55, num_rings=6).view()
    assert ax.images  # drew the map


def test_opdfan_shape_and_center(cooke):
    fan = OPDFan(cooke, fields=[(0.0, 0.0), (0.0, 1.0)],
                 wavelengths=[0.55], num_rays=17)
    assert fan.pupil_coord.shape == (17,)
    fig, axs = fan.view()
    assert fig is not None


def test_zernike_opd_fit_reconstructs(cooke):
    z = ZernikeOPD(cooke, (0.0, 1.0), 0.55, num_rings=8, num_terms=24)
    assert z.coeffs.shape[0] == 24
    # fit residual small: reconstruct the OPD from the fit
    d = z.opd_analysis.get_data((0.0, 1.0), 0.55)
    x = np.asarray(z.opd_analysis.distribution.x)
    y = np.asarray(z.opd_analysis.distribution.y)
    r = np.hypot(x, y)
    phi = np.arctan2(y, x)
    recon = np.asarray(z.fit.zernike.poly(r, phi))
    opd = np.asarray(d.opd)
    rms_resid = float(np.sqrt(np.mean((recon - opd) ** 2)))
    rms_opd = float(np.sqrt(np.mean(opd**2)))
    assert rms_resid < 0.1 * max(rms_opd, 1e-9)


def test_zernike_opd_defocus_dominates_through_focus(cooke):
    """Defocusing the image plane pumps the Zernike defocus term."""
    lens = CookeTriplet()
    z0 = ZernikeOPD(lens, (0.0, 0.0), 0.55, num_rings=8, num_terms=10)
    lens2 = CookeTriplet()
    lens2.surfaces.surfaces[-2].thickness += 0.5
    lens2._invalidate()
    z1 = ZernikeOPD(lens2, (0.0, 0.0), 0.55, num_rings=8, num_terms=10)
    # fringe index 3 (0-based) is defocus Z4
    assert abs(z1.coeffs[3]) > 5 * abs(z0.coeffs[3])
