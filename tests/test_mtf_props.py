"""MTF physical properties across all variants: DC normalization,
diffraction-limit envelope, variant cross-consistency
(reference: tests/test_*mtf*.py breadth, optiland/mtf/)."""

import numpy as np
import pytest

from optiland_tpu.mtf import FFTMTF, GeometricMTF, SampledMTF
from optiland_tpu.samples import CookeTriplet, TelescopeDoublet


@pytest.fixture(scope="module")
def cooke():
    return CookeTriplet()


@pytest.fixture(scope="module")
def fft_on_axis(cooke):
    return FFTMTF(cooke, fields=[(0, 0)], wavelength=0.55, num_rays=64)


def test_fft_mtf_dc_is_one(fft_on_axis):
    tan, sag = (np.asarray(a) for a in fft_on_axis.mtf[0])
    assert tan[0] == pytest.approx(1.0, abs=1e-6)
    assert sag[0] == pytest.approx(1.0, abs=1e-6)


def test_fft_mtf_bounded_and_decaying(fft_on_axis):
    tan = np.asarray(fft_on_axis.mtf[0][0])
    assert (tan <= 1.0 + 1e-9).all() and (tan >= -1e-9).all()
    assert tan[-1] < 0.5 * tan[0]


def test_fft_mtf_below_diffraction_limit(cooke, fft_on_axis):
    """A real aberrated lens cannot beat the diffraction-limited MTF."""
    freqs = np.asarray(fft_on_axis.freq_tang[0])
    tan = np.asarray(fft_on_axis.mtf[0][0])
    f_cut = fft_on_axis.max_freq
    nu = np.clip(freqs / f_cut, 0.0, 1.0)
    diff_lim = (2 / np.pi) * (np.arccos(nu) - nu * np.sqrt(1 - nu**2))
    assert (tan <= diff_lim + 0.02).all()


def test_fft_mtf_on_axis_tan_equals_sag(fft_on_axis):
    """On axis, a rotationally symmetric lens has identical tangential and
    sagittal MTF."""
    tan, sag = (np.asarray(a) for a in fft_on_axis.mtf[0])
    np.testing.assert_allclose(tan, sag, atol=5e-3)


def test_fft_mtf_off_axis_tan_differs_from_sag(cooke):
    m = FFTMTF(cooke, fields=[(0, 1.0)], wavelength=0.55, num_rays=64)
    tan, sag = (np.asarray(a) for a in m.mtf[0])
    assert not np.allclose(tan, sag, atol=1e-3)


def test_fft_mtf_view_smoke(fft_on_axis):
    import matplotlib

    matplotlib.use("Agg")
    fig, ax = fft_on_axis.view(add_reference=True)
    assert len(ax.lines) >= 3  # T, S, diffraction limit


def test_geometric_mtf_dc_and_bounds(cooke):
    g = GeometricMTF(cooke, fields=[(0, 0)], wavelength=0.55, num_rays=32)
    tan = np.asarray(g.mtf[0][0])
    assert tan[0] == pytest.approx(1.0, abs=1e-3)
    assert (tan <= 1.0 + 1e-9).all()


def test_geometric_mtf_scaled_by_diffraction_limit(cooke):
    gs = GeometricMTF(cooke, fields=[(0, 0)], wavelength=0.55, num_rays=32,
                      scale=True)
    gu = GeometricMTF(cooke, fields=[(0, 0)], wavelength=0.55, num_rays=32,
                      scale=False)
    ts = np.asarray(gs.mtf[0][0])
    tu = np.asarray(gu.mtf[0][0])
    # scaling multiplies by the diffraction-limited curve (<= 1)
    assert (ts <= tu + 1e-9).all()
    assert ts[len(ts) // 2] < tu[len(tu) // 2]


def test_sampled_mtf_dc_is_one(cooke):
    s = SampledMTF(cooke, field=(0, 0), wavelength=0.55, num_rays=64)
    v = np.ravel(np.asarray(s.calculate_mtf([(0.0, 0.0)])))
    assert v[0] == pytest.approx(1.0, abs=1e-6)


def test_sampled_mtf_matches_fft_at_probe_freqs(cooke, fft_on_axis):
    probe = [10.0, 30.0, 60.0]
    s = SampledMTF(cooke, field=(0, 0), wavelength=0.55, num_rays=64)
    vals = np.ravel(np.asarray(s.calculate_mtf([(0.0, f) for f in probe])))
    freqs = np.asarray(fft_on_axis.freq_tang[0])
    ref = np.interp(probe, freqs, np.asarray(fft_on_axis.mtf[0][0]))
    np.testing.assert_allclose(vals, ref, atol=0.05)


def test_sampled_mtf_monotone_low_freq(cooke):
    s = SampledMTF(cooke, field=(0, 0), wavelength=0.55, num_rays=64)
    v = np.ravel(np.asarray(
        s.calculate_mtf([(0.0, f) for f in (0.0, 5.0, 15.0, 30.0)])
    ))
    assert (np.diff(v) < 1e-6).all()


def test_better_lens_higher_relative_mtf(cooke, fft_on_axis):
    doublet = TelescopeDoublet()  # slow doublet: nearly diffraction-limited
    md = FFTMTF(doublet, fields=[(0, 0)], wavelength=0.55, num_rays=64)

    def rel_val(m):
        freqs = np.asarray(m.freq_tang[0])
        tan = np.asarray(m.mtf[0][0])
        return np.interp(0.3 * m.max_freq, freqs, tan)

    assert rel_val(md) >= rel_val(fft_on_axis) - 0.05
