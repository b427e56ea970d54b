"""Thin-film stack mechanics, TMM physics, optimizer and tolerancing
behavior beyond the golden-parity suite
(reference: tests/test_thin_film.py, tests/test_thin_film_optimization.py,
tests/test_thin_film_needle.py, tests/test_thin_film_tolerancing.py,
optiland/thin_film/)."""

import numpy as np
import pytest

from optiland_tpu.materials import IdealMaterial
from optiland_tpu.thin_film import (
    Layer,
    SpectralAnalyzer,
    ThinFilmMonteCarlo,
    ThinFilmOptimizer,
    ThinFilmPerturbation,
    ThinFilmSensitivityAnalysis,
    ThinFilmStack,
    needle_synthesis,
)

AIR = IdealMaterial(1.0)
GLASS = IdealMaterial(1.52)
MGF2 = IdealMaterial(1.38)
TIO2 = IdealMaterial(2.35)


def _bare():
    return ThinFilmStack(incident_material=AIR, substrate_material=GLASS)


def _ar_single():
    s = _bare()
    s.add_layer_qwot(MGF2, wavelength_um=0.55)
    return s


# -- stack construction -------------------------------------------------------


def test_add_layer_um_and_nm_agree():
    s1 = _bare()
    s1.add_layer(MGF2, 0.1)
    s2 = _bare()
    s2.add_layer_nm(MGF2, 100.0)
    assert s1.layers[0].thickness_um == pytest.approx(
        s2.layers[0].thickness_um
    )


def test_qwot_thickness():
    s = _ar_single()
    expected = 0.55 / (4.0 * 1.38)
    assert s.layers[0].thickness_um == pytest.approx(expected, rel=1e-12)


def test_insert_and_remove_layer():
    s = _ar_single()
    s.insert_layer(0, TIO2, 0.05)
    assert len(s) == 2
    assert s.layers[0].material is TIO2
    removed = s.remove_layer(0)
    assert removed.material is TIO2
    assert len(s) == 1


def test_split_layer_conserves_thickness():
    s = _ar_single()
    t0 = s.layers[0].thickness_um
    s.split_layer(0, 0.3)
    assert len(s) == 2
    assert s.layers[0].thickness_um + s.layers[1].thickness_um == pytest.approx(t0)
    assert s.layers[0].thickness_um == pytest.approx(0.3 * t0)


def test_copy_is_independent():
    s = _ar_single()
    c = s.copy()
    c.layers[0].thickness_um = 99.0
    assert s.layers[0].thickness_um != 99.0


def test_thicknesses_property():
    s = _bare()
    s.add_layer(MGF2, 0.1)
    s.add_layer(TIO2, 0.2)
    np.testing.assert_allclose(np.asarray(s.thicknesses()), [0.1, 0.2])


def test_layer_repr_contains_thickness():
    assert "0.1" in repr(Layer(MGF2, 0.1))


# -- TMM physics --------------------------------------------------------------


def test_bare_interface_matches_fresnel_normal():
    s = _bare()
    R = _scalar(s.reflectance(0.55))
    r_expected = ((1.0 - 1.52) / (1.0 + 1.52)) ** 2
    assert R == pytest.approx(r_expected, rel=1e-12)


def test_qwot_ar_reflectance_analytic():
    """Single QWOT layer: R = ((n0 ns - n1^2)/(n0 ns + n1^2))^2."""
    s = _ar_single()
    R = _scalar(s.reflectance(0.55))
    n1sq = 1.38**2
    expected = ((1.0 * 1.52 - n1sq) / (1.0 * 1.52 + n1sq)) ** 2
    assert R == pytest.approx(expected, rel=1e-9)


def test_qwot_high_index_enhances_reflection():
    s = _bare()
    s.add_layer_qwot(TIO2, wavelength_um=0.55)
    R_coated = _scalar(s.reflectance(0.55))
    R_bare = _scalar(_bare().reflectance(0.55))
    assert R_coated > R_bare


def test_hl_quarter_stack_mirror():
    """A (HL)^4 H quarter-wave stack is a strong mirror at design lambda."""
    s = _bare()
    for _ in range(4):
        s.add_layer_qwot(TIO2, wavelength_um=0.55)
        s.add_layer_qwot(MGF2, wavelength_um=0.55)
    s.add_layer_qwot(TIO2, wavelength_um=0.55)
    assert _scalar(s.reflectance(0.55)) > 0.95


def test_energy_conservation_at_angles():
    s = _ar_single()
    for aoi_deg in (0.0, 20.0, 45.0, 60.0):
        for pol in ("s", "p"):
            R, T, A = (_scalar(v) for v in s.RTA_nm_deg(550.0, aoi_deg, pol))
            assert R + T + A == pytest.approx(1.0, abs=1e-10)
            assert A == pytest.approx(0.0, abs=1e-10)  # lossless media


def test_s_reflectance_rises_with_angle():
    s = _bare()
    Rs = [_scalar(s.reflectance_nm_deg(550.0, a, "s")) for a in (0, 30, 60, 75)]
    assert all(np.diff(Rs) > 0)


def test_brewster_minimum_for_p():
    s = _bare()
    brewster = np.rad2deg(np.arctan(1.52))
    R_at = _scalar(s.reflectance_nm_deg(550.0, brewster, "p"))
    assert R_at < 1e-8


def test_vector_wavelength_input():
    s = _ar_single()
    wl = np.array([450.0, 550.0, 650.0])
    R = np.asarray(s.reflectance_nm_deg(wl))
    assert R.shape == (3,)
    assert R[1] == np.min(R)  # AR design wavelength is the minimum


# -- optimizer ----------------------------------------------------------------


def test_optimizer_reduces_merit():
    s = _bare()
    s.add_layer(MGF2, 0.05)
    opt = ThinFilmOptimizer(s)
    opt.add_variable(0)
    opt.add_operand("R", wavelength_nm=550.0, target=0.0)
    before = float(opt.sum_squared())
    opt.optimize(maxiter=50)
    after = float(opt.sum_squared())
    assert after <= before


def test_optimizer_reaches_qwot():
    """Optimizing a single MgF2 layer for minimum R should land at QWOT."""
    s = _bare()
    s.add_layer(MGF2, 0.05)
    opt = ThinFilmOptimizer(s)
    opt.add_variable(0)
    opt.add_operand("R", wavelength_nm=550.0, target=0.0)
    opt.optimize(maxiter=100)
    qwot = 0.55 / (4 * 1.38)
    assert s.layers[0].thickness_um == pytest.approx(qwot, rel=0.05)


def test_optimizer_gradient_is_finite():
    s = _ar_single()
    opt = ThinFilmOptimizer(s)
    opt.add_all_thickness_variables()
    opt.add_operand("R", wavelength_nm=[500.0, 550.0, 600.0], target=0.0)
    assert np.isfinite(float(opt.sum_squared()))


def test_needle_synthesis_improves_broadband_ar():
    s = _bare()
    s.add_layer_qwot(MGF2, wavelength_um=0.55)
    opt = ThinFilmOptimizer(s)
    opt.add_all_thickness_variables()
    opt.add_operand("R", wavelength_nm=list(np.linspace(450, 650, 9)),
                    target=0.0)
    before = opt.sum_squared()
    history = needle_synthesis(opt, needle_material=TIO2, max_needles=2,
                               num_positions=8, reoptimize_iters=40)
    assert history[-1] <= before + 1e-12
    assert len(history) >= 1


# -- tolerancing --------------------------------------------------------------


def _scalar(v):
    import numpy as _np
    return float(_np.ravel(_np.asarray(v))[0])


def _metric(stack):
    return _scalar(stack.reflectance_nm_deg(550.0))


def test_perturbation_absolute_and_relative():
    s = _ar_single()
    t0 = s.layers[0].thickness_um
    s2 = s.copy()
    ThinFilmPerturbation(0, delta_um=0.01).apply(s2)
    assert s2.layers[0].thickness_um == pytest.approx(t0 + 0.01)
    s3 = s.copy()
    ThinFilmPerturbation(0, relative=0.1).apply(s3)
    assert s3.layers[0].thickness_um == pytest.approx(t0 * 1.1)


def test_perturbation_requires_exactly_one_mode():
    with pytest.raises(ValueError, match="exactly one"):
        ThinFilmPerturbation(0)
    with pytest.raises(ValueError, match="exactly one"):
        ThinFilmPerturbation(0, delta_um=0.01, relative=0.1)


def test_sensitivity_analysis_output():
    s = _ar_single()
    out = ThinFilmSensitivityAnalysis(s, _metric).run()
    assert out["sensitivity"].shape == (1,)
    assert np.isfinite(out["sensitivity"]).all()
    assert out["base"] == pytest.approx(_metric(s))


def test_monte_carlo_statistics():
    s = _ar_single()
    mc = ThinFilmMonteCarlo(s, _metric, sigma_relative=0.05, seed=0)
    out = mc.run(num_trials=50)
    vals = np.asarray(out["values"] if isinstance(out, dict) else out)
    assert vals.shape[0] == 50
    assert np.isfinite(vals).all()
    nominal = _metric(s)
    assert abs(np.mean(vals) - nominal) < 0.05


# -- spectral analyzer --------------------------------------------------------


def test_spectral_analyzer_spectrum_shape():
    s = _ar_single()
    R, T, A = SpectralAnalyzer(s).spectrum(np.linspace(400, 700, 31))
    assert R.shape == (31,)
    np.testing.assert_allclose(R + T + A, 1.0, atol=1e-10)


def test_spectral_analyzer_angular_shape():
    s = _ar_single()
    R, T, A = SpectralAnalyzer(s).angular(550.0, np.linspace(0, 80, 17))
    assert R.shape == (17,)
    np.testing.assert_allclose(R + T + A, 1.0, atol=1e-10)
