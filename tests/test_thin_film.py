"""Thin-film TMM tests: analytic values and coating optimization."""

import numpy as np
import pytest

from optiland_tpu.materials import IdealMaterial
from optiland_tpu.thin_film import (
    SpectralAnalyzer,
    ThinFilmMonteCarlo,
    ThinFilmOptimizer,
    ThinFilmSensitivityAnalysis,
    ThinFilmStack,
)
from tests.conftest import assert_allclose


def test_bare_interface_fresnel():
    """No layers: R must equal the Fresnel normal-incidence value."""
    stack = ThinFilmStack(IdealMaterial(1.0), IdealMaterial(1.5))
    R = float(np.ravel(stack.reflectance(0.55, 0.0, "s"))[0])
    assert_allclose(R, ((1.5 - 1.0) / (1.5 + 1.0)) ** 2, rtol=1e-10)


def test_qwot_ar_coating_analytic():
    """Single QWOT layer: R = ((n0 ns - n1^2)/(n0 ns + n1^2))^2 at design wl."""
    n1, ns = 1.38, 1.52
    stack = ThinFilmStack(
        IdealMaterial(1.0), IdealMaterial(ns), reference_wl_um=0.55
    )
    stack.add_layer_qwot(IdealMaterial(n1), 1.0)
    R = float(np.ravel(stack.reflectance(0.55, 0.0, "s"))[0])
    expected = ((1.0 * ns - n1**2) / (1.0 * ns + n1**2)) ** 2
    assert_allclose(R, expected, rtol=1e-8)


def test_s_p_equal_at_normal_incidence():
    stack = ThinFilmStack(IdealMaterial(1.0), IdealMaterial(1.7))
    stack.add_layer(IdealMaterial(2.1), 0.08)
    wl = np.linspace(0.4, 0.7, 7)
    Rs = np.ravel(np.asarray(stack.reflectance(wl, 0.0, "s")))
    Rp = np.ravel(np.asarray(stack.reflectance(wl, 0.0, "p")))
    assert_allclose(Rs, Rp, rtol=1e-8)


def test_brewster_angle_p_reflectance_zero():
    stack = ThinFilmStack(IdealMaterial(1.0), IdealMaterial(1.5))
    theta_b = np.arctan(1.5)
    Rp = float(np.ravel(stack.reflectance(0.55, theta_b, "p"))[0])
    assert Rp < 1e-10


def test_energy_conservation_lossless():
    stack = ThinFilmStack(IdealMaterial(1.0), IdealMaterial(1.52))
    stack.add_layer(IdealMaterial(2.35), 0.05)
    stack.add_layer(IdealMaterial(1.46), 0.09)
    wl = np.linspace(0.4, 0.8, 11)
    R, T, A = (np.ravel(np.asarray(a)) for a in stack.RTA(wl, 0.3, "p"))
    assert_allclose(R + T, np.ones_like(R), rtol=1e-10)
    assert np.all(np.abs(A) < 1e-10)


def test_coating_optimization_reduces_reflectance():
    stack = ThinFilmStack(IdealMaterial(1.0), IdealMaterial(1.52))
    stack.add_layer(IdealMaterial(2.35), 0.02)
    stack.add_layer(IdealMaterial(1.38), 0.08)
    wl = np.linspace(400, 700, 16)
    opt = ThinFilmOptimizer(stack).add_all_thickness_variables(1e-3, 0.5)
    opt.add_operand("R", wl, target=0.0, weight=1.0)
    before = opt.sum_squared()
    opt.optimize(maxiter=100)
    assert opt.sum_squared() < before / 2


def test_sensitivity_and_monte_carlo():
    stack = ThinFilmStack(
        IdealMaterial(1.0), IdealMaterial(1.52), reference_wl_um=0.55
    )
    stack.add_layer_qwot(IdealMaterial(1.38), 1.0)

    def metric(s):
        return float(np.ravel(np.asarray(s.reflectance(0.55, 0.0, "s")))[0])

    sens = ThinFilmSensitivityAnalysis(stack, metric).run()
    assert np.isfinite(sens["sensitivity"]).all()
    mc = ThinFilmMonteCarlo(stack, metric, sigma_relative=0.05, seed=0).run(20)
    assert mc["std"] > 0


def test_spectral_analyzer_runs():
    import matplotlib

    matplotlib.use("Agg")
    stack = ThinFilmStack(IdealMaterial(1.0), IdealMaterial(1.52))
    stack.add_layer(IdealMaterial(1.38), 0.1)
    an = SpectralAnalyzer(stack)
    R, T, A = an.spectrum(np.linspace(400, 700, 16))
    assert R.shape == (16,)
    an.plot_spectrum(np.linspace(400, 700, 16))
