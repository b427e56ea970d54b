"""Tolerancing behavior depth: all sampler types, perturbation round trips,
compensator recovery, Monte-Carlo reproducibility
(reference: tests/test_tolerancing*.py, optiland/tolerancing/)."""

import numpy as np
import pytest

from optiland_tpu.samples import CookeTriplet
from optiland_tpu.tolerancing import (
    DistributionSampler,
    Perturbation,
    RangeSampler,
    ScalarSampler,
    Tolerancing,
)


def test_scalar_sampler_repeats_value():
    s = ScalarSampler(0.25)
    assert s.sample() == 0.25
    assert s.sample() == 0.25


def test_range_sampler_endpoints_and_cycle():
    s = RangeSampler(1.0, 2.0, 3)
    vals = [s.sample() for _ in range(4)]
    np.testing.assert_allclose(vals, [1.0, 1.5, 2.0, 1.0])


def test_distribution_sampler_normal_statistics():
    s = DistributionSampler("normal", seed=0, loc=5.0, scale=0.1)
    vals = np.array([s.sample() for _ in range(2000)])
    assert np.mean(vals) == pytest.approx(5.0, abs=0.02)
    assert np.std(vals) == pytest.approx(0.1, rel=0.1)


def test_distribution_sampler_uniform_bounds():
    s = DistributionSampler("uniform", seed=1, low=2.0, high=3.0)
    vals = np.array([s.sample() for _ in range(500)])
    assert vals.min() >= 2.0 and vals.max() <= 3.0


def test_distribution_sampler_seeded_reproducible():
    a = DistributionSampler("normal", seed=7, loc=0.0, scale=1.0)
    b = DistributionSampler("normal", seed=7, loc=0.0, scale=1.0)
    assert [a.sample() for _ in range(5)] == [b.sample() for _ in range(5)]


def test_perturbation_radius_applies_sampled_value():
    optic = CookeTriplet()
    p = Perturbation(optic, "radius", ScalarSampler(23.5), surface_number=1)
    p.apply()
    assert optic.surfaces.surfaces[1].radius == pytest.approx(23.5)


def test_perturbation_thickness():
    optic = CookeTriplet()
    t0 = optic.surfaces.surfaces[2].thickness
    p = Perturbation(optic, "thickness", ScalarSampler(t0 + 0.1),
                     surface_number=2)
    p.apply()
    assert optic.surfaces.surfaces[2].thickness == pytest.approx(t0 + 0.1)


def test_tolerancing_reset_restores_nominal():
    tol = Tolerancing(CookeTriplet())
    r0 = tol.optic.surfaces.surfaces[1].radius
    tol.add_perturbation("radius", ScalarSampler(30.0), surface_number=1)
    for p in tol.perturbations:
        p.apply()
    assert tol.optic.surfaces.surfaces[1].radius == pytest.approx(30.0)
    tol.reset()
    assert tol.optic.surfaces.surfaces[1].radius == pytest.approx(r0)


def test_compensator_recovers_focus():
    """Perturb a radius, compensate with back focal distance: the spot
    operand recovers most of its nominal value."""
    tol = Tolerancing(CookeTriplet())
    tol.add_operand("rms_spot_size", input_data={
        "Hx": 0.0, "Hy": 0.0, "num_rays": 16,
        "distribution": "hexapolar", "wavelength": 0.55,
    })
    nominal = float(np.ravel(tol.evaluate())[0])
    tol.add_perturbation("radius", ScalarSampler(22.5), surface_number=1)
    tol.add_compensator("thickness", surface_number=6)
    for p in tol.perturbations:
        p.apply()
    perturbed = float(np.ravel(tol.evaluate())[0])
    tol.apply_compensators()
    compensated = float(np.ravel(tol.evaluate())[0])
    assert compensated < perturbed
    assert compensated < 5 * max(nominal, 1e-4)


def test_monte_carlo_seeded_runs_are_reproducible():
    from optiland_tpu.tolerancing import MonteCarlo

    def build():
        tol = Tolerancing(CookeTriplet())
        tol.add_operand("f2", input_data={})
        tol.add_perturbation(
            "radius", DistributionSampler("normal", seed=3, loc=22.01,
                                          scale=0.05),
            surface_number=1,
        )
        return tol

    mc1 = MonteCarlo(build()).run(10)
    mc2 = MonteCarlo(build()).run(10)
    v1 = np.ravel(np.asarray(mc1["operand_values"], float))
    v2 = np.ravel(np.asarray(mc2["operand_values"], float))
    np.testing.assert_allclose(v1, v2)
