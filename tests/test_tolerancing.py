"""Tolerancing tests: perturbation, compensation, sensitivity, Monte-Carlo."""

import numpy as np

from optiland_tpu.samples import CookeTriplet
from optiland_tpu.tolerancing import (
    DistributionSampler,
    MonteCarlo,
    RangeSampler,
    ScalarSampler,
    SensitivityAnalysis,
    Tolerancing,
)


def _spot_operand(tol, lens):
    tol.add_operand(
        "rms_spot_size",
        input_data={
            "optic": lens, "Hx": 0, "Hy": 0, "num_rays": 3,
            "wavelength": 0.55, "distribution": "hexapolar",
        },
        target=0.0,
    )


def test_perturbation_apply_and_reset():
    lens = CookeTriplet()
    tol = Tolerancing(lens)
    tol.add_perturbation("radius", ScalarSampler(25.0), surface_number=1)
    tol.perturbations[0].apply()
    assert abs(lens.surfaces.surfaces[1].radius - 25.0) < 1e-12
    tol.reset()
    assert abs(lens.surfaces.surfaces[1].radius - 22.01359) < 1e-12


def test_range_sampler_sweeps():
    s = RangeSampler(1.0, 3.0, 3)
    assert [s.sample() for _ in range(3)] == [1.0, 2.0, 3.0]


def test_sensitivity_analysis_with_compensator():
    lens = CookeTriplet()
    tol = Tolerancing(lens)
    _spot_operand(tol, lens)
    tol.add_perturbation("radius", ScalarSampler(22.5), surface_number=1)
    tol.add_compensator("thickness", surface_number=6)
    rows = SensitivityAnalysis(tol).run()
    assert len(rows) == 1
    assert np.isfinite(rows[0]["operands"]).all()
    # reset restored nominal
    assert abs(lens.surfaces.surfaces[1].radius - 22.01359) < 1e-9


def test_monte_carlo_statistics():
    lens = CookeTriplet()
    tol = Tolerancing(lens)
    tol.add_operand("f2", input_data={"optic": lens})
    tol.add_perturbation(
        "radius",
        DistributionSampler("normal", seed=1, loc=22.01359, scale=0.05),
        surface_number=1,
    )
    res = MonteCarlo(tol).run(15)
    assert res["operand_values"].shape == (15, 1)
    assert res["std"][0] > 0
    # nominal f2 restored
    f2 = float(np.ravel(lens.paraxial.f2())[0])
    np.testing.assert_allclose(f2, 49.99978, rtol=1e-5)
