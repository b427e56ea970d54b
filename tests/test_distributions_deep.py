"""Pupil-distribution point sets and apodization weights vs reference
goldens (reference: optiland/distribution.py + apodization/; goldens from
tools/gen_goldens_r2.py dist_apod — previously generated but unconsumed)."""

from __future__ import annotations

import numpy as np
import pytest

from optiland_tpu import apodization as apod
from optiland_tpu.core.distributions import create_distribution
from tests.conftest import assert_allclose

DISTS = ["line_x", "line_y", "positive_line_x", "positive_line_y",
         "uniform", "hexapolar", "ring", "cross"]

APODS = {
    "UniformApodization": apod.UniformApodization,
    "GaussianApodization": apod.GaussianApodization,
    "TukeyApodization": apod.TukeyApodization,
    "HannApodization": apod.HannApodization,
    "PolynomialApodization": apod.PolynomialApodization,
    "CosineSquaredApodization": apod.CosineSquaredApodization,
    "SuperGaussianApodization": apod.SuperGaussianApodization,
}


@pytest.mark.parametrize("name", DISTS)
def test_distribution_points(goldens, name):
    g = goldens("dist_apod")
    if f"dist_{name}_x" not in g:
        pytest.skip("missing golden")
    d = create_distribution(name)
    d.generate_points(8)
    assert_allclose(np.asarray(d.x), g[f"dist_{name}_x"],
                    rtol=1e-12, atol=1e-14)
    assert_allclose(np.asarray(d.y), g[f"dist_{name}_y"],
                    rtol=1e-12, atol=1e-14)


@pytest.mark.parametrize("name", list(APODS))
def test_apodization_weights(goldens, name):
    g = goldens("dist_apod")
    key = f"apod_{name}"
    if key not in g:
        pytest.skip("missing golden")
    px = np.linspace(-1, 1, 21)
    py = np.linspace(1, -1, 21)
    try:
        a = APODS[name]()
    except TypeError:
        a = APODS[name](coeff=0.5)
    assert_allclose(np.asarray(a.get_intensity(px, py)), g[key],
                    rtol=1e-9, atol=1e-12)
