"""Paraxial engine parity tests against reference goldens."""

import numpy as np
import pytest

from optiland_tpu.samples import CookeTriplet, DoubleGauss, TripletTelescopeObjective
from tests.conftest import assert_allclose

SYSTEMS = {
    "cooke": CookeTriplet,
    "double_gauss": DoubleGauss,
    "triplet_telescope": TripletTelescopeObjective,
}

SCALARS = [
    "f1", "f2", "F1", "F2", "P1", "P2", "N1", "N2",
    "EPL", "EPD", "XPL", "XPD", "FNO", "magnification", "invariant",
]


@pytest.mark.parametrize("name", list(SYSTEMS))
@pytest.mark.parametrize("quantity", SCALARS)
def test_paraxial_scalar_parity(goldens, name, quantity):
    g = goldens(name)
    lens = SYSTEMS[name]()
    val = float(np.ravel(getattr(lens.paraxial, quantity)())[0])
    assert_allclose(val, float(g[f"px_{quantity}"]), rtol=1e-8, atol=1e-9)


@pytest.mark.parametrize("name", list(SYSTEMS))
def test_marginal_ray_parity(goldens, name):
    g = goldens(name)
    lens = SYSTEMS[name]()
    y, u = lens.paraxial.marginal_ray()
    assert_allclose(np.ravel(y), g["px_marginal_y"], rtol=1e-9, atol=1e-12)
    assert_allclose(np.ravel(u), g["px_marginal_u"], rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("name", list(SYSTEMS))
def test_chief_ray_parity(goldens, name):
    g = goldens(name)
    lens = SYSTEMS[name]()
    y, u = lens.paraxial.chief_ray()
    assert_allclose(np.ravel(y), g["px_chief_y"], rtol=1e-9, atol=1e-12)
    assert_allclose(np.ravel(u), g["px_chief_u"], rtol=1e-9, atol=1e-12)
