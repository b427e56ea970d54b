"""Deep material-catalog and air-model parity vs reference-generated
goldens (reference: optiland/materials/material.py + environment/;
goldens from tools/gen_goldens_r3.py materials/env)."""

from __future__ import annotations

import numpy as np
import pytest

from optiland_tpu.environment import (
    EnvironmentalConditions,
    refractive_index_air,
)
from optiland_tpu.materials import Material
from tests.conftest import assert_allclose

# (name, manufacturer): bare-name ties in the catalog are broken by the
# reference via pandas' unstable sort, so the parity set pins manufacturers.
GLASSES = [
    "N-BK7", "N-SF11", "SK16", "F2", "N-LAK22", "N-SSK2", "LF5",
    "N-BAF10", "SF5", "N-SK2", "N-FK51A", "N-LASF44", "N-SF5", "N-SK4",
    "N-SK16", "SF11", "N-BAK1", "N-BAK4", "N-F2", "LLF1",
]


@pytest.mark.parametrize("glass", GLASSES)
def test_catalog_index_parity(goldens, glass):
    g = goldens("materials_deep")
    if f"{glass}_n" not in g:
        pytest.skip("glass missing from reference goldens")
    wls = np.asarray(g["wls"])
    m = Material(glass, "schott")
    assert_allclose(np.asarray(m.n(wls)), g[f"{glass}_n"],
                    rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("glass", GLASSES)
def test_catalog_extinction_parity(goldens, glass):
    g = goldens("materials_deep")
    if f"{glass}_k" not in g:
        pytest.skip("no reference k data")
    wls = np.asarray(g["wls"])
    m = Material(glass, "schott")
    assert_allclose(np.asarray(m.k(wls)), g[f"{glass}_k"],
                    rtol=1e-6, atol=1e-10)


@pytest.mark.parametrize("glass", GLASSES)
def test_abbe_number_parity(goldens, glass):
    g = goldens("materials_deep")
    if f"{glass}_abbe" not in g:
        pytest.skip("no reference abbe")
    m = Material(glass, "schott")
    assert_allclose(float(np.ravel(np.asarray(m.abbe()))[0]),
                    float(g[f"{glass}_abbe"]), rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("model", ["ciddor", "edlen", "birch_downs",
                                   "kohlrausch"])
@pytest.mark.parametrize("ci", range(5))
def test_air_index_models(goldens, model, ci):
    g = goldens("env_deep")
    key = f"{model}_{ci}"
    if key not in g:
        pytest.skip("model/condition missing from goldens")
    t, p, rh, co2 = (float(v) for v in g[f"cond_{ci}"])
    cond = EnvironmentalConditions(
        temperature=t, pressure=p, relative_humidity=rh, co2_ppm=co2
    )
    wls = np.asarray(g["wls"])
    ours = np.array(
        [float(np.ravel(np.asarray(
            refractive_index_air(w, cond, model=model)))[0]) for w in wls]
    )
    # Air indices are 1 + O(1e-4); compare the refractivity itself.
    np.testing.assert_allclose(ours - 1.0, np.asarray(g[key]) - 1.0,
                               rtol=1e-8, atol=1e-13)
