"""Per-term Zernike value parity for all 36 terms of all 3 conventions
(reference: optiland/zernike/standard.py, fringe.py, noll.py; goldens from
tools/gen_goldens_r3.py zernike)."""

from __future__ import annotations

import numpy as np
import pytest

from optiland_tpu.zernike import ZernikeFringe, ZernikeNoll, ZernikeStandard
from tests.conftest import assert_allclose

CLASSES = {
    "standard": ZernikeStandard,
    "fringe": ZernikeFringe,
    "noll": ZernikeNoll,
}


@pytest.fixture(scope="module")
def term_tables(goldens):
    g = goldens("zernike_deep")
    r = np.asarray(g["r"])
    phi = np.asarray(g["phi"])
    return {
        conv: np.stack(
            [np.asarray(t) for t in cls(coeffs=np.ones(36)).terms(r, phi)]
        )
        for conv, cls in CLASSES.items()
    }


@pytest.mark.parametrize("conv", list(CLASSES))
@pytest.mark.parametrize("j", range(36))
def test_zernike_term_value(goldens, term_tables, conv, j):
    g = goldens("zernike_deep")
    assert_allclose(term_tables[conv][j],
                    np.asarray(g[f"{conv}_terms"])[j],
                    rtol=1e-9, atol=1e-12)
