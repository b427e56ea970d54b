"""Material dispersion parity tests against reference-generated goldens."""

import numpy as np
import pytest

from optiland_tpu.materials import (
    AbbeMaterial,
    AbbeMaterialE,
    IdealMaterial,
    Material,
    get_catalog,
)
from tests.conftest import assert_allclose

GLASSES = [
    ("SK16", None),
    ("F2", "schott"),
    ("N-BK7", None),
    ("SF1", "schott"),
    ("N-SSK2", None),
    ("F5", "schott"),
    ("N-SK16", None),
]


@pytest.mark.parametrize("name,ref", GLASSES)
def test_catalog_glass_n_parity(goldens, name, ref):
    g = goldens("materials")
    wls = g["wavelengths"]
    m = Material(name, ref) if ref else Material(name)
    tag = name.replace("-", "_")
    assert_allclose(m.n(wls), g[f"{tag}_n"], rtol=1e-12, atol=1e-14)


@pytest.mark.parametrize("name,ref", GLASSES)
def test_catalog_glass_k_parity(goldens, name, ref):
    g = goldens("materials")
    wls = g["wavelengths"]
    m = Material(name, ref) if ref else Material(name)
    tag = name.replace("-", "_")
    assert_allclose(m.k(wls), g[f"{tag}_k"], rtol=1e-12, atol=1e-16)


def test_abbe_polynomial_parity(goldens):
    g = goldens("materials")
    m = AbbeMaterial(1.6, 60.0, model="polynomial")
    assert_allclose(
        m.n(np.linspace(0.4, 0.74, 18)), g["abbe_poly_n"], rtol=1e-10
    )


def test_abbe_buchdahl_parity(goldens):
    g = goldens("materials")
    m = AbbeMaterial(1.6, 60.0, model="buchdahl")
    assert_allclose(m.n(g["wavelengths"]), g["abbe_buchdahl_n"], rtol=1e-10)


def test_abbe_e_line_reference_value():
    m = AbbeMaterialE(1.61, 58.0)
    # At the e-line the model returns the specified index exactly.
    assert_allclose(m.n(0.546074), 1.61, rtol=1e-12)


def test_ideal_material():
    m = IdealMaterial(1.5, 0.0)
    assert_allclose(m.n(np.array([0.4, 0.9])), [1.5, 1.5], rtol=0)
    assert_allclose(m.k(np.array([0.4, 0.9])), [0.0, 0.0], rtol=0)


def test_catalog_size():
    assert len(get_catalog()) > 3000


def test_material_resolution_targets():
    assert Material("SK16").material_data["filename"] == "glass/hikari/SK16.yml"
    assert (
        Material("F2", "schott").material_data["filename"]
        == "glass/schott/F2.yml"
    )


def test_missing_material_raises():
    with pytest.raises(ValueError):
        Material("definitely-not-a-glass-xyz123")
