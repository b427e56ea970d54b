"""Material model behaviors: dispersion sanity, Abbe self-consistency,
resolution paths, serialization (reference: tests/test_materials.py breadth,
optiland/materials/)."""

import numpy as np
import pytest

from optiland_tpu.materials import (
    AbbeMaterial,
    BaseMaterial,
    IdealMaterial,
    Material,
    resolve_material,
)


def test_ideal_material_constant_index():
    m = IdealMaterial(1.75)
    wl = np.array([0.4, 0.55, 0.7])
    np.testing.assert_allclose(np.asarray(m.n(wl)), 1.75)
    np.testing.assert_allclose(np.asarray(m.k(wl)), 0.0)
    assert not m.has_absorption


def test_ideal_material_with_absorption():
    m = IdealMaterial(1.5, k=1e-6)
    assert m.has_absorption
    np.testing.assert_allclose(np.asarray(m.k(0.55)), 1e-6, rtol=1e-12)


def test_catalog_glass_normal_dispersion():
    """n decreases with wavelength through the visible for crown glass."""
    m = resolve_material("N-BK7")
    wl = np.array([0.45, 0.55, 0.65])
    n = np.ravel(np.asarray(m.n(wl)))
    assert n[0] > n[1] > n[2]
    assert 1.51 < n[1] < 1.53


def test_catalog_glass_abbe_number():
    m = resolve_material("N-BK7")
    v = float(np.asarray(m.abbe()))
    assert v == pytest.approx(64.17, abs=0.3)


def test_flint_has_lower_abbe_than_crown():
    crown = resolve_material("N-BK7")
    flint = resolve_material("N-SF11")
    assert float(np.asarray(flint.abbe())) < float(np.asarray(crown.abbe()))


def test_abbe_material_reproduces_inputs_polynomial():
    m = AbbeMaterial(1.6, 45.0, model="polynomial")
    nd = float(np.ravel(np.asarray(m.n(0.5875618)))[0])
    assert nd == pytest.approx(1.6, abs=2e-3)


def test_abbe_material_buchdahl_self_consistent():
    m = AbbeMaterial(1.55, 50.0, model="buchdahl")
    nd = float(np.ravel(np.asarray(m.n(0.5875618)))[0])
    assert nd == pytest.approx(1.55, abs=1e-6)
    nF = float(np.ravel(np.asarray(m.n(0.4861327)))[0])
    nC = float(np.ravel(np.asarray(m.n(0.6562725)))[0])
    v = (nd - 1) / (nF - nC)
    assert v == pytest.approx(50.0, rel=0.02)


def test_abbe_material_rejects_unknown_model():
    with pytest.raises(ValueError, match="Unknown model"):
        AbbeMaterial(1.5, 60.0, model="cauchy")


def test_resolve_material_passthrough():
    m = IdealMaterial(1.4)
    assert resolve_material(m) is m


def test_resolve_material_air_strings():
    for spec in ("air", "Air", "AIR"):
        m = resolve_material(spec)
        assert float(np.ravel(np.asarray(m.n(0.55)))[0]) == pytest.approx(
            1.0
        )


def test_resolve_material_tuple_with_catalog():
    m = resolve_material(("SF5", "schott"))
    n = float(np.ravel(np.asarray(m.n(0.5875618)))[0])
    assert 1.66 < n < 1.69


def test_resolve_material_numeric_is_constant_index():
    m = resolve_material(1.444)
    assert float(np.ravel(np.asarray(m.n(0.7)))[0]) == pytest.approx(1.444)


def test_unknown_glass_raises():
    with pytest.raises((KeyError, ValueError)):
        resolve_material("UNOBTAINIUM-9000")


def test_material_registry_has_all_types():
    for name in ("IdealMaterial", "Material", "AbbeMaterial",
                 "MaterialFile"):
        assert name in BaseMaterial._registry


def test_catalog_material_has_tables_or_formula():
    m = Material("N-BK7")
    assert m.formula_code >= 0
    assert np.asarray(m.padded_coefficients).ndim == 1


def test_padded_coefficients_shape_consistent():
    a = IdealMaterial(1.5).padded_coefficients
    b = Material("N-BK7").padded_coefficients
    assert a.shape == b.shape  # all materials pad to a common width


@pytest.mark.parametrize("code", list(range(10)) + [11])
def test_scalar_term_dispersion_matches_vectorized(code):
    """n_formula_scalar_terms (the Pallas-kernel form: Python term loops,
    rank-preserving ops) equals the vectorized n_formula_static for every
    closed-form formula code."""
    import jax.numpy as jnp

    from optiland_tpu.materials import dispersion

    if code == dispersion.TABULATED_N:
        pytest.skip("tabulated data has no closed form")
    rng = np.random.default_rng(code)
    # benign, formula-shaped coefficients
    base = {
        0: [1.5],
        1: [0.0, 1.04, 0.006, 0.23, 0.02, 1.01, 103.56],
        2: [0.0, 1.04, 0.006, 0.23, 0.02],
        3: [2.3, 0.01, 2.0, -0.001, -2.0],
        4: [2.3, 0.05, 1.0, 0.1, 2.0, 0.02, 1.0, 0.15, 2.0, 0.01, 2.0],
        5: [1.45, 0.004, -2.0, 0.0001, -4.0],
        6: [0.0, 0.0002, 57.4, 0.00001, 30.0],
        7: [1.6, 0.02, 0.001, 0.005, -0.0001],
        8: [0.4, 0.2, 0.03, -0.004],
        9: [2.0, 0.3, 0.05, 0.1, 0.2, 0.4],
        11: [1.52, -0.01, 0.002, -0.0005, 0.5876, 2.5],
    }[code]
    w = jnp.asarray(np.linspace(0.4, 0.8, 7))
    coeffs = dispersion.pad_coeffs(np.asarray(base, float)) if hasattr(
        dispersion, "pad_coeffs"
    ) else jnp.zeros(dispersion.MAX_COEFFS).at[: len(base)].set(
        jnp.asarray(base)
    )
    ref = np.asarray(dispersion.n_formula_static(code, coeffs, w))
    got = np.asarray(dispersion.n_formula_scalar_terms(
        code, [coeffs[i] for i in range(coeffs.shape[0])], w
    ))
    np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-12)
