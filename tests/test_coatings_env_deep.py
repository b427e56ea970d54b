"""Coating behavior and environmental air-index models
(reference: tests/test_coatings.py, tests/test_environment.py,
optiland/coatings.py, optiland/environment/)."""

import jax.numpy as jnp
import numpy as np
import pytest

from optiland_tpu.coatings import (
    BaseCoating,
    FresnelCoating,
    PolarizerCoating,
    RetarderCoating,
    SimpleCoating,
    ThinFilmCoating,
)
from optiland_tpu.environment import (
    EnvironmentalConditions,
    birch_downs_refractive_index,
    ciddor_refractive_index,
    edlen_refractive_index,
    kohlrausch_refractive_index,
    refractive_index_air,
)


# -- SimpleCoating ------------------------------------------------------------


def test_simple_coating_transmit_reflect_split():
    c = SimpleCoating(transmittance=0.7, reflectance=0.2)
    assert c.intensity_factor(reflect=False) == 0.7
    assert c.intensity_factor(reflect=True) == 0.2
    assert c.absorptance == pytest.approx(0.1)


def test_simple_coating_lossless_default():
    c = SimpleCoating(transmittance=1.0)
    assert c.intensity_factor(reflect=False) == 1.0
    assert c.absorptance == pytest.approx(0.0)


def test_simple_coating_dict_round_trip():
    c = SimpleCoating(transmittance=0.9, reflectance=0.05)
    d = c.to_dict()
    assert d["type"] == "SimpleCoating"
    c2 = BaseCoating._registry[d["type"]](
        transmittance=d["transmittance"], reflectance=d["reflectance"]
    )
    assert c2.intensity_factor(False) == 0.9


def test_compute_aoi_normal_incidence():
    aoi = BaseCoating.compute_aoi(
        jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(1.0),
        jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(-1.0),
    )
    assert float(aoi) == pytest.approx(0.0)


def test_compute_aoi_oblique():
    t = np.deg2rad(30)
    aoi = BaseCoating.compute_aoi(
        jnp.asarray(np.sin(t)), jnp.asarray(0.0), jnp.asarray(np.cos(t)),
        jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(-1.0),
    )
    assert float(aoi) == pytest.approx(t)


def test_polarization_dependent_flags():
    assert not SimpleCoating(1.0).polarization_dependent
    for cls_args in ((PolarizerCoating, ()), (RetarderCoating, (0.5,))):
        cls, args = cls_args
        assert cls(*args).polarization_dependent


def test_coating_registry_contains_all():
    for name in ("SimpleCoating", "FresnelCoating", "PolarizerCoating",
                 "RetarderCoating", "ThinFilmCoating"):
        assert name in BaseCoating._registry


def test_simple_coating_in_trace_scales_intensity():
    from optiland_tpu.samples import CookeTriplet

    optic = CookeTriplet()
    optic.surfaces.surfaces[1].coating = SimpleCoating(transmittance=0.5)
    optic._invalidate()
    res = optic.trace(0.0, 0.0, num_rays=8, wavelength=0.55,
                      distribution="hexapolar")
    inten = np.asarray(res.i)
    # ~0.5 plus the glass's own (tiny) absorption loss
    assert inten.max() == pytest.approx(0.5, rel=1e-2)
    assert inten.max() < 0.5 + 1e-9


def test_fresnel_coating_jones_exists():
    c = FresnelCoating("air", "N-BK7")
    assert c.jones() is not None


# -- air index models ---------------------------------------------------------

STD = EnvironmentalConditions()


def _n(fn, wl=0.55, cond=None):
    return float(fn(wl, cond or STD))


def test_ciddor_standard_conditions_magnitude():
    n = _n(ciddor_refractive_index)
    assert 1.00025 < n < 1.00030


def test_edlen_close_to_ciddor():
    assert abs(_n(edlen_refractive_index) - _n(ciddor_refractive_index)) < 1e-6


def test_birch_downs_close_to_ciddor():
    assert abs(_n(birch_downs_refractive_index)
               - _n(ciddor_refractive_index)) < 1e-6


def test_kohlrausch_reference_value():
    # The Kohlrausch constant set intentionally reproduces the reference's
    # documented value n(0.55um) = 1.00271728 at 15 C / 101325 Pa
    # (reference: environment/models/kohlrausch.py:68-76) — note this model
    # is ~10x ciddor by construction; parity beats physicality here.
    cond = EnvironmentalConditions(temperature=15.0, pressure=101325.0)
    assert _n(kohlrausch_refractive_index, 0.55, cond) == pytest.approx(
        1.00271728, abs=1e-7
    )


def test_air_index_dispersion_monotone():
    """Air index decreases with wavelength across the visible."""
    n_blue = _n(ciddor_refractive_index, 0.45)
    n_red = _n(ciddor_refractive_index, 0.65)
    assert n_blue > n_red


def test_air_index_pressure_scaling():
    low = EnvironmentalConditions(pressure=80000.0)
    n_low = _n(ciddor_refractive_index, 0.55, low)
    n_std = _n(ciddor_refractive_index)
    assert n_low < n_std


def test_air_index_temperature_scaling():
    hot = EnvironmentalConditions(temperature=40.0)
    assert _n(ciddor_refractive_index, 0.55, hot) < _n(
        ciddor_refractive_index
    )


def test_vacuum_pressure_gives_unity():
    vac = EnvironmentalConditions(pressure=0.0)
    for fn in (ciddor_refractive_index, edlen_refractive_index,
               birch_downs_refractive_index, kohlrausch_refractive_index):
        assert _n(fn, 0.55, vac) == pytest.approx(1.0, abs=5e-7)


def test_refractive_index_air_dispatch():
    for model in ("ciddor", "edlen", "birch_downs", "kohlrausch"):
        n = float(refractive_index_air(0.55, STD, model=model))
        assert 1.0001 < n < 1.003


def test_refractive_index_air_rejects_unknown_model():
    with pytest.raises((ValueError, KeyError)):
        refractive_index_air(0.55, STD, model="magic")


def test_environmental_conditions_dict_round_trip():
    c = EnvironmentalConditions(temperature=30.0, pressure=90000.0,
                                relative_humidity=0.7)
    c2 = EnvironmentalConditions.from_dict(c.to_dict())
    assert c2.temperature == 30.0
    assert c2.pressure == 90000.0
    assert c2.relative_humidity == 0.7
