"""Pupil distributions (every registered type) and the paraxial->thick lens
converter (reference: tests/test_distribution.py,
tests/test_paraxial_to_thick.py, optiland/distribution.py,
optiland/surfaces/converters.py)."""

import numpy as np
import pytest

from optiland_tpu.converters import ParaxialToThickLensConverter
from optiland_tpu.core.distributions import (
    GaussianQuadrature,
    create_distribution,
)
from optiland_tpu.optic import Optic


ALL_TYPES = ["line_x", "line_y", "random", "uniform", "hexapolar", "cross",
             "ring"]


@pytest.mark.parametrize("name", ALL_TYPES)
def test_distribution_points_inside_unit_disk(name):
    d = create_distribution(name)
    d.generate_points(60)
    x, y = np.asarray(d.x), np.asarray(d.y)
    assert x.shape == y.shape
    assert (x**2 + y**2 <= 1.0 + 1e-9).all()


def test_line_x_is_on_axis():
    d = create_distribution("line_x")
    d.generate_points(11)
    np.testing.assert_allclose(np.asarray(d.y), 0.0)
    assert np.min(np.asarray(d.x)) < -0.9 and np.max(np.asarray(d.x)) > 0.9


def test_line_y_is_on_axis():
    d = create_distribution("line_y")
    d.generate_points(11)
    np.testing.assert_allclose(np.asarray(d.x), 0.0)


def test_cross_points_on_axes():
    d = create_distribution("cross")
    d.generate_points(40)
    x, y = np.asarray(d.x), np.asarray(d.y)
    assert ((np.abs(x) < 1e-12) | (np.abs(y) < 1e-12)).all()


def test_ring_points_on_rim():
    d = create_distribution("ring")
    d.generate_points(24)
    r = np.hypot(np.asarray(d.x), np.asarray(d.y))
    np.testing.assert_allclose(r, 1.0, atol=1e-12)


def test_hexapolar_center_ray():
    d = create_distribution("hexapolar")
    d.generate_points(37)
    x, y = np.asarray(d.x), np.asarray(d.y)
    assert np.hypot(x, y).min() < 1e-12  # has the chief ray sample


def test_random_seeded_deterministic():
    from optiland_tpu.core.distributions import RandomDistribution

    d1 = RandomDistribution(seed=42).generate_points(50)
    d2 = RandomDistribution(seed=42).generate_points(50)
    np.testing.assert_allclose(np.asarray(d1.x), np.asarray(d2.x))


def test_uniform_grid_masked_to_disk():
    d = create_distribution("uniform")
    d.generate_points(100)
    r = np.hypot(np.asarray(d.x), np.asarray(d.y))
    assert (r <= 1.0 + 1e-12).all()


def test_gaussian_quadrature_weights_positive():
    d = GaussianQuadrature()
    d.generate_points(18)
    assert hasattr(d, "weights")
    w = np.asarray(d.weights)
    assert (w > 0).all()


def test_create_distribution_unknown_raises():
    with pytest.raises((ValueError, KeyError)):
        create_distribution("spiral_galaxy")


# -- paraxial -> thick lens converter ------------------------------------------


def _thin_lens_system(f=50.0):
    optic = Optic()
    optic.add_surface(index=0, thickness=np.inf)
    optic.add_surface(index=1, surface_type="paraxial", focal_length=f,
                      thickness=f, is_stop=True)
    optic.add_surface(index=2)
    optic.set_aperture("EPD", 10.0)
    optic.set_field_type("angle")
    optic.fields.add(0.0, 0.0)
    optic.wavelengths.add(0.55, is_primary=True)
    return optic


def test_converter_requires_paraxial_surface():
    optic = _thin_lens_system()
    with pytest.raises(TypeError, match="not a paraxial"):
        ParaxialToThickLensConverter(2, optic)


def test_converter_preserves_focal_length():
    optic = _thin_lens_system(f=50.0)
    f_before = float(optic.paraxial.f2())
    ParaxialToThickLensConverter(1, optic).convert()
    f_after = float(optic.paraxial.f2())
    assert f_after == pytest.approx(f_before, rel=5e-3)
    # the thin lens became a real glass element
    types = [s.surface_type for s in optic.surfaces.surfaces]
    assert "paraxial" not in types


def test_converter_negative_lens():
    optic = _thin_lens_system(f=-80.0)
    f_before = float(optic.paraxial.f2())
    ParaxialToThickLensConverter(1, optic, center_thickness=2.0).convert()
    assert float(optic.paraxial.f2()) == pytest.approx(f_before, rel=5e-3)


def test_converter_custom_material():
    optic = _thin_lens_system(f=60.0)
    ParaxialToThickLensConverter(1, optic, material="N-SF11").convert()
    names = [
        getattr(s.material, "name", s.material)
        for s in optic.surfaces.surfaces
    ]
    assert any("N-SF11" in str(n) for n in names)


def test_converted_lens_traces():
    optic = _thin_lens_system(f=50.0)
    ParaxialToThickLensConverter(1, optic).convert()
    res = optic.trace(0.0, 0.0, num_rays=16, wavelength=0.55,
                      distribution="hexapolar")
    assert np.isfinite(np.asarray(res.x)).all()
