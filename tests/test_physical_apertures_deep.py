"""Physical aperture behavior: containment, clipping, scaling, booleans,
serialization, and in-trace vignetting
(reference: tests/test_physical_apertures.py,
optiland/physical_apertures/*.py)."""

import numpy as np
import pytest

from optiland_tpu.physical_apertures import (
    BaseAperture,
    DifferenceAperture,
    EllipticalAperture,
    FileAperture,
    IntersectionAperture,
    OffsetRadialAperture,
    PolygonAperture,
    RadialAperture,
    RectangularAperture,
    UnionAperture,
    configure_aperture,
)

X = np.array([0.0, 1.0, 2.0, 3.0, 0.0, -2.5, 0.5, -1.0])
Y = np.array([0.0, 0.0, 0.0, 0.0, 2.5, 0.0, 0.5, -1.0])


def _mask(ap):
    return np.asarray(ap.contains(X, Y))


# -- RadialAperture ----------------------------------------------------------


def test_radial_contains_inside_and_boundary():
    ap = RadialAperture(r_max=2.0)
    np.testing.assert_array_equal(
        _mask(ap), [True, True, True, False, False, False, True, True]
    )


def test_radial_annulus_excludes_center():
    ap = RadialAperture(r_max=2.0, r_min=0.5)
    m = _mask(ap)
    assert not m[0]  # center blocked by r_min
    assert m[1] and m[2]


def test_radial_clip_zeroes_outside():
    ap = RadialAperture(r_max=1.5)
    out = np.asarray(ap.clip(np.ones_like(X), X, Y))
    np.testing.assert_allclose(out, _mask(ap).astype(float))


def test_radial_extent():
    assert RadialAperture(3.0).extent == (-3.0, 3.0, -3.0, 3.0)


def test_radial_scale():
    ap = RadialAperture(r_max=2.0, r_min=1.0)
    ap.scale(2.5)
    assert ap.r_max == 5.0 and ap.r_min == 2.5


def test_radial_dict_round_trip():
    ap = RadialAperture(r_max=2.0, r_min=0.25)
    ap2 = BaseAperture.from_dict(ap.to_dict())
    assert isinstance(ap2, RadialAperture)
    assert ap2.r_max == 2.0 and ap2.r_min == 0.25


# -- OffsetRadialAperture ----------------------------------------------------


def test_offset_radial_shifts_center():
    ap = OffsetRadialAperture(r_max=1.0, offset_x=2.0)
    m = _mask(ap)
    assert m[1] and m[2] and m[3]  # x in [1,3] within r=1 of (2,0)
    assert not m[0]


def test_offset_radial_dict_round_trip():
    ap = OffsetRadialAperture(r_max=1.0, r_min=0.2, offset_x=1.0, offset_y=-2.0)
    ap2 = BaseAperture.from_dict(ap.to_dict())
    assert (ap2.offset_x, ap2.offset_y) == (1.0, -2.0)
    assert ap2.r_min == 0.2


# -- EllipticalAperture ------------------------------------------------------


def test_elliptical_contains():
    ap = EllipticalAperture(a=2.0, b=1.0)
    m = _mask(ap)
    assert m[0] and m[1] and m[2]
    assert not m[4]  # (0, 2.5) outside b=1


def test_elliptical_offset():
    ap = EllipticalAperture(a=1.0, b=1.0, offset_y=2.5)
    assert _mask(ap)[4]
    assert not _mask(ap)[0]


def test_elliptical_extent_includes_offset():
    ap = EllipticalAperture(a=2.0, b=1.0, offset_x=0.5, offset_y=-0.5)
    assert ap.extent == (-1.5, 2.5, -1.5, 0.5)


def test_elliptical_scale():
    ap = EllipticalAperture(a=2.0, b=1.0)
    ap.scale(3.0)
    assert (ap.a, ap.b) == (6.0, 3.0)


def test_elliptical_dict_round_trip():
    ap = EllipticalAperture(a=2.0, b=1.0, offset_x=0.1, offset_y=0.2)
    ap2 = BaseAperture.from_dict(ap.to_dict())
    assert (ap2.a, ap2.b, ap2.offset_x, ap2.offset_y) == (2.0, 1.0, 0.1, 0.2)


# -- RectangularAperture -----------------------------------------------------


def test_rectangular_contains():
    ap = RectangularAperture(-1.0, 1.0, -0.5, 0.5)
    m = _mask(ap)
    assert m[0] and m[1] and m[6]
    assert not m[2] and not m[4] and not m[7]


def test_rectangular_asymmetric_scale():
    ap = RectangularAperture(-1.0, 2.0, -0.5, 0.5)
    ap.scale(2.0)
    assert ap.extent == (-2.0, 4.0, -1.0, 1.0)


def test_rectangular_dict_round_trip():
    ap = RectangularAperture(-1.0, 2.0, -0.5, 0.75)
    ap2 = BaseAperture.from_dict(ap.to_dict())
    assert ap2.extent == (-1.0, 2.0, -0.5, 0.75)


# -- PolygonAperture / FileAperture ------------------------------------------


def _square_poly():
    return PolygonAperture([-1.0, 1.0, 1.0, -1.0], [-1.0, -1.0, 1.0, 1.0])


def test_polygon_square_contains():
    m = _mask(_square_poly())
    assert m[0] and m[6] and m[7]
    assert not m[2] and not m[4]


def test_polygon_concave_l_shape():
    # L-shape: unit square minus its top-right quadrant
    ap = PolygonAperture([0, 2, 2, 1, 1, 0], [0, 0, 1, 1, 2, 2])
    assert np.asarray(ap.contains(np.array([0.5]), np.array([0.5])))[0]
    assert np.asarray(ap.contains(np.array([1.5]), np.array([0.5])))[0]
    assert not np.asarray(ap.contains(np.array([1.5]), np.array([1.5])))[0]


def test_polygon_scale():
    ap = _square_poly()
    ap.scale(2.0)
    assert ap.extent == (-2.0, 2.0, -2.0, 2.0)


def test_polygon_dict_round_trip():
    ap2 = BaseAperture.from_dict(_square_poly().to_dict())
    assert isinstance(ap2, PolygonAperture)
    np.testing.assert_allclose(ap2.vx, [-1, 1, 1, -1])


def test_file_aperture_loads_polygon(tmp_path):
    path = tmp_path / "poly.txt"
    path.write_text("-1 -1\n1 -1\n1 1\n-1 1\n")
    ap = FileAperture(str(path))
    assert np.asarray(ap.contains(np.array([0.0]), np.array([0.0])))[0]
    assert not np.asarray(ap.contains(np.array([3.0]), np.array([0.0])))[0]


def test_file_aperture_dict_round_trip(tmp_path):
    path = tmp_path / "poly.csv"
    path.write_text("-1,-1\n1,-1\n1,1\n-1,1\n")
    ap = FileAperture(str(path), delimiter=",")
    ap2 = BaseAperture.from_dict(ap.to_dict())
    np.testing.assert_allclose(ap2.vx, ap.vx)


# -- Boolean composition -----------------------------------------------------


def test_union_operator():
    ap = RadialAperture(1.0) | OffsetRadialAperture(1.0, offset_x=2.0)
    assert isinstance(ap, UnionAperture)
    m = _mask(ap)
    assert m[0] and m[1] and m[2]
    assert not m[4]


def test_add_is_union():
    ap = RadialAperture(1.0) + OffsetRadialAperture(1.0, offset_x=2.0)
    assert isinstance(ap, UnionAperture)


def test_intersection_operator():
    ap = RadialAperture(2.0) & RectangularAperture(-3, 3, -0.25, 0.25)
    assert isinstance(ap, IntersectionAperture)
    m = _mask(ap)
    assert m[0] and m[1]
    assert not m[4] and not m[3]


def test_difference_operator():
    ap = RadialAperture(3.0) - RadialAperture(1.5)
    assert isinstance(ap, DifferenceAperture)
    m = _mask(ap)
    assert not m[0] and not m[1]
    assert m[2] and m[4]


def test_nested_boolean_scale_propagates():
    inner = RadialAperture(1.0)
    outer = RadialAperture(3.0)
    ap = outer - inner
    ap.scale(2.0)
    assert outer.r_max == 6.0 and inner.r_max == 2.0


def test_union_extent_is_bounding_box():
    ap = RadialAperture(1.0) | OffsetRadialAperture(1.0, offset_x=2.0)
    assert ap.extent == (-1.0, 3.0, -1.0, 1.0)


def test_boolean_dict_round_trip():
    ap = (RadialAperture(3.0) - RadialAperture(1.0)) & RectangularAperture(
        -2, 2, -2, 2
    )
    ap2 = BaseAperture.from_dict(ap.to_dict())
    np.testing.assert_array_equal(_mask(ap2), _mask(ap))


# -- configure_aperture / trace integration ----------------------------------


def test_configure_aperture_scalar_is_diameter():
    ap = configure_aperture(5.0)
    assert isinstance(ap, RadialAperture)
    assert ap.r_max == 2.5


def test_configure_aperture_passthrough_and_none():
    ap = RadialAperture(1.0)
    assert configure_aperture(ap) is ap
    assert configure_aperture(None) is None


def test_configure_aperture_rejects_bad_spec():
    with pytest.raises(ValueError, match="Cannot configure aperture"):
        configure_aperture("big")


def test_trace_vignettes_with_surface_aperture():
    """An annular stop on the Cooke triplet kills the central rays'
    intensity but keeps the batch shape static."""
    import jax.numpy as jnp

    from optiland_tpu.core import raygen, trace
    from optiland_tpu.samples import CookeTriplet

    optic = CookeTriplet()
    optic.surfaces.surfaces[3].aperture = RadialAperture(r_max=9.0, r_min=1.0)
    optic._invalidate()
    system = optic.system
    n = 64
    Px = jnp.linspace(-1, 1, n)
    rays = raygen.generate_rays(
        system, jnp.zeros(n), jnp.zeros(n), Px, jnp.zeros(n), 0.55
    )
    out, _ = trace.trace(system, rays)
    inten = np.asarray(out.i)
    assert inten.shape == (n,)
    center = np.abs(np.asarray(Px)) < 0.05
    assert inten[center].max() == 0.0  # blocked by r_min
    assert inten.sum() > 0  # annulus passes the rest
