"""Tests for apodization, physical apertures, pickups/solves, environment."""

import numpy as np
import pytest

from optiland_tpu.apodization import (
    CosineSquaredApodization,
    GaussianApodization,
    HannApodization,
    PolynomialApodization,
    SuperGaussianApodization,
    TukeyApodization,
    UniformApodization,
)
from optiland_tpu.environment import EnvironmentalConditions, refractive_index_air
from optiland_tpu.physical_apertures import (
    EllipticalAperture,
    PolygonAperture,
    RadialAperture,
    RectangularAperture,
)
from optiland_tpu.samples import CookeTriplet
from tests.conftest import assert_allclose


def test_apodization_profiles():
    Px = np.array([0.0, 0.5, 0.99])
    Py = np.zeros(3)
    u = UniformApodization().get_intensity(Px, Py)
    assert_allclose(u, np.ones(3), rtol=0)
    g = np.asarray(GaussianApodization(0.5).get_intensity(Px, Py))
    assert_allclose(g, np.exp(-Px**2 / 0.5), rtol=1e-12)
    assert np.asarray(CosineSquaredApodization().get_intensity(Px, Py))[0] == 1.0
    h = np.asarray(HannApodization().get_intensity(Px, Py))
    assert h[0] == 0.0  # Hann is zero at center (r=0)
    p = np.asarray(PolynomialApodization(p=2.0).get_intensity(Px, Py))
    assert_allclose(p, (1 - Px**2) ** 2, rtol=1e-12)
    sg = np.asarray(SuperGaussianApodization(w=0.8, n=4).get_intensity(Px, Py))
    assert_allclose(sg, np.exp(-((Px / 0.8) ** 4)), rtol=1e-12)
    t = np.asarray(TukeyApodization(alpha=0.5).get_intensity(Px, Py))
    assert t[0] == 1.0 and 0 < t[2] < 1


def test_apodization_in_trace():
    lens = CookeTriplet()
    lens.set_apodization(GaussianApodization(sigma=0.6))
    r = lens.trace(Hy=0.0, num_rays=4)
    i = np.asarray(r.i)
    assert i[0] > i[-1] > 0


def test_aperture_shapes():
    x = np.array([0.0, 1.5, 0.0, 3.0])
    y = np.array([0.0, 0.0, 2.5, 3.0])
    assert list(np.asarray(RadialAperture(2.0).contains(x, y))) == [
        True, True, False, False,
    ]
    assert list(np.asarray(RadialAperture(2.0, r_min=1.0).contains(x, y))) == [
        False, True, False, False,
    ]
    assert list(np.asarray(RectangularAperture(-2, 2, -1, 1).contains(x, y))) == [
        True, True, False, False,
    ]
    assert list(np.asarray(EllipticalAperture(2, 3).contains(x, y))) == [
        True, True, True, False,
    ]
    square = PolygonAperture([-2, 2, 2, -2], [-2, -2, 2, 2])
    assert list(np.asarray(square.contains(x, y))) == [True, True, False, False]


def test_boolean_apertures():
    x = np.array([0.0, 1.5])
    y = np.zeros(2)
    ring = RadialAperture(2.0) - RadialAperture(1.0)
    assert list(np.asarray(ring.contains(x, y))) == [False, True]
    both = RadialAperture(2.0) & RectangularAperture(-1, 1, -1, 1)
    assert list(np.asarray(both.contains(x, y))) == [True, False]


def test_aperture_object_in_trace():
    lens = CookeTriplet()
    lens.surfaces.surfaces[4].aperture = RectangularAperture(-2, 2, -1, 1)
    lens._invalidate()
    r = lens.trace(Hy=0.0, num_rays=8)
    i = np.asarray(r.i)
    assert (i == 0).any() and (i > 0).any()


def test_pickup_links_radius():
    lens = CookeTriplet()
    lens.pickups.add(1, "radius", 5, scale=-1.0, offset=1.0)
    assert abs(lens.surfaces.surfaces[5].radius - (-22.01359 + 1.0)) < 1e-9
    lens.set_radius(30.0, 1)
    lens.pickups.apply()
    assert abs(lens.surfaces.surfaces[5].radius - (-29.0)) < 1e-9


def test_quick_focus_solve_improves_spot():
    from optiland_tpu.analysis import SpotDiagram

    lens = CookeTriplet()
    lens.set_thickness(40.0, 6)  # defocus
    rms_before = SpotDiagram(lens, fields=[(0, 0)], wavelengths=[0.55],
                             num_rings=4).rms_spot_radius()[0][0]
    lens.solves.add("quick_focus")
    rms_after = SpotDiagram(lens, fields=[(0, 0)], wavelengths=[0.55],
                            num_rings=4).rms_spot_radius()[0][0]
    assert rms_after < rms_before / 2


def test_marginal_ray_height_solve():
    lens = CookeTriplet()
    lens.solves.add("marginal_ray_height", 7, 0.0)
    y, _ = lens.paraxial.marginal_ray()
    assert abs(float(np.ravel(np.asarray(y))[-1])) < 1e-8


@pytest.mark.parametrize(
    "model,wl,cond,expected",
    [
        # NIST-validated values (emtoolbox.nist.gov)
        ("ciddor", 0.6328, (15.0, 101325.0, 0.0, 450.0), 1.00027653),
        ("edlen", 0.633, (20.0, 101325.0, 0.0, 450.0), 1.00027176),
        ("ciddor", 0.55, (15.0, 101325.0, 0.0, 450.0), 1.00027783),
    ],
)
def test_air_index_models(model, wl, cond, expected):
    c = EnvironmentalConditions(*cond)
    assert_allclose(float(refractive_index_air(wl, c, model)), expected,
                    rtol=0, atol=2e-8)


def test_air_index_models_run_and_are_close():
    c = EnvironmentalConditions(22.0, 99000.0, 0.4, 420.0)
    vals = [
        float(refractive_index_air(0.55, c, m))
        for m in ("ciddor", "edlen", "birch_downs")
    ]
    assert all(1.00020 < v < 1.00035 for v in vals)
    # models agree to ~1e-6
    assert max(vals) - min(vals) < 3e-6
    # Kohlrausch replicates the reference's (OpticStudio-attributed) scaling,
    # which reports (n-1) an order of magnitude larger — reference
    # environment/models/kohlrausch.py docstring value 1.00271728.
    k = float(refractive_index_air(0.55, c, "kohlrausch"))
    assert 1.002 < k < 1.003


def test_scale_system():
    lens = CookeTriplet()
    f2_before = float(np.ravel(lens.paraxial.f2())[0])
    lens.scale_system(2.0)
    f2_after = float(np.ravel(lens.paraxial.f2())[0])
    assert_allclose(f2_after, 2 * f2_before, rtol=1e-9)


def test_propagation_models():
    """Propagation model shims (reference: optiland/propagation/)."""
    import jax.numpy as jnp
    import pytest

    from optiland_tpu.core.rays import RealRays
    from optiland_tpu.materials import IdealMaterial
    from optiland_tpu.propagation import (
        BasePropagationModel,
        GRINPropagation,
        HomogeneousPropagation,
    )

    rays = RealRays.create(
        jnp.zeros(3), jnp.zeros(3), jnp.zeros(3),
        jnp.zeros(3), jnp.zeros(3), jnp.ones(3),
        jnp.ones(3), jnp.full((3,), 0.55),
    )
    model = HomogeneousPropagation(IdealMaterial(1.5))
    out = model.propagate(rays, 10.0)
    assert_allclose(out.z, jnp.full((3,), 10.0))
    assert_allclose(out.opd, jnp.full((3,), 15.0))
    # GRIN now implements curved-ray propagation (beyond the reference's
    # NotImplementedError placeholder) — zero-gradient default medium must
    # reduce to the homogeneous straight line
    g = GRINPropagation().propagate(rays, 1.0)
    assert_allclose(g.z, jnp.ones(3), atol=1e-12)
    d = model.to_dict()
    model2 = BasePropagationModel.from_dict(d, IdealMaterial(1.5))
    assert isinstance(model2, HomogeneousPropagation)
