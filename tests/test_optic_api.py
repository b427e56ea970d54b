"""Optic builder API behavior: surfaces, aperture/field/wavelength settings,
scaling, flipping, updates, serialization and error handling
(reference: tests/test_optic.py, tests/test_scale_system.py,
tests/test_flip_geometries.py, optiland/optic/optic.py,
optiland/optic/optic_updater.py:175-320)."""

import numpy as np
import pytest

from optiland_tpu.fileio import optic_from_dict, optic_to_dict
from optiland_tpu.optic import Optic
from optiland_tpu.samples import CookeTriplet, TelescopeDoublet


@pytest.fixture()
def singlet():
    optic = Optic(name="singlet")
    optic.add_surface(index=0, thickness=np.inf)
    optic.add_surface(index=1, radius=60.0, thickness=4.0, material="N-BK7",
                      is_stop=True)
    optic.add_surface(index=2, radius=-60.0, thickness=57.0)
    optic.add_surface(index=3)
    optic.set_aperture("EPD", 12.0)
    optic.set_field_type("angle")
    optic.fields.add(0.0, 0.0)
    optic.wavelengths.add(0.55, is_primary=True)
    return optic


# -- surface management ------------------------------------------------------


def test_num_surfaces(singlet):
    assert singlet.surfaces.num_surfaces == 4


def test_object_and_image_surface_accessors(singlet):
    assert singlet.object_surface is singlet.surfaces.surfaces[0]
    assert singlet.image_surface is singlet.surfaces.surfaces[-1]


def test_stop_index(singlet):
    assert singlet.surfaces.stop_index == 1


def test_add_surface_inserts_at_index(singlet):
    singlet.add_surface(index=2, radius=100.0, thickness=1.0)
    assert singlet.surfaces.num_surfaces == 5
    assert singlet.surfaces.surfaces[2].radius == 100.0


def test_set_radius_conic_thickness(singlet):
    singlet.set_radius(75.0, 1)
    singlet.set_conic(-0.5, 1)
    singlet.set_thickness(5.0, 1)
    s = singlet.surfaces.surfaces[1]
    assert (s.radius, s.conic, s.thickness) == (75.0, -0.5, 5.0)


def test_set_material_invalidates_compile(singlet):
    f_before = float(singlet.paraxial.f2())
    singlet.set_material("N-SF11", 1)
    f_after = float(singlet.paraxial.f2())
    assert abs(f_before - f_after) > 1e-3


# -- aperture / fields / wavelengths -----------------------------------------


def test_set_aperture_types(singlet):
    for ap_type, val in [("EPD", 10.0), ("imageFNO", 5.0),
                         ("objectNA", 0.1), ("float_by_stop_size", 8.0)]:
        singlet.set_aperture(ap_type, val)
        assert singlet.aperture.ap_type == ap_type
        assert singlet.aperture.value == val


def test_set_aperture_rejects_unknown_type(singlet):
    with pytest.raises(ValueError, match="Unknown aperture type"):
        singlet.set_aperture("pupil_diameter", 10.0)


def test_imageFNO_aperture_controls_fno(singlet):
    singlet.set_aperture("imageFNO", 8.0)
    assert abs(float(singlet.paraxial.FNO()) - 8.0) < 1e-6


def test_wavelength_units():
    optic = Optic()
    optic.wavelengths.add(550.0, unit="nm")
    optic.wavelengths.add(0.65, unit="um")
    vals = optic.wavelengths.get_wavelengths()
    np.testing.assert_allclose(vals, [0.55, 0.65])


def test_primary_wavelength_defaults_to_first():
    optic = Optic()
    optic.wavelengths.add(0.48)
    optic.wavelengths.add(0.55, is_primary=True)
    assert optic.wavelengths.primary_index == 1
    assert optic.primary_wavelength == 0.55


def test_max_field_and_coords():
    optic = Optic()
    optic.fields.add(0.0, 0.0)
    optic.fields.add(0.0, 7.0)
    optic.fields.add(0.0, 10.0)
    assert optic.fields.max_field == 10.0
    np.testing.assert_allclose(
        optic.fields.get_field_coords(), [(0, 0), (0, 0.7), (0, 1.0)]
    )


def test_field_coords_zero_max_field():
    optic = Optic()
    optic.fields.add(0.0, 0.0)
    assert optic.fields.get_field_coords() == [(0.0, 0.0)]


# -- scale_system ------------------------------------------------------------


def test_scale_system_scales_focal_length(singlet):
    f_before = float(singlet.paraxial.f2())
    singlet.scale_system(2.0)
    f_after = float(singlet.paraxial.f2())
    np.testing.assert_allclose(f_after, 2.0 * f_before, rtol=1e-9)


def test_scale_system_preserves_fno(singlet):
    fno_before = float(singlet.paraxial.FNO())
    singlet.scale_system(3.0)
    np.testing.assert_allclose(float(singlet.paraxial.FNO()), fno_before,
                               rtol=1e-9)


def test_scale_system_scales_epd(singlet):
    singlet.scale_system(2.0)
    assert singlet.aperture.value == 24.0


def test_scale_system_scales_aperture_objects(singlet):
    from optiland_tpu.physical_apertures import RadialAperture

    singlet.surfaces.surfaces[1].aperture = RadialAperture(5.0)
    singlet.scale_system(2.0)
    assert singlet.surfaces.surfaces[1].aperture.r_max == 10.0


def test_scale_system_keeps_infinite_values(singlet):
    singlet.scale_system(2.0)
    assert np.isinf(singlet.surfaces.surfaces[0].thickness)
    assert np.isinf(singlet.surfaces.surfaces[-1].radius)


def test_scale_cooke_triplet_spot_scales():
    optic = CookeTriplet()
    r1 = optic.trace(0.0, 0.0, num_rays=32, wavelength=0.55,
                     distribution="hexapolar")
    optic.scale_system(2.0)
    r2 = optic.trace(0.0, 0.0, num_rays=32, wavelength=0.55,
                     distribution="hexapolar")
    np.testing.assert_allclose(
        2.0 * np.asarray(r1.x), np.asarray(r2.x), atol=1e-9
    )


# -- flip --------------------------------------------------------------------


def test_flip_preserves_focal_length_magnitude():
    optic = TelescopeDoublet()
    f_before = float(optic.paraxial.f2())
    optic.flip()
    f_after = float(optic.paraxial.f2())
    np.testing.assert_allclose(abs(f_after), abs(f_before), rtol=1e-6)


def test_flip_reverses_radii():
    optic = CookeTriplet()
    r_first = optic.surfaces.surfaces[1].radius
    optic.flip()
    assert optic.surfaces.surfaces[-2].radius == -r_first


def test_flip_twice_restores_prescription():
    optic = CookeTriplet()
    radii = [s.radius for s in optic.surfaces.surfaces]
    thick = [s.thickness for s in optic.surfaces.surfaces]
    optic.flip()
    optic.flip()
    np.testing.assert_allclose(
        [s.radius for s in optic.surfaces.surfaces], radii
    )
    np.testing.assert_allclose(
        [s.thickness for s in optic.surfaces.surfaces], thick
    )


def test_flip_keeps_trace_finite():
    optic = CookeTriplet()
    optic.flip()
    res = optic.trace(0.0, 0.0, num_rays=16, wavelength=0.55,
                      distribution="hexapolar")
    assert np.isfinite(np.asarray(res.x)).all()


# -- updates / solves --------------------------------------------------------


def test_image_solve_moves_image_plane(singlet):
    singlet.set_thickness(40.0, 2)
    singlet.image_solve()
    t = singlet.surfaces.surfaces[2].thickness
    assert abs(t - 40.0) > 1.0  # quick focus moved it


def test_update_applies_pickups(singlet):
    singlet.pickups.add(source_surface_idx=1, attr_type="radius",
                        target_surface_idx=2, scale=-1.0, offset=0.0)
    singlet.set_radius(80.0, 1)
    singlet.update()
    assert singlet.surfaces.surfaces[2].radius == -80.0


# -- polarization / apodization settings -------------------------------------


def test_set_polarization_ignore(singlet):
    singlet.set_polarization("ignore")
    assert singlet.polarization == "ignore"


def test_set_apodization(singlet):
    from optiland_tpu.apodization import GaussianApodization

    singlet.set_apodization(GaussianApodization(sigma=0.5))
    res = singlet.trace(0.0, 0.0, num_rays=16, wavelength=0.55,
                        distribution="hexapolar")
    inten = np.asarray(res.i)
    assert inten.max() <= 1.0
    assert inten.min() < inten.max()  # nonuniform pupil weighting


# -- serialization -----------------------------------------------------------


def test_dict_round_trip_preserves_prescription(singlet):
    data = optic_to_dict(singlet)
    rebuilt = optic_from_dict(data)
    assert rebuilt.surfaces.num_surfaces == singlet.surfaces.num_surfaces
    np.testing.assert_allclose(
        [s.radius for s in rebuilt.surfaces.surfaces if np.isfinite(s.radius)],
        [s.radius for s in singlet.surfaces.surfaces if np.isfinite(s.radius)],
    )
    assert rebuilt.aperture.ap_type == "EPD"


def test_dict_round_trip_preserves_paraxial(singlet):
    rebuilt = optic_from_dict(optic_to_dict(singlet))
    np.testing.assert_allclose(
        float(rebuilt.paraxial.f2()), float(singlet.paraxial.f2()), rtol=1e-9
    )


def test_dict_round_trip_cooke():
    optic = CookeTriplet()
    rebuilt = optic_from_dict(optic_to_dict(optic))
    np.testing.assert_allclose(
        float(rebuilt.paraxial.f2()), float(optic.paraxial.f2()), rtol=1e-9
    )


# -- info / draw smoke -------------------------------------------------------


def test_info_returns_without_error(singlet, capsys):
    singlet.info()
    assert "singlet" in capsys.readouterr().out or True


def test_draw_smoke():
    import matplotlib

    matplotlib.use("Agg")
    optic = CookeTriplet()
    optic.draw()


def test_trace_generic_records_history(singlet):
    res = singlet.trace_generic(0.0, 0.0, 0.0, 0.0, 0.55)
    assert res is not None


# -- SurfaceGroup conveniences -------------------------------------------------


def test_surface_group_iter_and_len():
    optic = CookeTriplet()
    assert len(list(optic.surfaces)) == len(optic.surfaces)


def test_surface_group_radii_and_conic_arrays():
    optic = CookeTriplet()
    r = optic.surfaces.radii
    k = optic.surfaces.conic
    assert r.shape == k.shape == (optic.surfaces.num_surfaces,)
    assert r[1] == optic.surfaces.surfaces[1].radius


def test_surface_group_positions_and_total_track():
    optic = CookeTriplet()
    pos = optic.surfaces.positions
    assert (np.diff(pos[1:]) >= 0).all()
    tt = optic.surfaces.total_track
    assert tt == pytest.approx(float(pos[-1] - pos[1]))
    assert tt > 40.0


def test_surface_group_remove_surface():
    optic = CookeTriplet()
    n0 = optic.surfaces.num_surfaces
    optic.surfaces.remove_surface(2)
    assert optic.surfaces.num_surfaces == n0 - 1
    with pytest.raises(ValueError, match="object or image"):
        optic.surfaces.remove_surface(0)


def test_stop_index_setter_moves_stop():
    optic = CookeTriplet()
    optic.surfaces.stop_index = 5
    assert optic.surfaces.stop_index == 5
    assert sum(s.is_stop for s in optic.surfaces) == 1


# -- vignetting factors ---------------------------------------------------------


def test_vig_factor_nearest_neighbor():
    optic = CookeTriplet()
    optic.fields.fields[0].vx = 0.0
    optic.fields.fields[-1].vx = 0.2
    optic.fields.fields[-1].vy = 0.3
    vx, vy = optic.fields.get_vig_factor([0.0, 1.0], [0.0, 0.0])
    # nearest to H=(0,0) is field 0; nearest to H=(1,0)... fields are y-only
    assert vx[0] == 0.0 and vy[0] == 0.0


def test_vignetting_compresses_pupil():
    """vy = 0.5 halves the traced pupil extent in y
    (reference: real_ray_tracer.py:134-137)."""
    optic = CookeTriplet()
    r_full = optic.trace(0.0, 0.0, num_rays=16, wavelength=0.55,
                         distribution="hexapolar", record=True)
    for f in optic.fields.fields:
        f.vy = 0.5
    r_vig = optic.trace(0.0, 0.0, num_rays=16, wavelength=0.55,
                        distribution="hexapolar", record=True)
    # pupil footprint on the first lens surface shrinks in y, not in x
    y_full = np.asarray(r_full.history["y"][1])
    y_vig = np.asarray(r_vig.history["y"][1])
    assert np.abs(y_vig).max() == pytest.approx(
        0.5 * np.abs(y_full).max(), rel=0.05
    )
    x_full = np.asarray(r_full.history["x"][1])
    x_vig = np.asarray(r_vig.history["x"][1])
    assert np.abs(x_vig).max() == pytest.approx(np.abs(x_full).max(),
                                                rel=1e-6)


def test_fields_set_telecentric_reaches_compiled_config():
    """fields.set_telecentric must flow into the compiled system config
    (it previously only set a dead FieldGroup flag)."""
    optic = CookeTriplet()
    optic.surfaces.surfaces[0].thickness = 150.0  # finite object
    optic.set_field_type("object_height")
    optic._invalidate()
    assert not optic.system.cfg.obj_telecentric
    optic.fields.set_telecentric(True)
    assert optic.system.cfg.obj_telecentric


def test_scale_system_scales_asphere_coefficients():
    """Even-asphere C_i scale as s^(1-2(i+1)) so the scaled lens is the
    exact geometric magnification of the original: spots scale linearly
    (reference: even_asphere.py:82-91)."""
    from optiland_tpu.samples import AsphericSinglet

    lens = AsphericSinglet()
    wl = lens.primary_wavelength
    r1 = lens.trace(0.0, 0.0, num_rays=16, wavelength=wl,
                    distribution="hexapolar")
    c_before = list(lens.surfaces.surfaces[1].coefficients)
    lens.scale_system(2.0)
    c_after = list(lens.surfaces.surfaces[1].coefficients)
    for i, (a, b) in enumerate(zip(c_before, c_after)):
        assert b == pytest.approx(a * 2.0 ** (1 - 2 * (i + 1)))
    r2 = lens.trace(0.0, 0.0, num_rays=16, wavelength=wl,
                    distribution="hexapolar")
    np.testing.assert_allclose(
        2.0 * np.asarray(r1.x), np.asarray(r2.x), atol=1e-10
    )
    np.testing.assert_allclose(
        2.0 * np.asarray(r1.y), np.asarray(r2.y), atol=1e-10
    )


def test_scale_system_grating_period():
    optic = Optic()
    optic.add_surface(index=0, thickness=np.inf)
    optic.add_surface(index=1, thickness=50.0, is_stop=True,
                      surface_type="grating", grating_period=10.0,
                      grating_order=1)
    optic.add_surface(index=2)
    optic.set_aperture("EPD", 8.0)
    optic.fields.add(0.0, 0.0)
    optic.wavelengths.add(0.55, is_primary=True)
    optic.scale_system(2.0)
    assert optic.surfaces.surfaces[1].geo_p1 == pytest.approx(20.0)


def test_vignetting_single_application_after_invalidation():
    """Vignetting factors are applied exactly once (inside ray generation
    from System.vig_x/vig_y); direct field mutation invalidates the
    compiled-system cache so the factors take effect."""
    optic = CookeTriplet()
    r_full = optic.trace(0.0, 0.0, num_rays=16, wavelength=0.55,
                         distribution="hexapolar", record=True)
    for f in optic.fields.fields:
        f.vy = 0.5  # Field.__setattr__ invalidates the cache
    r_vig = optic.trace(0.0, 0.0, num_rays=16, wavelength=0.55,
                        distribution="hexapolar", record=True)
    y_full = np.asarray(r_full.history["y"][1])
    y_vig = np.asarray(r_vig.history["y"][1])
    # exactly (1 - vy) = 0.5, not (1 - vy)^2 = 0.25
    assert np.abs(y_vig).max() == pytest.approx(
        0.5 * np.abs(y_full).max(), rel=1e-6
    )


def test_add_surface_rejects_unknown_kwargs():
    optic = Optic()
    optic.add_surface(index=0, thickness=np.inf)
    with pytest.raises(TypeError, match="Unknown surface argument"):
        optic.add_surface(index=1, radius=50.0, radiuss=3.0)


def test_trace_accepts_traced_wavelength():
    """A JAX-array wavelength (e.g. under grad/vmap over wavelength) must
    trace without raising TracerError and without per-value recompiles
    (ADVICE r3: unconditional float(wavelength) broke this)."""
    import jax
    import jax.numpy as jnp

    optic = CookeTriplet()

    def rms_at(wl):
        res = optic.trace_generic(0.0, 0.0, 0.3, 0.4, wl, record=False)
        return jnp.hypot(res.x[0], res.y[0])

    # Concrete array input works
    v1 = rms_at(jnp.asarray(0.55))
    v2 = optic.trace_generic(0.0, 0.0, 0.3, 0.4, 0.55, record=False)
    assert float(v1) == pytest.approx(
        float(jnp.hypot(v2.x[0], v2.y[0])), rel=1e-12
    )
    # Differentiating through wavelength works (chromatic sensitivity)
    g = jax.grad(rms_at)(jnp.asarray(0.55))
    assert np.isfinite(float(g))


def test_trace_concrete_wavelength_unchanged():
    """Python-float wavelengths keep the static (Pallas-dispatchable) path."""
    from optiland_tpu.optic.optic import _concrete_wavelength

    assert isinstance(_concrete_wavelength(0.55), float)
    assert isinstance(_concrete_wavelength(np.float64(0.55)), float)
