"""Interaction-model physics in full traces: grating equation orders,
thin-lens imaging equation, reflective gratings, phase-surface OPD
bookkeeping (reference: tests/test_interactions*.py breadth,
optiland/interactions/)."""

import numpy as np
import pytest

from optiland_tpu.optic import Optic


def _grating_optic(period_um=10.0, order=1, reflective=False):
    optic = Optic()
    optic.add_surface(index=0, thickness=np.inf)
    optic.add_surface(
        index=1, thickness=-50.0 if reflective else 50.0, is_stop=True,
        surface_type="grating", grating_period=period_um,
        grating_order=order, material="mirror" if reflective else "air",
    )
    optic.add_surface(index=2)
    optic.set_aperture("EPD", 8.0)
    optic.set_field_type("angle")
    optic.fields.add(0.0, 0.0)
    optic.wavelengths.add(0.55, is_primary=True)
    return optic


def _exit_direction(optic):
    r = optic.trace(0.0, 0.0, num_rays=4, wavelength=0.55,
                    distribution="hexapolar")
    return (float(np.asarray(r.L)[0]), float(np.asarray(r.M)[0]),
            float(np.asarray(r.N)[0]))


def test_transmission_grating_first_order_angle():
    """Normal incidence: sin(theta_m) = m * lambda / d."""
    optic = _grating_optic(period_um=10.0, order=1)
    L, M, N = _exit_direction(optic)
    sin_expected = 1 * 0.55 / 10.0
    assert M == pytest.approx(sin_expected, abs=1e-9)
    assert N == pytest.approx(np.sqrt(1 - sin_expected**2), abs=1e-9)


def test_grating_zero_order_passes_straight():
    optic = _grating_optic(period_um=10.0, order=0)
    L, M, N = _exit_direction(optic)
    assert M == pytest.approx(0.0, abs=1e-12)
    assert N == pytest.approx(1.0, abs=1e-12)


def test_grating_negative_order_flips_sign():
    pos = _grating_optic(period_um=10.0, order=1)
    neg = _grating_optic(period_um=10.0, order=-1)
    _, M_pos, _ = _exit_direction(pos)
    _, M_neg, _ = _exit_direction(neg)
    assert M_neg == pytest.approx(-M_pos, abs=1e-12)


def test_grating_dispersion_scales_with_wavelength():
    optic = _grating_optic(period_um=5.0, order=1)
    r_blue = optic.trace(0.0, 0.0, num_rays=4, wavelength=0.45,
                         distribution="hexapolar")
    r_red = optic.trace(0.0, 0.0, num_rays=4, wavelength=0.65,
                        distribution="hexapolar")
    m_blue = float(np.asarray(r_blue.M)[0])
    m_red = float(np.asarray(r_red.M)[0])
    assert m_blue == pytest.approx(0.45 / 5.0, abs=1e-9)
    assert m_red == pytest.approx(0.65 / 5.0, abs=1e-9)


def test_second_order_doubles_deflection():
    o1 = _grating_optic(period_um=10.0, order=1)
    o2 = _grating_optic(period_um=10.0, order=2)
    _, m1, _ = _exit_direction(o1)
    _, m2, _ = _exit_direction(o2)
    assert m2 == pytest.approx(2 * m1, abs=1e-12)


def test_reflective_grating_first_order():
    # After a mirror the trace records directions in the flipped frame
    # (reference convention, matched by the refl-grating golden test):
    # N stays positive and the diffraction sign is inverted.
    optic = _grating_optic(period_um=10.0, order=1, reflective=True)
    L, M, N = _exit_direction(optic)
    assert M == pytest.approx(-0.55 / 10.0, abs=1e-9)
    assert N == pytest.approx(np.sqrt(1 - (0.55 / 10.0) ** 2), abs=1e-9)


# -- thin lens (paraxial surface) -----------------------------------------------


def _thin_lens(f=100.0, object_dist=np.inf):
    optic = Optic()
    optic.add_surface(index=0, thickness=object_dist)
    optic.add_surface(index=1, surface_type="paraxial", focal_length=f,
                      thickness=f, is_stop=True)
    optic.add_surface(index=2)
    optic.set_aperture("EPD", 10.0)
    optic.set_field_type("angle")
    optic.fields.add(0.0, 0.0)
    optic.wavelengths.add(0.55, is_primary=True)
    return optic


def test_thin_lens_imaging_equation():
    """Finite conjugates: 1/s' - 1/s = 1/f puts the image at s'."""
    f, s = 100.0, 300.0
    sp = 1.0 / (1.0 / f - 1.0 / s)  # 150 mm
    optic = _thin_lens(f=f, object_dist=s)
    optic.set_field_type("object_height")
    optic.surfaces.surfaces[1].thickness = sp
    optic._invalidate()
    r = optic.trace(0.0, 0.0, num_rays=16, wavelength=0.55,
                    distribution="hexapolar")
    y = np.asarray(r.y)
    assert np.std(y) < 1e-9  # perfect point image on axis


def test_thin_lens_negative_focal_diverges():
    optic = _thin_lens(f=-100.0)
    optic.surfaces.surfaces[1].thickness = 50.0
    optic._invalidate()
    r = optic.trace(0.0, 0.0, num_rays=8, wavelength=0.55,
                    distribution="hexapolar")
    # diverging beam: marginal ray heights larger than at the lens
    y_img = np.max(np.abs(np.asarray(r.y)))
    assert y_img > 5.0  # EPD/2 at the lens was 5


def test_phase_surface_advances_opd():
    """A constant phase adds/subtracts a constant optical path."""
    from optiland_tpu.phase import ConstantPhaseProfile

    def build(phase):
        optic = Optic()
        optic.add_surface(index=0, thickness=np.inf)
        optic.add_surface(index=1, thickness=50.0, is_stop=True,
                          phase_profile=ConstantPhaseProfile(phase))
        optic.add_surface(index=2)
        optic.set_aperture("EPD", 8.0)
        optic.fields.add(0.0, 0.0)
        optic.wavelengths.add(0.55, is_primary=True)
        return optic

    r0 = build(0.0).trace(0.0, 0.0, num_rays=4, wavelength=0.55,
                          distribution="hexapolar")
    r1 = build(2 * np.pi).trace(0.0, 0.0, num_rays=4, wavelength=0.55,
                                distribution="hexapolar")
    d_opd = np.asarray(r1.opd) - np.asarray(r0.opd)
    # 2pi of phase = one wavelength of OPD; opd is bookkept in mm
    np.testing.assert_allclose(np.abs(d_opd), 0.55e-3, atol=1e-12)
