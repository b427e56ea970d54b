"""Paraxial-optics invariants that must hold for ANY well-formed system —
complementary to the golden-parity tests
(reference: tests/test_paraxial.py breadth, optiland/paraxial.py)."""

import numpy as np
import pytest

from optiland_tpu.core import paraxial
from optiland_tpu.samples import (
    CookeTriplet,
    DoubleGauss,
    HubbleTelescope,
    ReverseTelephoto,
    Telephoto,
    TessarLens,
)

SAMPLES = [CookeTriplet, DoubleGauss, TessarLens, Telephoto,
           ReverseTelephoto]


@pytest.fixture(scope="module", params=SAMPLES, ids=lambda c: c.__name__)
def lens(request):
    return request.param()


def test_f1_is_minus_f2_in_air(lens):
    """Object and image space are both air => f1 = -f2."""
    f1 = float(lens.paraxial.f1())
    f2 = float(lens.paraxial.f2())
    assert f1 == pytest.approx(-f2, rel=1e-9)


def test_principal_planes_offset_by_focal_length(lens):
    """F2 = P2 + f2 and F1 = P1 + f1 by definition."""
    s = lens.system
    F2 = float(paraxial.F2(s))
    P2 = float(paraxial.P2(s))
    f2 = float(paraxial.f2(s))
    assert F2 == pytest.approx(P2 + f2, rel=1e-8)
    F1 = float(paraxial.F1(s))
    P1 = float(paraxial.P1(s))
    f1 = float(paraxial.f1(s))
    assert F1 == pytest.approx(P1 + f1, rel=1e-8)


def test_nodal_points_coincide_with_principal_in_air(lens):
    """Equal object/image indices => nodal == principal points."""
    s = lens.system
    assert float(paraxial.N1(s)) == pytest.approx(float(paraxial.P1(s)),
                                                  abs=1e-8)
    assert float(paraxial.N2(s)) == pytest.approx(float(paraxial.P2(s)),
                                                  abs=1e-8)


def test_fno_equals_f_over_epd(lens):
    s = lens.system
    fno = float(paraxial.FNO(s))
    f2 = float(paraxial.f2(s))
    epd = float(paraxial.EPD(s))
    assert fno == pytest.approx(abs(f2) / epd, rel=1e-8)


def test_lagrange_invariant_nonzero(lens):
    inv = float(paraxial.invariant(lens.system))
    assert np.isfinite(inv) and inv != 0.0


def test_marginal_ray_starts_at_half_epd(lens):
    y, _ = lens.paraxial.marginal_ray()
    y = np.ravel(np.asarray(y))
    epd = float(paraxial.EPD(lens.system))
    assert abs(y[1]) <= epd  # at the first real surface, bounded by EPD


def test_chief_ray_crosses_stop_center(lens):
    yb, _ = lens.paraxial.chief_ray()
    yb = np.ravel(np.asarray(yb))
    stop = lens.surfaces.stop_index
    assert abs(yb[stop]) < 1e-8


def test_marginal_ray_hits_image_near_axis(lens):
    """All these samples are focused designs: marginal ray lands near the
    axis at the image plane."""
    y, _ = lens.paraxial.marginal_ray()
    y = np.ravel(np.asarray(y))
    epd = float(paraxial.EPD(lens.system))
    assert abs(y[-1]) < 0.05 * epd


def test_mirror_system_focal_length():
    hubble = HubbleTelescope()
    f2 = float(hubble.paraxial.f2())
    assert np.isfinite(f2) and abs(f2) > 1000  # long-focus telescope


def test_invariant_constant_across_surfaces(lens):
    """n u ybar - n ubar y is conserved through every surface."""
    s = lens.system
    from optiland_tpu.core.system import n_all

    y, u = (np.ravel(np.asarray(a)) for a in lens.paraxial.marginal_ray())
    yb, ub = (np.ravel(np.asarray(a)) for a in lens.paraxial.chief_ray())
    n = np.ravel(np.asarray(n_all(s.stack, s.cfg, s.primary_wavelength)))
    # slopes u[i] hold AFTER surface i; heights y[i] AT surface i
    inv = []
    for i in range(1, len(y) - 1):
        inv.append(n[i] * (u[i] * yb[i] - ub[i] * y[i]))
    inv = np.asarray(inv)
    np.testing.assert_allclose(inv, inv[0], rtol=1e-8)


def test_magnification_finite_conjugates():
    """A finite-conjugate version of the Cooke has m = -image/object dist
    ratio consistency via Newton's equations."""
    lens = CookeTriplet()
    lens.surfaces.surfaces[0].thickness = 200.0
    lens._invalidate()
    m = float(lens.paraxial.magnification())
    assert np.isfinite(m) and m < 0  # real inverted image


def test_front_stop_system_paraxial_trace_finite():
    """Angle-field systems whose stop is surface 1 have the entrance pupil
    AT surface 1 (EPL = 0): the launch slope must come from the field
    angle directly, not from the 0/0 quotient (y1-y0)/(epl-z0)."""
    from optiland_tpu.optic import Optic

    optic = Optic()
    optic.add_surface(index=0, thickness=np.inf)
    optic.add_surface(index=1, radius=60.0, thickness=4.0, material="N-BK7",
                      is_stop=True)
    optic.add_surface(index=2, radius=-60.0, thickness=57.0)
    optic.add_surface(index=3)
    optic.set_aperture("EPD", 12.0)
    optic.set_field_type("angle")
    optic.fields.add(0.0, 0.0)
    optic.fields.add(0.0, 5.0)
    optic.wavelengths.add(0.55, is_primary=True)
    s = optic.system
    assert float(paraxial.EPL(s)) == pytest.approx(0.0, abs=1e-9)
    y, u = paraxial.trace(s, 1.0, np.array([-1.0, 0.0, 1.0]), 0.55)
    assert np.isfinite(np.asarray(y)).all()
    assert np.isfinite(np.asarray(u)).all()
    # slope entering the system equals tan(full field angle)
    u0 = np.ravel(np.asarray(u))[0:1]
    assert np.isfinite(u0).all()
