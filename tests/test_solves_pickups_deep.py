"""Solve and pickup behavior beyond the golden-parity tests: every solve
type's invariant, manager semantics, generic/cross-optic pickups
(reference: tests/test_solves.py, tests/test_pickup.py,
optiland/solves/, optiland/pickup.py)."""

import numpy as np
import pytest

from optiland_tpu.optic import Optic
from optiland_tpu.pickup import Pickup
from optiland_tpu.samples import CookeTriplet
from optiland_tpu.solves import BaseSolve, QuickFocusSolve, SolveFactory


def _doublet():
    optic = Optic()
    optic.add_surface(index=0, thickness=np.inf)
    optic.add_surface(index=1, radius=61.0, thickness=4.0, material="N-BK7",
                      is_stop=True)
    optic.add_surface(index=2, radius=-45.0, thickness=2.0,
                      material=("SF5", "schott"))
    optic.add_surface(index=3, radius=-130.0, thickness=90.0)
    optic.add_surface(index=4)
    optic.set_aperture("EPD", 25.0)
    optic.set_field_type("angle")
    optic.fields.add(0.0, 0.0)
    optic.wavelengths.add(0.55, is_primary=True)
    return optic


# -- solves -------------------------------------------------------------------


def test_quick_focus_minimizes_spot():
    optic = _doublet()

    def rms():
        r = optic.trace(0.0, 0.0, num_rays=32, wavelength=0.55,
                        distribution="hexapolar")
        x, y = np.asarray(r.x), np.asarray(r.y)
        return float(np.sqrt(np.mean(x**2 + y**2)))

    before = rms()
    optic.solves.add("quick_focus")
    after = rms()
    assert after <= before + 1e-12


def test_quick_focus_rejects_empty_system():
    optic = Optic()
    optic.add_surface(index=0, thickness=np.inf)
    optic.add_surface(index=1)
    with pytest.raises(ValueError, match="empty optical system"):
        QuickFocusSolve(optic)


def test_marginal_ray_height_solve_hits_target():
    optic = _doublet()
    optic.solves.add("marginal_ray_height", 4, 0.0)
    y, _ = optic.paraxial.marginal_ray()
    y = np.ravel(np.asarray(y))
    assert abs(y[4]) < 1e-8


def test_chief_ray_height_solve_hits_target():
    optic = CookeTriplet()
    optic.solves.add("chief_ray_height", 6, 0.5)
    yb, _ = optic.paraxial.chief_ray()
    yb = np.ravel(np.asarray(yb))
    assert abs(yb[6] - 0.5) < 1e-8


def test_marginal_ray_angle_solve_hits_target():
    optic = _doublet()
    optic.solves.add("marginal_ray_angle", 3, -0.08)
    _, u = optic.paraxial.marginal_ray()
    u = np.ravel(np.asarray(u))
    assert abs(u[3] - (-0.08)) < 1e-8


def test_chief_ray_angle_solve_applies():
    optic = CookeTriplet()
    _, u0 = optic.paraxial.chief_ray()
    optic.solves.add("chief_ray_angle", 2, 0.1)
    _, u = optic.paraxial.chief_ray()
    u = np.ravel(np.asarray(u))
    assert abs(u[2] - 0.1) < 1e-6


def test_solve_factory_rejects_unknown():
    optic = _doublet()
    with pytest.raises(ValueError, match="Unknown solve type"):
        SolveFactory.create_solve(optic, "teleport")


def test_solve_manager_len_and_clear():
    optic = _doublet()
    optic.solves.add("quick_focus")
    assert len(optic.solves) == 1
    optic.solves.clear()
    assert len(optic.solves) == 0


def test_solve_reapplies_after_perturbation():
    optic = _doublet()
    optic.solves.add("marginal_ray_height", 4, 0.0)
    optic.set_radius(70.0, 1)
    optic.update()  # re-applies pickups then solves
    y, _ = optic.paraxial.marginal_ray()
    assert abs(np.ravel(np.asarray(y))[4]) < 1e-8


def test_solve_registry_contains_all_types():
    for name in ("QuickFocusSolve", "MarginalRayHeightSolve",
                 "ChiefRayHeightSolve", "MarginalRayAngleCurvatureSolve",
                 "ChiefRayAngleCurvatureSolve"):
        assert name in BaseSolve._registry


# -- pickups ------------------------------------------------------------------


def test_pickup_radius_scale_offset():
    optic = _doublet()
    optic.pickups.add(1, "radius", 3, scale=2.0, offset=-5.0)
    assert optic.surfaces.surfaces[3].radius == 2.0 * 61.0 - 5.0


def test_pickup_thickness():
    optic = _doublet()
    optic.pickups.add(1, "thickness", 2)
    assert optic.surfaces.surfaces[2].thickness == 4.0


def test_pickup_conic():
    optic = _doublet()
    optic.surfaces.surfaces[1].conic = -1.0
    optic.pickups.add(1, "conic", 2, scale=0.5)
    assert optic.surfaces.surfaces[2].conic == -0.5


def test_pickup_tracks_source_changes():
    optic = _doublet()
    optic.pickups.add(1, "radius", 3, scale=-1.0)
    optic.set_radius(80.0, 1)
    optic.update()
    assert optic.surfaces.surfaces[3].radius == -80.0


def test_pickup_cross_optic_source():
    src = _doublet()
    dst = _doublet()
    dst.pickups.add(1, "radius", 1, source_optic=src)
    src.set_radius(99.0, 1)
    dst.pickups.apply()
    assert dst.surfaces.surfaces[1].radius == 99.0


def test_generic_pickup_dotted_path():
    optic = _doublet()
    optic.pickups.add(0, "surfaces.surfaces[2].material", 0)
    assert optic.surfaces.surfaces[2].material == ("SF5", "schott")


def test_generic_pickup_rejects_plain_name():
    optic = _doublet()
    with pytest.raises(ValueError, match="Invalid pickup attribute"):
        Pickup(optic, 1, "refractive_index", 2)


def test_pickup_manager_len_and_clear():
    optic = _doublet()
    optic.pickups.add(1, "radius", 2)
    assert len(optic.pickups) == 1
    optic.pickups.clear()
    assert len(optic.pickups) == 0


def test_pickup_to_dict():
    optic = _doublet()
    p = optic.pickups.add(1, "radius", 3, scale=2.0, offset=1.0)
    d = p.to_dict()
    assert d == {
        "source_surface_idx": 1, "attr_type": "radius",
        "target_surface_idx": 3, "scale": 2.0, "offset": 1.0,
    }
