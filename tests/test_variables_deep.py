"""Variable behaviors: every registered variable type's get/set round trip,
default scalers, bounds, and scaler math
(reference: tests/test_variable.py, optiland/optimization/variable/)."""

import jax.numpy as jnp
import numpy as np
import pytest

from optiland_tpu.optic import Optic
from optiland_tpu.optimization.scaling import (
    IdentityScaler,
    LinearScaler,
    LogScaler,
    PowerScaler,
    ReciprocalScaler,
)
from optiland_tpu.optimization.variables import MaterialVariable, Variable
from optiland_tpu.samples import CookeTriplet


@pytest.fixture(scope="module")
def cooke():
    return CookeTriplet()


@pytest.fixture(scope="module")
def cooke_system(cooke):
    return cooke.system


def _roundtrip(optic, system, var_type, new_value, **kwargs):
    """Set a raw value through the variable and read it back."""
    var = Variable(optic, var_type, scaler=IdentityScaler(), **kwargs)
    sys2 = var.apply(system, new_value)
    got = float(var.behavior.get(sys2))
    assert got == pytest.approx(new_value, rel=1e-12)
    return sys2


# -- scalers ------------------------------------------------------------------


def test_identity_scaler_round_trip():
    s = IdentityScaler()
    assert s.inverse_scale(s.scale(3.25)) == 3.25


def test_linear_scaler_round_trip():
    s = LinearScaler(factor=0.01, offset=-1.0)
    assert s.scale(100.0) == pytest.approx(0.0)
    assert s.inverse_scale(s.scale(42.0)) == pytest.approx(42.0)


def test_log_scaler_round_trip():
    s = LogScaler()
    v = float(s.inverse_scale(s.scale(7.0)))
    assert v == pytest.approx(7.0, rel=1e-9)


def test_power_scaler_round_trip():
    s = PowerScaler()
    v = float(s.inverse_scale(s.scale(0.125)))
    assert v == pytest.approx(0.125, rel=1e-9)


def test_reciprocal_scaler_round_trip():
    s = ReciprocalScaler()
    v = float(s.inverse_scale(s.scale(25.0)))
    assert v == pytest.approx(25.0, rel=1e-9)


# -- core variable types ------------------------------------------------------


def test_radius_variable_round_trip(cooke, cooke_system):
    _roundtrip(cooke, cooke_system, "radius", 30.0, surface_number=1)


def test_radius_default_scaler_value(cooke, cooke_system):
    var = Variable(cooke, "radius", surface_number=1)
    r = float(cooke_system.stack.radius[1])
    assert var.initial_scaled_value(cooke_system) == pytest.approx(
        r / 100.0 - 1.0
    )


def test_reciprocal_radius_round_trip(cooke, cooke_system):
    var = Variable(cooke, "reciprocal_radius", scaler=IdentityScaler(),
                   surface_number=1)
    sys2 = var.apply(cooke_system, 0.02)
    assert float(sys2.stack.radius[1]) == pytest.approx(50.0)


def test_reciprocal_radius_zero_maps_to_flat(cooke, cooke_system):
    var = Variable(cooke, "reciprocal_radius", scaler=IdentityScaler(),
                   surface_number=1)
    sys2 = var.apply(cooke_system, 0.0)
    assert np.isinf(float(sys2.stack.radius[1]))


def test_conic_variable_round_trip(cooke, cooke_system):
    _roundtrip(cooke, cooke_system, "conic", -0.75, surface_number=2)


def test_thickness_variable_round_trip(cooke, cooke_system):
    _roundtrip(cooke, cooke_system, "thickness", 7.5, surface_number=1)


def test_tilt_variable_round_trip(cooke, cooke_system):
    sys2 = _roundtrip(cooke, cooke_system, "tilt", 0.01,
                      surface_number=2, axis="x")
    assert float(sys2.stack.rx[2]) == pytest.approx(0.01)


def test_tilt_variable_y_axis(cooke, cooke_system):
    var = Variable(cooke, "tilt", scaler=IdentityScaler(),
                   surface_number=2, axis="y")
    sys2 = var.apply(cooke_system, -0.02)
    assert float(sys2.stack.ry[2]) == pytest.approx(-0.02)


def test_decenter_variable_round_trip(cooke, cooke_system):
    sys2 = _roundtrip(cooke, cooke_system, "decenter", 0.3,
                      surface_number=3, axis="y")
    assert float(sys2.stack.dy[3]) == pytest.approx(0.3)


def test_variable_bounds_clip(cooke, cooke_system):
    var = Variable(cooke, "thickness", scaler=IdentityScaler(),
                   min_val=2.0, max_val=4.0, surface_number=1)
    sys2 = var.apply(cooke_system, 10.0)
    assert float(sys2.stack.thickness[1]) == pytest.approx(4.0)
    sys3 = var.apply(cooke_system, 0.5)
    assert float(sys3.stack.thickness[1]) == pytest.approx(2.0)


def test_unknown_variable_type_raises(cooke):
    with pytest.raises(ValueError, match="Unknown variable type"):
        Variable(cooke, "wiggle", surface_number=1)


# -- coefficient-style variables ----------------------------------------------


def _asphere_optic():
    optic = Optic()
    optic.add_surface(index=0, thickness=np.inf)
    optic.add_surface(index=1, radius=40.0, thickness=5.0, material="N-BK7",
                      is_stop=True, surface_type="even_asphere",
                      coefficients=[1e-5, -2e-8])
    optic.add_surface(index=2, radius=-80.0, thickness=60.0)
    optic.add_surface(index=3)
    optic.set_aperture("EPD", 10.0)
    optic.fields.add(0.0, 0.0)
    optic.wavelengths.add(0.55, is_primary=True)
    return optic


def test_asphere_coeff_round_trip():
    optic = _asphere_optic()
    system = optic.system
    var = Variable(optic, "asphere_coeff", scaler=IdentityScaler(),
                   surface_number=1, coeff_number=0)
    sys2 = var.apply(system, 5e-5)
    assert float(sys2.stack.coeffs[1, 0]) == pytest.approx(5e-5)


def test_asphere_coeff_second_term():
    optic = _asphere_optic()
    var = Variable(optic, "asphere_coeff", scaler=IdentityScaler(),
                   surface_number=1, coeff_number=1)
    sys2 = var.apply(optic.system, 3e-8)
    assert float(sys2.stack.coeffs[1, 1]) == pytest.approx(3e-8)


def _zernike_optic():
    optic = Optic()
    optic.add_surface(index=0, thickness=np.inf)
    optic.add_surface(index=1, radius=45.0, thickness=5.0, material="N-BK7",
                      is_stop=True, surface_type="zernike",
                      coefficients=[1e-4, 0.0, 2e-4], norm_radius=10.0)
    optic.add_surface(index=2, radius=-80.0, thickness=60.0)
    optic.add_surface(index=3)
    optic.set_aperture("EPD", 10.0)
    optic.fields.add(0.0, 0.0)
    optic.wavelengths.add(0.55, is_primary=True)
    return optic


def test_zernike_coeff_round_trip():
    optic = _zernike_optic()
    var = Variable(optic, "zernike_coeff", scaler=IdentityScaler(),
                   surface_number=1, coeff_number=2)
    sys2 = var.apply(optic.system, 9e-4)
    assert float(sys2.stack.coeffs[1, 2]) == pytest.approx(9e-4)


def test_norm_radius_round_trip():
    optic = _zernike_optic()
    var = Variable(optic, "norm_radius", scaler=IdentityScaler(),
                   surface_number=1)
    sys2 = var.apply(optic.system, 12.0)
    assert float(var.behavior.get(sys2)) == pytest.approx(12.0)


def test_variable_apply_is_functional(cooke, cooke_system):
    """apply() returns a new pytree; the original system is unchanged."""
    var = Variable(cooke, "radius", scaler=IdentityScaler(), surface_number=1)
    before = float(cooke_system.stack.radius[1])
    var.apply(cooke_system, 123.0)
    assert float(cooke_system.stack.radius[1]) == before


def test_variable_is_differentiable(cooke, cooke_system):
    """Merit gradients flow through variable application."""
    import jax

    from optiland_tpu.core import raygen, trace

    var = Variable(cooke, "radius", scaler=IdentityScaler(), surface_number=1)

    def merit(r):
        sys2 = var.apply(cooke_system, r)
        px = jnp.linspace(-1, 1, 8)
        rays = raygen.generate_rays(sys2, jnp.zeros(8), jnp.zeros(8), px,
                                    jnp.zeros(8), 0.55)
        out, _ = trace.trace(sys2, rays)
        return jnp.mean(out.x**2)

    g = jax.grad(merit)(jnp.asarray(22.0))
    assert np.isfinite(float(g)) and float(g) != 0.0


# -- MaterialVariable ---------------------------------------------------------


def test_material_variable_reads_name(cooke):
    mv = MaterialVariable(cooke, 1, ["N-BK7", "N-SF11"])
    assert isinstance(mv.value, str)


def test_material_variable_update():
    optic = _asphere_optic()
    mv = MaterialVariable(optic, 1, ["N-BK7", "N-SF11"])
    f_before = float(optic.paraxial.f2())
    mv.update("N-SF11")
    assert mv.value == "N-SF11"
    assert abs(float(optic.paraxial.f2()) - f_before) > 1e-3


def test_generic_variable_getter_setter(cooke, cooke_system):
    var = Variable(
        cooke, "generic", scaler=IdentityScaler(),
        getter=lambda s: s.stack.conic[2],
        setter=lambda s, v: s.replace(
            stack=s.stack.replace(conic=s.stack.conic.at[2].set(v))
        ),
    )
    sys2 = var.apply(cooke_system, -1.5)
    assert float(sys2.stack.conic[2]) == pytest.approx(-1.5)
