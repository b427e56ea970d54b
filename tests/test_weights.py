"""Field/wavelength weights and resolver utilities
(reference: tests/test_weights.py, optiland/utils.py:17-226,
optiland/optimization/operand/operand.py:235-277)."""

import numpy as np
import pytest

from optiland_tpu.optic import Optic
from optiland_tpu.optimization import OptimizationProblem
from optiland_tpu.optimization.operands import Operand
from optiland_tpu.utils import (
    FieldPoint,
    WavelengthPoint,
    active_fields,
    active_wavelengths,
    resolve_fields,
    resolve_wavelengths,
    weighted_average,
)


def _make_weighted_optic():
    optic = Optic()
    optic.add_surface(index=0, thickness=np.inf)
    optic.add_surface(index=1, radius=50.0, thickness=5.0, material="N-BK7",
                      is_stop=True)
    optic.add_surface(index=2, radius=-50.0, thickness=45.0)
    optic.add_surface(index=3)
    optic.set_aperture("EPD", 10.0)
    optic.set_field_type("angle")
    optic.fields.add(0.0, 0.0, weight=2.0)
    optic.fields.add(0.0, 7.0, weight=1.0)
    optic.fields.add(0.0, 10.0, weight=0.0)
    optic.wavelengths.add(0.55, is_primary=True, weight=1.0)
    optic.wavelengths.add(0.48, weight=3.0)
    optic.wavelengths.add(0.65, weight=0.0)
    return optic


# -- weight validation ------------------------------------------------------


def test_field_constructor_rejects_negative_weight():
    optic = Optic()
    with pytest.raises(ValueError, match="non-negative"):
        optic.fields.add(0.0, 1.0, weight=-0.5)


def test_field_setter_rejects_negative_weight():
    optic = _make_weighted_optic()
    with pytest.raises(ValueError, match="non-negative"):
        optic.fields.fields[0].weight = -1.0


def test_wavelength_constructor_rejects_negative_weight():
    optic = Optic()
    with pytest.raises(ValueError, match="non-negative"):
        optic.wavelengths.add(0.55, weight=-2.0)


def test_wavelength_setter_rejects_negative_weight():
    optic = _make_weighted_optic()
    with pytest.raises(ValueError, match="non-negative"):
        optic.wavelengths.wavelengths[0].weight = -1e-9


def test_default_weight_is_one():
    optic = Optic()
    optic.fields.add(0.0, 5.0)
    optic.wavelengths.add(0.55)
    assert optic.fields.fields[0].weight == 1.0
    assert optic.wavelengths.wavelengths[0].weight == 1.0


# -- group weights ----------------------------------------------------------


def test_field_group_weights_tuple():
    optic = _make_weighted_optic()
    assert optic.fields.weights == (2.0, 1.0, 0.0)


def test_wavelength_group_weights_tuple():
    optic = _make_weighted_optic()
    assert optic.wavelengths.weights == (1.0, 3.0, 0.0)


# -- resolve_fields ---------------------------------------------------------


def test_resolve_fields_all_returns_field_points():
    optic = _make_weighted_optic()
    result = resolve_fields(optic, "all")
    assert len(result) == 3
    assert all(isinstance(fp, FieldPoint) for fp in result)
    assert [fp.weight for fp in result] == [2.0, 1.0, 0.0]


def test_resolve_fields_all_coords_normalized():
    optic = _make_weighted_optic()
    result = resolve_fields(optic, "all")
    np.testing.assert_allclose(result[2].coord, (0.0, 1.0))
    np.testing.assert_allclose(result[1].coord, (0.0, 0.7))


def test_resolve_fields_raw_list_weight_one():
    optic = _make_weighted_optic()
    result = resolve_fields(optic, [(0.0, 0.3), (0.0, 1.0)])
    assert [fp.weight for fp in result] == [1.0, 1.0]
    assert result[0].coord == (0.0, 0.3)


def test_resolve_fields_single_tuple():
    optic = _make_weighted_optic()
    result = resolve_fields(optic, (0.5, 0.5))
    assert len(result) == 1
    assert result[0].weight == 1.0


def test_resolve_fields_int_index_weight_one():
    optic = _make_weighted_optic()
    result = resolve_fields(optic, 1)
    assert len(result) == 1
    assert result[0].weight == 1.0
    np.testing.assert_allclose(result[0].coord, (0.0, 0.7))


def test_resolve_fields_invalid_string_raises():
    optic = _make_weighted_optic()
    with pytest.raises(ValueError, match="Invalid field string"):
        resolve_fields(optic, "everything")


def test_resolve_fields_invalid_type_raises():
    optic = _make_weighted_optic()
    with pytest.raises(TypeError):
        resolve_fields(optic, 3.14)


# -- resolve_wavelengths ----------------------------------------------------


def test_resolve_wavelengths_all():
    optic = _make_weighted_optic()
    result = resolve_wavelengths(optic, "all")
    assert [wp.weight for wp in result] == [1.0, 3.0, 0.0]
    np.testing.assert_allclose([wp.value for wp in result],
                               [0.55, 0.48, 0.65])


def test_resolve_wavelengths_primary():
    optic = _make_weighted_optic()
    result = resolve_wavelengths(optic, "primary")
    assert len(result) == 1
    assert isinstance(result[0], WavelengthPoint)
    assert result[0].weight == 1.0
    assert abs(result[0].value - 0.55) < 1e-9


def test_resolve_wavelengths_raw_list_weight_one():
    optic = _make_weighted_optic()
    result = resolve_wavelengths(optic, [0.5, 0.6])
    assert [wp.weight for wp in result] == [1.0, 1.0]


def test_resolve_wavelengths_invalid_string_raises():
    optic = _make_weighted_optic()
    with pytest.raises(ValueError, match="Invalid wavelength string"):
        resolve_wavelengths(optic, "first")


def test_resolve_wavelengths_invalid_type_raises():
    optic = _make_weighted_optic()
    with pytest.raises(TypeError):
        resolve_wavelengths(optic, 0.55)


# -- active filters / weighted average --------------------------------------


def test_active_fields_removes_zero_weight():
    optic = _make_weighted_optic()
    active = active_fields(resolve_fields(optic, "all"))
    assert len(active) == 2
    assert all(fp.weight > 0.0 for fp in active)


def test_active_fields_empty_when_all_zero():
    assert active_fields([FieldPoint(coord=(0.0, 0.0), weight=0.0)]) == []


def test_active_wavelengths_removes_zero_weight():
    optic = _make_weighted_optic()
    active = active_wavelengths(resolve_wavelengths(optic, "all"))
    assert len(active) == 2


def test_active_wavelengths_empty_when_all_zero():
    assert active_wavelengths([WavelengthPoint(0.55, 0.0)]) == []


def test_weighted_average_correct_result():
    assert abs(weighted_average([1.0, 2.0, 3.0], [1.0, 2.0, 1.0]) - 2.0) < 1e-12


def test_weighted_average_uniform_equals_mean():
    assert abs(weighted_average([1.0, 2.0, 3.0], [1.0, 1.0, 1.0]) - 2.0) < 1e-12


def test_weighted_average_raises_on_all_zero():
    with pytest.raises(ValueError, match="all weights are zero"):
        weighted_average([1.0, 2.0], [0.0, 0.0])


# -- Operand.effective_weight ------------------------------------------------


def test_effective_weight_with_field_and_wavelength_index():
    optic = _make_weighted_optic()
    op = Operand("f2", target=50.0, weight=1.5,
                 input_data={"optic": optic, "field": 0, "wavelength": 1})
    assert abs(op.effective_weight() - 1.5 * 2.0 * 3.0) < 1e-12


def test_effective_weight_without_indices_is_operand_weight():
    optic = _make_weighted_optic()
    op = Operand("f2", target=50.0, weight=2.0, input_data={"optic": optic})
    assert abs(op.effective_weight() - 2.0) < 1e-12


def test_effective_weight_zero_field_weight_is_zero():
    optic = _make_weighted_optic()
    op = Operand("f2", target=50.0, weight=1.0,
                 input_data={"optic": optic, "field": 2, "wavelength": 0})
    assert op.effective_weight() == 0.0


def test_effective_weight_out_of_range_index_defaults_to_one():
    optic = _make_weighted_optic()
    op = Operand("f2", target=50.0, weight=1.0,
                 input_data={"optic": optic, "field": 99})
    assert op.effective_weight() == 1.0


def test_effective_weight_explicit_optic_argument():
    optic = _make_weighted_optic()
    op = Operand("f2", target=50.0, weight=1.0,
                 input_data={"field": 0})
    assert op.effective_weight() == 1.0  # no optic available
    assert op.effective_weight(optic) == 2.0


# -- merit integration -------------------------------------------------------


def test_merit_scales_with_effective_weight():
    optic = _make_weighted_optic()
    prob = OptimizationProblem(optic)
    prob.add_operand("f2", target=40.0, weight=1.0,
                     input_data={"optic": optic, "wavelength": 1})
    prob.add_variable(optic, "radius", surface_number=1)
    v1 = float(prob.sum_squared())

    optic2 = _make_weighted_optic()
    prob2 = OptimizationProblem(optic2)
    prob2.add_operand("f2", target=40.0, weight=1.0,
                      input_data={"optic": optic2})
    prob2.add_variable(optic2, "radius", surface_number=1)
    v2 = float(prob2.sum_squared())
    assert abs(v1 - 3.0 * v2) < 1e-6 * max(1.0, abs(v2))


def test_weights_json_round_trip(tmp_path):
    from optiland_tpu.fileio import load_optiland_file, save_optiland_file

    optic = _make_weighted_optic()
    path = str(tmp_path / "weighted.json")
    save_optiland_file(optic, path)
    loaded = load_optiland_file(path)
    assert loaded.fields.weights == (2.0, 1.0, 0.0)
    assert loaded.wavelengths.weights == (1.0, 3.0, 0.0)


def test_int_wavelength_index_resolves_value_for_ray_operands():
    """{'wavelength': 1} is an index: weight lookup AND resolution to that
    wavelength's value for functions that take one."""
    optic = _make_weighted_optic()
    op = Operand("rms_spot_size", target=0.0, weight=1.0,
                 input_data={"optic": optic, "wavelength": 1,
                             "Hx": 0.0, "Hy": 0.0, "num_rays": 8,
                             "distribution": "hexapolar"})
    assert op.effective_weight() == pytest.approx(3.0)  # weight of wl #1
    assert op.input_data["wavelength"] == pytest.approx(0.48)
    v = float(op.value(optic.system))
    assert np.isfinite(v)
