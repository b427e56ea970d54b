"""Optimization loop tests: operands, variables, optimizers."""

import numpy as np
import pytest

from optiland_tpu.optimization import (
    LeastSquares,
    OptaxOptimizer,
    OptimizationProblem,
    OptimizerGeneric,
)
from optiland_tpu.samples import CookeTriplet
from tests.conftest import assert_allclose


def _perturbed_cooke():
    lens = CookeTriplet()
    lens.surfaces.surfaces[1].radius = 25.0
    lens._invalidate()
    return lens


def _spot_problem(lens, num_rays=5):
    problem = OptimizationProblem()
    for (Hx, Hy) in lens.fields.get_field_coords():
        problem.add_operand(
            operand_type="rms_spot_size",
            target=0,
            weight=1,
            input_data={
                "optic": lens,
                "Hx": Hx,
                "Hy": Hy,
                "num_rays": num_rays,
                "wavelength": 0.55,
                "distribution": "hexapolar",
            },
        )
    return problem


def test_least_squares_restores_perturbed_design():
    """North-star config #2: Cooke RMS-spot optimization converges."""
    lens = _perturbed_cooke()
    problem = _spot_problem(lens)
    problem.add_variable(lens, "radius", surface_number=1)
    problem.add_variable(lens, "radius", surface_number=2)
    initial = float(problem.sum_squared())
    res = LeastSquares(problem).optimize()
    assert res.fun < 1e-3
    assert res.fun < initial / 100
    # builder was updated in place
    assert abs(lens.surfaces.surfaces[1].radius - 22.0) < 1.0


def test_adam_decreases_merit():
    lens = _perturbed_cooke()
    problem = _spot_problem(lens)
    problem.add_variable(lens, "radius", surface_number=1)
    initial = float(problem.sum_squared())
    res = OptaxOptimizer(problem).optimize(n_steps=100, lr=3e-2)
    assert res.fun < initial / 10


def test_scipy_minimize_with_exact_gradient():
    lens = _perturbed_cooke()
    problem = _spot_problem(lens)
    problem.add_variable(lens, "radius", surface_number=1)
    res = OptimizerGeneric(problem).optimize(maxiter=50)
    assert res.fun < float(problem.sum_squared(problem.initial_x())) + 1e-12


def test_paraxial_operand_value():
    lens = CookeTriplet()
    problem = OptimizationProblem()
    op = problem.add_operand(
        operand_type="f2", target=50.0, weight=1.0, input_data={"optic": lens}
    )
    assert_allclose(float(op.value(lens.system)), 49.99978307, rtol=1e-6)


def test_inequality_operand():
    lens = CookeTriplet()
    problem = OptimizationProblem()
    op = problem.add_operand(
        operand_type="f2", min_val=60.0, weight=1.0, input_data={"optic": lens}
    )
    # f2 ~ 50 < 60 -> penalty ~ 10
    assert_allclose(float(op.delta(lens.system)), 10.000216928, rtol=1e-5)
    op2 = problem.add_operand(
        operand_type="f2", max_val=60.0, weight=1.0, input_data={"optic": lens}
    )
    assert_allclose(float(op2.delta(lens.system)), 0.0, rtol=0, atol=1e-12)


def test_default_target_is_current_value():
    lens = CookeTriplet()
    problem = OptimizationProblem()
    op = problem.add_operand(operand_type="f2", input_data={"optic": lens})
    assert_allclose(op.target, 49.99978307, rtol=1e-6)
    assert_allclose(float(op.delta(lens.system)), 0.0, atol=1e-9)


def test_thickness_and_conic_variables():
    lens = _perturbed_cooke()
    problem = _spot_problem(lens)
    problem.add_variable(lens, "radius", surface_number=1)
    problem.add_variable(lens, "thickness", surface_number=6)
    problem.add_variable(lens, "conic", surface_number=1)
    initial = float(problem.sum_squared())
    res = LeastSquares(problem).optimize()
    assert res.fun < initial / 5


def test_variable_bounds_clip():
    from optiland_tpu.optimization.variables import Variable

    lens = CookeTriplet()
    v = Variable(lens, "radius", surface_number=1, min_val=23.0, max_val=30.0)
    sys2 = v.apply(lens.system, v.scaler.scale(10.0))
    assert float(np.asarray(sys2.stack.radius)[1]) == 23.0
