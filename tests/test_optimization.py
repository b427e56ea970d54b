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


def _spot_problem(lens, num_rays=5, max_fields=None):
    problem = OptimizationProblem()
    for (Hx, Hy) in lens.fields.get_field_coords()[:max_fields]:
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
    """North-star config #2: Cooke RMS-spot optimization converges.

    Two fields x two radius variables: the residual-Jacobian compile is
    the dominant cost and scales with operand count; two operands keep
    the least-squares structure (the 3-field variant adds no coverage).
    """
    lens = _perturbed_cooke()
    problem = _spot_problem(lens, max_fields=2)
    problem.add_variable(lens, "radius", surface_number=1)
    problem.add_variable(lens, "radius", surface_number=2)
    initial = float(problem.sum_squared())
    res = LeastSquares(problem).optimize()
    assert res.fun < 1e-3
    assert res.fun < initial / 100
    # builder was updated in place
    assert abs(lens.surfaces.surfaces[1].radius - 22.0) < 1.0


@pytest.mark.slow
def test_adam_decreases_merit():
    lens = _perturbed_cooke()
    problem = _spot_problem(lens)
    problem.add_variable(lens, "radius", surface_number=1)
    initial = float(problem.sum_squared())
    res = OptaxOptimizer(problem).optimize(n_steps=100, lr=3e-2)
    assert res.fun < initial / 10


@pytest.mark.slow
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


@pytest.mark.slow
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


class TestNewOperands:
    """Aberration / lens / ray constraint operands vs reference goldens
    (reference: optimization/operand/aberration.py, lens.py, ray.py)."""

    def test_aberration_operands(self, goldens):
        import jax.numpy as jnp

        from optiland_tpu.optimization.operands import OPERAND_REGISTRY
        from optiland_tpu.samples import CookeTriplet

        g = goldens("operands")
        system = CookeTriplet().system
        for name in ("TSC", "SC", "CC", "TCC", "TAC", "AC", "TPC", "PC",
                     "DC", "TAchC", "LchC", "TchC"):
            assert_allclose(
                OPERAND_REGISTRY[name](system, surface_number=3), g[name],
                rtol=1e-8, atol=1e-12,
            )
            assert_allclose(
                OPERAND_REGISTRY[f"{name}_sum"](system), g[f"{name}_sum"],
                rtol=1e-8, atol=1e-12,
            )
        assert_allclose(
            OPERAND_REGISTRY["seidel"](system, seidel_number=1), g["seidel1"],
            rtol=1e-8,
        )

    def test_constraint_operands(self, goldens):
        import jax.numpy as jnp

        from optiland_tpu.optimization.operands import OPERAND_REGISTRY
        from optiland_tpu.samples import CookeTriplet

        g = goldens("operands")
        system = CookeTriplet().system
        assert_allclose(
            OPERAND_REGISTRY["total_track"](system), g["total_track"],
            rtol=1e-9,
        )
        assert_allclose(
            OPERAND_REGISTRY["edge_thickness"](system, surface_number=1),
            g["edge_thickness_1"], rtol=1e-7,
        )
        assert_allclose(
            OPERAND_REGISTRY["AOI"](
                system, surface_number=1, Hx=0.0, Hy=0.5,
                Px=jnp.asarray([0.0]), Py=jnp.asarray([0.6]), wavelength=0.55,
            ),
            g["AOI"], rtol=1e-8,
        )
        assert_allclose(
            OPERAND_REGISTRY["clearance"](
                system, 2, (0.0, 1.0), (0.0, 0.0), 3, (0.0, 0.0), (0.0, 1.0),
                0.55,
            ),
            g["clearance"], rtol=1e-7,
        )
        assert_allclose(
            OPERAND_REGISTRY["real_y_intercept_lcs"](
                system, Hx=0.0, Hy=0.7, Px=jnp.asarray([0.0]),
                Py=jnp.asarray([0.3]), wavelength=0.55, surface_number=2,
            ),
            g["y_lcs"], rtol=1e-8,
        )


class TestNewVariables:
    def test_grid_sag_variable_differentiable(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from optiland_tpu.optimization import OptimizationProblem
        from tests.test_adv_geometries import grid_lens

        lens = grid_lens()
        p = OptimizationProblem(lens)
        p.add_operand(
            "rms_spot_size", target=0.0,
            input_data={"optic": lens, "Hx": 0, "Hy": 0, "num_rays": 16,
                        "distribution": "hexapolar", "wavelength": 0.55},
        )
        p.add_variable(lens, "grid_sag", surface_number=1, row=17, col=17,
                       num_cols=34)
        g = jax.grad(p.merit_fn())(jnp.asarray(p.initial_x()))
        assert np.isfinite(np.asarray(g)).all()
        assert abs(float(g[0])) > 0

    def test_forbes_and_norm_radius_variables(self):
        import jax
        import jax.numpy as jnp
        import numpy as np

        from optiland_tpu.optimization import OptimizationProblem
        from tests.test_adv_geometries import qbfs_lens

        lens = qbfs_lens()
        p = OptimizationProblem(lens)
        p.add_operand(
            "rms_spot_size", target=0.0,
            input_data={"optic": lens, "Hx": 0, "Hy": 0, "num_rays": 16,
                        "distribution": "hexapolar", "wavelength": 0.55},
        )
        p.add_variable(lens, "forbes_qbfs_coeff", surface_number=1,
                       coeff_number=0)
        p.add_variable(lens, "norm_radius", surface_number=1)
        g = np.asarray(jax.grad(p.merit_fn())(jnp.asarray(p.initial_x())))
        assert np.isfinite(g).all() and (np.abs(g) > 1e-10).all()

    def test_index_variable_optimizes(self):
        import numpy as np

        from optiland_tpu.materials import IdealMaterial
        from optiland_tpu.optic import Optic
        from optiland_tpu.optimization import (
            OptimizationProblem,
            OptimizerGeneric,
        )

        o = Optic()
        o.surfaces.add(index=0, radius=np.inf, thickness=np.inf)
        o.surfaces.add(index=1, radius=40.0, thickness=5.0,
                       material=IdealMaterial(1.5), is_stop=True)
        o.surfaces.add(index=2, radius=-40.0, thickness=30.0)
        o.surfaces.add(index=3)
        o.set_aperture("EPD", 8.0)
        o.fields.set_type("angle")
        o.fields.add(y=0)
        o.wavelengths.add(0.55, is_primary=True)
        p = OptimizationProblem(o)
        p.add_operand("f2", target=35.0)
        p.add_variable(o, "index", surface_number=1)
        res = OptimizerGeneric(p).optimize(maxiter=50)
        assert float(res.fun) < 1e-10

    def test_index_variable_rejects_catalog_glass(self):
        import pytest

        from optiland_tpu.optimization import OptimizationProblem
        from optiland_tpu.samples import CookeTriplet

        lens = CookeTriplet()
        p = OptimizationProblem(lens)
        p.add_operand("f2", target=52.0)
        p.add_variable(lens, "index", surface_number=1)
        with pytest.raises(ValueError, match="constant-index"):
            p.sum_squared()


def test_orthogonal_descent_converges_on_cooke():
    """OrthogonalDescent reduces the Cooke merit (VERDICT r1 item 7;
    reference: optimizer/scipy/orthogonal_descent.py:21)."""
    from optiland_tpu.optimization import OrthogonalDescent

    lens = _perturbed_cooke()
    problem = _spot_problem(lens)
    problem.add_variable(lens, "radius", surface_number=1)
    problem.add_variable(lens, "radius", surface_number=2)
    initial = float(problem.sum_squared())
    res = OrthogonalDescent(problem).optimize(max_iter=10, tol=1e-8)
    assert res.fun < initial / 10


@pytest.mark.slow
def test_optimizer_undo_restores_variables():
    lens = _perturbed_cooke()
    problem = _spot_problem(lens)
    problem.add_variable(lens, "radius", surface_number=1)
    r_before = float(lens.surfaces.surfaces[1].radius)
    opt = LeastSquares(problem)
    opt.optimize()
    assert lens.surfaces.surfaces[1].radius != pytest.approx(r_before)
    opt.undo()
    assert lens.surfaces.surfaces[1].radius == pytest.approx(r_before, rel=1e-9)


def test_problem_info_tables():
    """Reporting tables (reference: problem.py:222-363)."""
    lens = _perturbed_cooke()
    problem = _spot_problem(lens, max_fields=2)  # compile scales w/ operands
    problem.add_variable(lens, "radius", surface_number=1, min_val=10.0)
    merit_df, op_df, var_df = problem.info(show=False)
    assert len(op_df) == len(problem.operands)
    assert abs(op_df["Contrib. [%]"].sum() - 100.0) < 0.2
    assert list(var_df["Variable Type"]) == ["radius"]
    assert var_df["Value"][0] == pytest.approx(25.0)
    assert float(merit_df["Merit Function Value"][0]) == pytest.approx(
        float(problem.sum_squared())
    )


@pytest.mark.slow
def test_generic_variable_behavior():
    """User-defined get/set variable (reference: variable/torch.py analog)."""
    import jax.numpy as jnp

    lens = _perturbed_cooke()
    problem = _spot_problem(lens)
    problem.add_variable(
        lens, "generic",
        getter=lambda system: system.stack.radius[1],
        setter=lambda system, v: system.replace(
            stack=system.stack.replace(
                radius=system.stack.radius.at[1].set(v)
            )
        ),
    )
    initial = float(problem.sum_squared())
    res = OptimizerGeneric(problem).optimize(maxiter=40)
    assert res.fun < initial


@pytest.mark.slow
def test_tilt_variable_opens_tilt_gate():
    """A tilt variable on an untilted system must affect the trace: the
    static has_tilts gate is forced open by the problem (regression)."""
    import jax.numpy as jnp

    from optiland_tpu.optimization.problem import OptimizationProblem

    lens = CookeTriplet()
    problem = OptimizationProblem(lens)
    problem.add_variable(lens, "tilt", surface_number=2, axis="x")
    problem.add_operand(
        "rms_spot_size",
        target=0.0,
        input_data={
            "optic": lens, "Hx": 0.0, "Hy": 0.7,
            "num_rays": 24, "wavelength": 0.55, "distribution": "hexapolar",
        },
    )
    assert problem._base_system().cfg.has_tilts
    g = problem._build()["grad"](jnp.asarray(problem.initial_x()))
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0
