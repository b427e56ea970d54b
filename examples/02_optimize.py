"""Recover a perturbed Cooke triplet by RMS-spot optimization.

Run: python examples/02_optimize.py
(mirrors the reference's Tutorial_5 optimization workflow; exact JAX
gradients replace finite differences / torch autograd)
"""

import jax

jax.config.update("jax_platforms", "cpu")

from optiland_tpu.optimization import (
    LeastSquares,
    OptaxOptimizer,
    OptimizationProblem,
)
from optiland_tpu.samples import CookeTriplet


def build_problem(lens):
    problem = OptimizationProblem()
    for hx, hy in lens.fields.get_field_coords():
        problem.add_operand(
            operand_type="rms_spot_size",
            target=0,
            weight=1,
            input_data={
                "optic": lens, "Hx": hx, "Hy": hy,
                "num_rays": 5, "wavelength": 0.55,
                "distribution": "hexapolar",
            },
        )
    problem.add_operand(
        operand_type="f2", target=50.0, weight=10,
        input_data={"optic": lens},
    )
    # Optimize curvatures rather than radii: 1/R is well-scaled near a
    # flat, so the least-squares step cannot run away to R ~ 1e10 (the
    # classic degenerate branch of radius-parameterized spot merits).
    for snum in (1, 2, 4, 5):
        problem.add_variable(lens, "reciprocal_radius", surface_number=snum)
    return problem


def main():
    lens = CookeTriplet()
    # perturb two radii so there is something to recover
    lens.surfaces.surfaces[1].radius = 25.0
    lens.surfaces.surfaces[5].radius = -50.0
    lens._invalidate()

    problem = build_problem(lens)
    print("--- before ---")
    problem.info()

    result = LeastSquares(problem).optimize()
    print(f"\nscipy least_squares: merit {result.fun:.3e} "
          f"after {result.nit} evaluations")

    # polish with a jitted Adam loop (the torch-optimizer analog)
    adam = OptaxOptimizer(problem)
    result2 = adam.optimize(n_steps=100, lr=1e-3)
    print(f"optax adam polish:   merit {result2.fun:.3e}")

    print("--- after ---")
    problem.info()


if __name__ == "__main__":
    main()
