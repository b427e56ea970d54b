"""Optimization problem: operands + variables -> jitted merit function.

The reference's OptimizationProblem mutates the optic on every evaluation
(reference: optiland/optimization/problem.py:27-367). Here the problem
compiles to a pure scalar function of the optimizer vector: variables map
x into an updated system pytree, operands evaluate on it, and
jax.value_and_grad supplies exact gradients — replacing both the
reference's finite-difference SciPy path and its torch autograd path. The
reference's BatchedRayEvaluator (batched_evaluator.py:277+) is unnecessary:
XLA fuses all operand traces in one compiled program by construction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from optiland_tpu.optimization.operands import Operand
from optiland_tpu.optimization.variables import Variable


class OptimizationProblem:
    """A merit function built from operands and variables."""

    def __init__(self, optic=None):
        self.optic = optic
        self.operands: list[Operand] = []
        self.variables: list[Variable] = []
        self.glass_variables = []  # categorical MaterialVariables
        self._fns = None

    def add_operand(
        self,
        operand_type: str,
        target=None,
        min_val=None,
        max_val=None,
        weight: float = 1.0,
        input_data: dict | None = None,
    ):
        """Add one merit-function term (reference: problem.py:71+)."""
        if input_data and "optic" in input_data and self.optic is None:
            self.optic = input_data["optic"]
        op = Operand(operand_type, target, min_val, max_val, weight, input_data)
        if op.target is None and op.min_val is None and op.max_val is None:
            # Default target = current value (reference: operand.py:200-202)
            op.target = float(op.value(self._base_system()))
        self.operands.append(op)
        self._fns = None
        return op

    def add_variable(self, optic, var_type: str, **kwargs):
        """Add one optimization variable (reference: problem.py:100+).

        var_type "material" adds a categorical MaterialVariable (consumed by
        GlassExpert), not a continuous vector entry."""
        if self.optic is None:
            self.optic = optic
        if var_type == "material":
            from optiland_tpu.optimization.variables import MaterialVariable

            self.glass_variables.append(MaterialVariable(optic, **kwargs))
        else:
            self.variables.append(Variable(optic, var_type, **kwargs))
        self._fns = None

    def clear_operands(self):
        self.operands = []
        self._fns = None

    def clear_variables(self):
        self.variables = []
        self._fns = None

    # ------------------------------------------------------------------

    def _base_system(self):
        system = self.optic.system
        # Rotation work in the trace is statically gated by cfg.has_tilts
        # (set at build time from concrete tilt values). A tilt variable on
        # an as-yet-untilted system must force the gate open, else updates
        # and gradients through rx/ry/rz would be silently dropped.
        if not system.cfg.has_tilts:
            from optiland_tpu.optimization.variables import TiltVariable

            if any(
                isinstance(v.behavior, TiltVariable) for v in self.variables
            ):
                import dataclasses

                system = system.replace(
                    cfg=dataclasses.replace(system.cfg, has_tilts=True)
                )
        return system

    def apply_variables(self, system, x):
        """Pure function mapping optimizer vector x into a system."""
        for i, var in enumerate(self.variables):
            system = var.apply(system, x[i])
        return system

    def initial_x(self) -> np.ndarray:
        system = self._base_system()
        return np.array(
            [v.initial_scaled_value(system) for v in self.variables]
        )

    def _build(self):
        if self._fns is not None:
            return self._fns

        # The jitted kernels take the base system as a pytree argument, so
        # categorical mutations of the optic (e.g. GlassExpert substituting
        # same-formula glasses) reuse the same compiled executable.
        def merit(base, x):
            system = self.apply_variables(base, x)
            total = 0.0
            for op in self.operands:
                total = total + op.fun(system)
            return total

        def residuals(base, x):
            system = self.apply_variables(base, x)
            return jnp.stack(
                [jnp.sqrt(op.effective_weight()) * op.delta(system)
                 for op in self.operands]
            )

        # Lazy per-entry jit: each optimizer family touches only a subset
        # (LeastSquares: residuals+jacobian; scipy/optax: value_and_grad),
        # and tracing+compiling the unrolled f64 merit costs tens of seconds
        # on CPU — don't pay it five times up front.
        builders = {
            "merit": lambda: jax.jit(merit),
            "grad": lambda: jax.jit(jax.grad(merit, argnums=1)),
            "value_and_grad": lambda: jax.jit(
                jax.value_and_grad(merit, argnums=1)
            ),
            "residuals": lambda: jax.jit(residuals),
            # Forward-mode: the variable vector is short (a lens has tens of
            # free parameters) while operands can be many, so n_vars JVPs
            # beat n_ops VJPs — and the jvp graph compiles much faster than
            # the transposed trace.
            "res_jac": lambda: jax.jit(jax.jacfwd(residuals, argnums=1)),
        }

        class _LazyFns(dict):
            def __missing__(inner, key):
                fn = builders[key]()
                inner[key] = lambda x, _fn=fn: _fn(self._base_system(), x)
                return inner[key]

        self._fns = _LazyFns()
        return self._fns

    # Reference-compatible evaluation API ------------------------------

    def fun_array(self, x=None):
        x = self.initial_x() if x is None else x
        system = self.apply_variables(self._base_system(), jnp.asarray(x))
        return jnp.stack([op.fun(system) for op in self.operands])

    def sum_squared(self, x=None):
        """Merit value: sum of weighted squared deltas
        (reference: problem.py:199-208)."""
        x = self.initial_x() if x is None else x
        return self._build()["merit"](jnp.asarray(x))

    def rss(self, x=None):
        return jnp.sqrt(self.sum_squared(x))

    def merit_fn(self):
        return self._build()["merit"]

    def value_and_grad_fn(self):
        return self._build()["value_and_grad"]

    def residuals_fn(self):
        return self._build()["residuals"]

    def res_jac_fn(self):
        return self._build()["res_jac"]

    def update_optic(self, x):
        """Write optimized values back into the Optic builder."""
        system = self.apply_variables(self._base_system(), jnp.asarray(x))
        surfs = self.optic.surfaces.surfaces
        stack = system.stack
        radius = np.asarray(stack.radius)
        conic = np.asarray(stack.conic)
        thickness = np.asarray(stack.thickness)
        coeffs = np.asarray(stack.coeffs)
        dx, dy, dz = (np.asarray(a) for a in (stack.dx, stack.dy, stack.dz))
        rx, ry, rz = (np.asarray(a) for a in (stack.rx, stack.ry, stack.rz))
        for i, s in enumerate(surfs):
            s.radius = float(radius[i]) if np.isfinite(radius[i]) else np.inf
            s.conic = float(conic[i])
            s.thickness = (
                float(thickness[i]) if np.isfinite(thickness[i]) else np.inf
            )
            if s.coefficients:
                s.coefficients = tuple(coeffs[i, : len(s.coefficients)])
            if s.coordinate_system is None:
                s.dx, s.dy, s.dz = float(dx[i]), float(dy[i]), float(dz[i])
                s.rx, s.ry, s.rz = float(rx[i]), float(ry[i]), float(rz[i])
        self.optic._invalidate()

    # Reporting tables (reference: problem.py:222-363) ------------------

    def operand_info(self, show: bool = True):
        """Operand table: type/target/bounds/weight/value/delta/contribution
        (reference: problem.py:222-266)."""
        import pandas as pd

        system = self._base_system()
        values = [float(op.value(system)) for op in self.operands]
        deltas = [float(op.delta(system)) for op in self.operands]
        contribs = [
            op.effective_weight() * d**2
            for op, d in zip(self.operands, deltas)
        ]
        total = sum(contribs)
        df = pd.DataFrame(
            {
                "Operand Type": [
                    op.operand_type.replace("_", " ") for op in self.operands
                ],
                "Target": [
                    f"{op.target:+.4g}" if op.target is not None else ""
                    for op in self.operands
                ],
                "Min. Bound": [
                    op.min_val if op.min_val is not None else ""
                    for op in self.operands
                ],
                "Max. Bound": [
                    op.max_val if op.max_val is not None else ""
                    for op in self.operands
                ],
                "Weight": [op.weight for op in self.operands],
                "Eff. Weight": [
                    op.effective_weight() for op in self.operands
                ],
                "Value": [f"{v:+.4g}" for v in values],
                "Delta": [f"{d:+.4g}" for d in deltas],
                "Contrib. [%]": [
                    round(c / total * 100, 2) if total else 0.0
                    for c in contribs
                ],
            }
        )
        if show:
            print(df.to_markdown(index=False))
        return df

    def variable_info(self, show: bool = True):
        """Variable table: type/surface/value/bounds
        (reference: problem.py:268-283)."""
        import pandas as pd

        system = self._base_system()
        df = pd.DataFrame(
            {
                "Variable Type": [v.var_type for v in self.variables],
                "Surface": [
                    getattr(v.behavior, "surface_number", "")
                    for v in self.variables
                ],
                "Value": [
                    float(v.behavior.get(system)) for v in self.variables
                ],
                "Min. Bound": [
                    v.min_val if v.min_val is not None else ""
                    for v in self.variables
                ],
                "Max. Bound": [
                    v.max_val if v.max_val is not None else ""
                    for v in self.variables
                ],
            }
        )
        if show:
            print(df.to_markdown(index=False))
        return df

    def merit_info(self, show: bool = True):
        """Current merit value summary (reference: problem.py:285-316)."""
        import pandas as pd

        value = float(self.sum_squared())
        df = pd.DataFrame({"Merit Function Value": [value]})
        if show:
            print(df.to_markdown(index=False))
        return df

    def info(self, show: bool = True):
        """Full report: merit + operands + variables
        (reference: problem.py:318-363)."""
        return (
            self.merit_info(show),
            self.operand_info(show),
            self.variable_info(show),
        )
