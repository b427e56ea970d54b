"""Tolerancing: perturbations, compensators, sensitivity, Monte-Carlo.

Functional design mirroring the reference
(reference: optiland/tolerancing/core.py:18-70, perturbation.py:19-137,
compensator.py:15, sensitivity_analysis.py:28, monte_carlo.py:31-249).
Perturbations write into the Optic builder, the compensator re-optimizes
the compensating variables with exact JAX gradients, and operands evaluate
on the recompiled system.
"""

from __future__ import annotations

import numpy as np

from optiland_tpu.optimization.operands import Operand
from optiland_tpu.optimization.problem import OptimizationProblem
from optiland_tpu.optimization.variables import Variable


class BaseSampler:
    size: int | None = None

    def sample(self):
        raise NotImplementedError


class ScalarSampler(BaseSampler):
    """Always returns a fixed value (reference: perturbation.py:13-37)."""

    def __init__(self, value):
        self.value = value
        self.size = 1

    def sample(self):
        return self.value


class RangeSampler(BaseSampler):
    """Steps through a linspace on successive calls
    (reference: perturbation.py:40-71)."""

    def __init__(self, start, end, steps):
        self.values = np.linspace(start, end, steps)
        self.index = 0
        self.size = steps

    def sample(self):
        value = self.values[self.index % len(self.values)]
        self.index += 1
        return float(value)


class DistributionSampler(BaseSampler):
    """Random sampling from normal/uniform distributions
    (reference: perturbation.py:74-117)."""

    def __init__(self, distribution: str, seed=None, **params):
        self.distribution = distribution
        self.params = params
        self.rng = np.random.default_rng(seed)

    def sample(self):
        if self.distribution == "normal":
            return float(
                self.rng.normal(
                    self.params.get("loc", 0.0), self.params.get("scale", 1.0)
                )
            )
        if self.distribution == "uniform":
            return float(
                self.rng.uniform(
                    self.params.get("low", 0.0), self.params.get("high", 1.0)
                )
            )
        raise ValueError(f"Unknown distribution {self.distribution!r}")


class Perturbation:
    """A sampled perturbation applied to one system variable
    (reference: perturbation.py:119-137)."""

    def __init__(self, optic, variable_type: str, sampler: BaseSampler, **kwargs):
        self.optic = optic
        self.type = variable_type
        self.sampler = sampler
        self.variable = Variable(
            optic, variable_type,
            scaler=None, **kwargs,
        )
        # Perturbations write raw (unscaled) values
        from optiland_tpu.optimization.scaling import IdentityScaler

        self.variable.scaler = IdentityScaler()
        self.value = None

    def apply(self):
        """Draw a sample and write it into the optic builder."""
        self.value = self.sampler.sample()
        system = self.variable.apply(self.optic.system, self.value)
        _write_back(self.optic, system)


def _write_back(optic, system):
    """Write compiled-system values back into the Optic builder."""
    surfs = optic.surfaces.surfaces
    radius = np.asarray(system.stack.radius)
    conic = np.asarray(system.stack.conic)
    thickness = np.asarray(system.stack.thickness)
    coeffs = np.asarray(system.stack.coeffs)
    tilt_x = np.asarray(system.stack.rx)
    tilt_y = np.asarray(system.stack.ry)
    dec_x = np.asarray(system.stack.dx)
    dec_y = np.asarray(system.stack.dy)
    for i, s in enumerate(surfs):
        s.radius = float(radius[i]) if np.isfinite(radius[i]) else np.inf
        s.conic = float(conic[i])
        s.thickness = float(thickness[i]) if np.isfinite(thickness[i]) else np.inf
        s.rx, s.ry = float(tilt_x[i]), float(tilt_y[i])
        s.dx, s.dy = float(dec_x[i]), float(dec_y[i])
        if s.coefficients:
            s.coefficients = tuple(coeffs[i, : len(s.coefficients)])
    optic._invalidate()


class CompensatorOptimizer:
    """Re-optimizes compensating variables after perturbation
    (reference: tolerancing/compensator.py:15)."""

    def __init__(self, method: str = "generic", tol: float = 1e-5):
        self.method = method
        self.tol = tol
        self.variables: list[dict] = []

    def add_variable(self, optic, variable_type: str, **kwargs):
        self.variables.append(
            {"optic": optic, "type": variable_type, "kwargs": kwargs}
        )

    @property
    def has_variables(self):
        return len(self.variables) > 0

    def run(self, operands):
        from optiland_tpu.optimization.optimizers import OptimizerGeneric

        problem = OptimizationProblem()
        for op in operands:
            problem.operands.append(op)
        for v in self.variables:
            problem.add_variable(v["optic"], v["type"], **v["kwargs"])
        if problem.optic is None:
            problem.optic = self.variables[0]["optic"]
        result = OptimizerGeneric(problem).optimize(maxiter=50, tol=self.tol)
        return result


class Tolerancing:
    """Core tolerancing problem (reference: tolerancing/core.py:18)."""

    def __init__(self, optic, method: str = "generic", tol: float = 1e-5):
        import copy

        self.optic = optic
        self.method = method
        self.tol = tol
        self.operands: list[Operand] = []
        self.perturbations: list[Perturbation] = []
        self.compensator = CompensatorOptimizer(method=method, tol=tol)
        self._nominal = copy.deepcopy(
            [copy.copy(s) for s in optic.surfaces.surfaces]
        )

    def add_operand(self, operand_type: str, input_data: dict | None = None,
                    target=None, weight: float = 1.0, min_val=None, max_val=None):
        data = dict(input_data or {})
        data.setdefault("optic", self.optic)
        op = Operand(operand_type, target, min_val, max_val, weight, data)
        if op.target is None and op.min_val is None and op.max_val is None:
            op.target = float(op.value(self.optic.system))
        self.operands.append(op)
        return op

    def add_perturbation(self, variable_type: str, perturbation: BaseSampler,
                         **kwargs):
        self.perturbations.append(
            Perturbation(self.optic, variable_type, perturbation, **kwargs)
        )

    def add_compensator(self, variable_type: str, **kwargs):
        self.compensator.add_variable(self.optic, variable_type, **kwargs)

    def apply_compensators(self):
        if self.compensator.has_variables:
            return self.compensator.run(self.operands)
        return None

    def evaluate(self):
        system = self.optic.system
        return [float(np.ravel(np.asarray(op.value(system)))[0]
                      if np.size(np.asarray(op.value(system))) == 1
                      else np.mean(np.asarray(op.value(system))))
                for op in self.operands]

    def reset(self):
        """Restore the optic to its nominal prescription."""
        import copy

        self.optic.surfaces.surfaces = [copy.copy(s) for s in self._nominal]
        self.optic._invalidate()


class SensitivityAnalysis:
    """Per-perturbation operand sensitivity sweep
    (reference: tolerancing/sensitivity_analysis.py:28)."""

    def __init__(self, tolerancing: Tolerancing):
        self.tolerancing = tolerancing
        self.data = None

    def run(self):
        rows = []
        t = self.tolerancing
        for pert in t.perturbations:
            steps = pert.sampler.size or 1
            for _ in range(steps):
                t.reset()
                pert.apply()
                t.apply_compensators()
                values = t.evaluate()
                rows.append(
                    {
                        "perturbation_type": pert.type,
                        "value": pert.value,
                        "operands": values,
                    }
                )
        t.reset()
        self.data = rows
        return rows


class MonteCarlo:
    """Monte-Carlo tolerancing (reference: tolerancing/monte_carlo.py:31)."""

    def __init__(self, tolerancing: Tolerancing):
        self.tolerancing = tolerancing
        self.results = None

    def run(self, num_iterations: int = 100):
        t = self.tolerancing
        rows = []
        for _ in range(num_iterations):
            t.reset()
            for pert in t.perturbations:
                pert.apply()
            t.apply_compensators()
            rows.append(
                {
                    "perturbations": [p.value for p in t.perturbations],
                    "operands": t.evaluate(),
                }
            )
        t.reset()
        arr = np.asarray([r["operands"] for r in rows])
        self.results = {
            "rows": rows,
            "operand_values": arr,
            "mean": arr.mean(axis=0),
            "std": arr.std(axis=0),
        }
        return self.results

    def view_histogram(self, operand_index: int = 0, bins: int = 20, ax=None):
        import matplotlib.pyplot as plt

        if ax is None:
            fig, ax = plt.subplots()
        else:
            fig = ax.figure
        ax.hist(self.results["operand_values"][:, operand_index], bins=bins)
        ax.set_xlabel("Operand value")
        ax.set_ylabel("Count")
        return fig, ax

    def view_cdf(self, operand_index: int = 0, ax=None):
        import matplotlib.pyplot as plt

        if ax is None:
            fig, ax = plt.subplots()
        else:
            fig = ax.figure
        vals = np.sort(self.results["operand_values"][:, operand_index])
        ax.plot(vals, np.linspace(0, 1, len(vals)))
        ax.set_xlabel("Operand value")
        ax.set_ylabel("Cumulative probability")
        return fig, ax
