"""Optimizers: optax gradient loops and SciPy wrappers with exact JAX jacobians.

Replaces the reference's optimizer stack (reference:
optiland/optimization/optimizer/scipy/*.py with finite-difference
gradients, and optimizer/torch/*.py with torch autograd): every method
here receives exact gradients/jacobians from jax.value_and_grad /
jax.jacrev of the jitted merit function.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class OptimizationResult:
    def __init__(self, x, fun, nit=None, success=True, message="", history=None):
        self.x = np.asarray(x)
        self.fun = float(fun)
        self.nit = nit
        self.success = success
        self.message = message
        self.history = history or []

    def __repr__(self):
        return f"OptimizationResult(fun={self.fun:.6g}, nit={self.nit})"


class OptimizerGeneric:
    """scipy.optimize.minimize with exact JAX gradient
    (reference: optimizer/scipy/base.py:25)."""

    method = None

    def __init__(self, problem):
        self.problem = problem
        # pre-optimization variable vectors, for undo()
        # (reference: optimizer/scipy/base.py:44-45)
        self._x_history: list = []

    def undo(self):
        """Restore the variable vector from before the last optimize()
        (reference: optimizer/scipy/base.py:44-45 '_x' history)."""
        if self._x_history:
            self.problem.update_optic(self._x_history.pop())

    def _x0(self):
        """Initial scaled vector, recorded for undo()."""
        x0 = self.problem.initial_x()
        self._x_history.append(np.asarray(x0, float).copy())
        return x0

    def optimize(self, maxiter: int = 1000, tol: float | None = None,
                 disp: bool = False, apply: bool = True, **kwargs):
        from scipy import optimize as sciopt

        vg = self.problem.value_and_grad_fn()

        def fun(x):
            v, g = vg(jnp.asarray(x))
            return float(v), np.asarray(g, dtype=float)

        x0 = self._x0()
        res = sciopt.minimize(
            fun, x0, jac=True, method=self.method,
            options={"maxiter": maxiter, "disp": disp}, tol=tol, **kwargs
        )
        if apply:
            self.problem.update_optic(res.x)
        return OptimizationResult(
            res.x, res.fun, nit=getattr(res, "nit", None),
            success=res.success, message=str(res.message),
        )


class LeastSquares(OptimizerGeneric):
    """scipy.optimize.least_squares with exact JAX jacobian
    (reference: optimizer/scipy/least_squares.py:15)."""

    def optimize(self, maxiter: int = 1000, disp: bool = False,
                 apply: bool = True, **kwargs):
        from scipy import optimize as sciopt

        res_fn = self.problem.residuals_fn()
        jac_fn = self.problem.res_jac_fn()
        x0 = self._x0()
        res = sciopt.least_squares(
            lambda x: np.asarray(res_fn(jnp.asarray(x)), dtype=float),
            x0,
            jac=lambda x: np.asarray(jac_fn(jnp.asarray(x)), dtype=float),
            max_nfev=maxiter,
            verbose=2 if disp else 0,
            **kwargs,
        )
        if apply:
            self.problem.update_optic(res.x)
        return OptimizationResult(
            res.x, float(np.sum(res.fun**2)), nit=res.nfev,
            success=res.success, message=str(res.message),
        )


class DualAnnealing(OptimizerGeneric):
    """Global annealing search (reference: optimizer/scipy/dual_annealing.py)."""

    def optimize(self, bounds=None, maxiter: int = 1000, apply: bool = True,
                 seed=None, **kwargs):
        from scipy import optimize as sciopt

        merit = self.problem.merit_fn()
        x0 = self._x0()
        if bounds is None:
            bounds = [(x - 10.0, x + 10.0) for x in x0]
        res = sciopt.dual_annealing(
            lambda x: float(merit(jnp.asarray(x))), bounds,
            maxiter=maxiter, x0=x0, seed=seed, **kwargs
        )
        if apply:
            self.problem.update_optic(res.x)
        return OptimizationResult(res.x, res.fun, nit=res.nit,
                                  success=res.success, message=str(res.message))


class DifferentialEvolution(OptimizerGeneric):
    """Population-based global search
    (reference: optimizer/scipy/differential_evolution.py)."""

    def optimize(self, bounds=None, maxiter: int = 1000, workers: int = 1,
                 apply: bool = True, seed=None, **kwargs):
        from scipy import optimize as sciopt

        merit = self.problem.merit_fn()
        x0 = self._x0()
        if bounds is None:
            bounds = [(x - 10.0, x + 10.0) for x in x0]
        res = sciopt.differential_evolution(
            lambda x: float(merit(jnp.asarray(x))), bounds,
            maxiter=maxiter, x0=x0, seed=seed, **kwargs
        )
        if apply:
            self.problem.update_optic(res.x)
        return OptimizationResult(res.x, res.fun, nit=res.nit,
                                  success=res.success, message=str(res.message))


class BasinHopping(OptimizerGeneric):
    """Basin-hopping global search (reference: optimizer/scipy/basin_hopping.py)."""

    def optimize(self, niter: int = 100, apply: bool = True, seed=None, **kwargs):
        from scipy import optimize as sciopt

        vg = self.problem.value_and_grad_fn()

        def fun(x):
            v, g = vg(jnp.asarray(x))
            return float(v), np.asarray(g, dtype=float)

        x0 = self._x0()
        res = sciopt.basinhopping(
            fun, x0, niter=niter, seed=seed,
            minimizer_kwargs={"jac": True}, **kwargs
        )
        if apply:
            self.problem.update_optic(res.x)
        return OptimizationResult(res.x, res.fun, nit=res.nit,
                                  success=True, message=str(res.message))


class SHGO(OptimizerGeneric):
    """Simplicial homology global optimization
    (reference: optimizer/scipy/shgo.py)."""

    def optimize(self, bounds=None, apply: bool = True, **kwargs):
        from scipy import optimize as sciopt

        merit = self.problem.merit_fn()
        x0 = self._x0()
        if bounds is None:
            bounds = [(x - 10.0, x + 10.0) for x in x0]
        res = sciopt.shgo(lambda x: float(merit(jnp.asarray(x))), bounds, **kwargs)
        if apply:
            self.problem.update_optic(res.x)
        return OptimizationResult(res.x, res.fun, nit=getattr(res, "nit", None),
                                  success=res.success, message=str(res.message))


class OrthogonalDescent(OptimizerGeneric):
    """Coordinate (orthogonal) descent: sequential 1-D line searches
    (reference: optimizer/scipy/orthogonal_descent.py:21-130).

    Each cycle Brent-minimizes the jitted merit over one scaled variable at
    a time, keeping a step only when it improves; converges when the
    relative merit change over a full cycle drops below ``tol``. Useful
    when gradients are unreliable (e.g. through discontinuous vignetting).
    """

    def optimize(self, max_iter: int = 100, tol: float = 1e-4,
                 apply: bool = True, **kwargs):
        from scipy.optimize import minimize_scalar

        merit = self.problem.merit_fn()
        x = np.asarray(self._x0(), float)
        current = float(merit(jnp.asarray(x)))
        nit = 0
        for _cycle in range(max_iter):
            prev = current
            for i, var in enumerate(self.problem.variables):
                xi0 = x[i]
                f0 = float(merit(jnp.asarray(x)))
                lo = -1e12 if var.min_val is None else var.min_val
                hi = 1e12 if var.max_val is None else var.max_val

                def fline(v, i=i, lo=lo, hi=hi):
                    if v < lo or v > hi or not np.isfinite(v):
                        return 1e20
                    trial = x.copy()
                    trial[i] = v
                    out = float(merit(jnp.asarray(trial)))
                    return out if np.isfinite(out) else 1e20

                step = max(abs(xi0) * 0.05, 0.1)
                res = minimize_scalar(
                    fline, bracket=(xi0 - step, xi0 + step),
                    method="brent", options={"xtol": 1e-5},
                )
                if res.fun < f0:
                    x[i] = res.x
            current = float(merit(jnp.asarray(x)))
            nit += 1
            if abs(prev - current) / (abs(prev) + 1e-10) < tol:
                break
        if apply:
            self.problem.update_optic(x)
        return OptimizationResult(
            jnp.asarray(x), current, nit=nit, success=True,
            message="orthogonal descent converged",
        )


class OptaxOptimizer:
    """Gradient-descent loop on the scaled variable vector via optax.

    The TPU-native analog of the reference's torch Adam/SGD optimizers
    (reference: optimizer/torch/base.py:35, adam.py:23, sgd.py:23): one
    jitted update step, exact gradients, optional cosine/exponential decay.
    """

    def __init__(self, problem, optimizer=None):
        import optax

        self.problem = problem
        self.optax = optax
        self.optimizer = optimizer

    def optimize(self, n_steps: int = 200, lr: float = 1e-2,
                 apply: bool = True, callback=None):
        import optax

        opt = self.optimizer or optax.adam(lr)
        vg = self.problem.value_and_grad_fn()

        @jax.jit
        def step(x, opt_state):
            v, g = vg(x)
            updates, opt_state = opt.update(g, opt_state, x)
            return optax.apply_updates(x, updates), opt_state, v

        x = jnp.asarray(self.problem.initial_x())
        opt_state = opt.init(x)
        history = []
        best_x, best_v = x, jnp.inf
        for i in range(n_steps):
            x, opt_state, v = step(x, opt_state)
            history.append(float(v))
            if v < best_v:
                best_v, best_x = v, x
            if callback is not None:
                callback(i, float(v))
        final_v = float(self.problem.merit_fn()(x))
        if final_v <= best_v:
            best_x, best_v = x, final_v
        if apply:
            self.problem.update_optic(best_x)
        return OptimizationResult(best_x, best_v, nit=n_steps, history=history)


class TorchAdamOptimizer(OptaxOptimizer):
    """API-compatibility alias: Adam loop (reference: optimizer/torch/adam.py)."""

    def optimize(self, n_steps: int = 200, lr: float = 1e-2, **kwargs):
        import optax

        self.optimizer = optax.adam(lr)
        return super().optimize(n_steps=n_steps, lr=lr, **kwargs)


class TorchSGDOptimizer(OptaxOptimizer):
    """API-compatibility alias: SGD loop (reference: optimizer/torch/sgd.py)."""

    def optimize(self, n_steps: int = 200, lr: float = 1e-3, momentum: float = 0.9,
                 **kwargs):
        import optax

        self.optimizer = optax.sgd(lr, momentum=momentum)
        return super().optimize(n_steps=n_steps, lr=lr, **kwargs)


class GlassExpert(OptimizerGeneric):
    """Greedy nearest-neighbour categorical glass search with continuous
    refinement, after CODE V's Glass Expert
    (reference: optimization/optimizer/scipy/glass_expert.py:39-290).

    Glass variables (problem.glass_variables) are substituted candidate by
    candidate; each candidate is scored by a continuous local optimization
    of the remaining variables, keeping improvements and rolling back
    regressions. A global K-Means-downsampled catalogue pass precedes the
    nearest-neighbour pass; a final continuous polish ends the run.
    """

    def __init__(self, problem):
        super().__init__(problem)
        self.verbose = True
        self.plot_glass_map = False
        self.opt_params: dict = {}
        self._nd_vd_cache: dict = {}

    def vprint(self, *args, **kwargs):
        if self.verbose:
            print(*args, **kwargs)

    def _get_nd_vd(self, glasses):
        from optiland_tpu.materials.glass_utils import get_nd_vd

        for g in glasses:
            if g not in self._nd_vd_cache:
                self._nd_vd_cache[g] = get_nd_vd(g)
        return {g: self._nd_vd_cache[g] for g in glasses}

    def _continuous_optimize(self):
        res = self.optimize(apply=True, **self.opt_params)
        return res

    def global_exploration(self, glass_variables, pool_size: int):
        from optiland_tpu.materials.glass_utils import downsample_glass_map

        if glass_variables:
            self.vprint(f"\n{'-' * 70}\nGlobal exploration\n")
        for variable in glass_variables:
            self.vprint(f"Selecting {variable}:")
            glass_dict = self._get_nd_vd(variable.glass_selection)
            glass_dict = downsample_glass_map(
                glass_dict, num_glasses_to_keep=pool_size
            )
            self.explore_glasses(glass_variables, variable,
                                 list(glass_dict.keys()))

    def local_exploration(self, glass_variables, num_neighbours: int):
        from optiland_tpu.materials.glass_utils import get_neighbour_glasses

        if glass_variables:
            self.vprint(f"\n{'-' * 70}\nLocal exploration\n")
        for variable in glass_variables:
            self.vprint(f"Selecting {variable}:")
            glass_dict = self._get_nd_vd(variable.glass_selection)
            neighbours = get_neighbour_glasses(
                glass=variable.value, glass_dict=glass_dict,
                num_neighbours=num_neighbours, plot=self.plot_glass_map,
            )
            self.explore_glasses(glass_variables, variable, neighbours)

    def _snapshot(self):
        import copy

        return copy.deepcopy(self.problem.optic.surfaces.surfaces)

    def _restore(self, snap):
        import copy

        self.problem.optic.surfaces.surfaces[:] = copy.deepcopy(snap)
        self.problem.optic._invalidate()

    def explore_glasses(self, glass_variables, current_glass_variable,
                        glasses):
        snap_init = self._snapshot()
        current_glass = current_glass_variable.value
        best_glass = current_glass
        best_error = float(self.problem.sum_squared())
        best_error_init = best_error
        best_snap = snap_init
        for candidate in glasses:
            self.vprint(
                f"\tTrying {candidate:<8} as {current_glass_variable}. ",
                end="",
            )
            self._restore(snap_init)
            current_glass_variable.update(candidate)
            result = self._continuous_optimize()
            error = float(result.fun)
            self.vprint(f"Error function value: {error:.4g}")
            if error < best_error:
                best_error = error
                best_glass = candidate
                best_snap = self._snapshot()
        self._restore(best_snap)
        if best_glass != current_glass and best_error < best_error_init:
            self.vprint(
                f"\t-> Selected {best_glass} as {current_glass_variable}."
            )
        else:
            self.vprint(f"\tNo better glass found, keeping {current_glass}.")
        self.vprint(f"\tBest error function value: {best_error:.4g}\n")

    def run(self, num_neighbours: int = 7, maxiter: int = 1000,
            tol: float = 1e-3, disp: bool = False, verbose: bool = True,
            plot_glass_map: bool = False):
        self.verbose = verbose
        self.plot_glass_map = plot_glass_map
        self.opt_params = dict(maxiter=maxiter, tol=tol, disp=disp)
        glass_variables = self.problem.glass_variables
        if not glass_variables:
            self.vprint("No glass variables - skipping GlassExpert.")
        else:
            self.vprint(
                "Initial glasses combination: "
                f"{[v.value for v in glass_variables]}"
            )
        self.global_exploration(glass_variables, pool_size=num_neighbours)
        self.local_exploration(glass_variables, num_neighbours=num_neighbours)
        return self._continuous_optimize()
