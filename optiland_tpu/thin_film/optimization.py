"""Thin-film coating optimization: spectral operands, thickness variables,
gradient optimization, and needle synthesis.

The reference builds a SciPy loop with finite differences
(reference: optiland/thin_film/optimization/optimizer.py:68,
operand/core.py:26-455, variable/layer_thickness.py:20, needle.py:45-82).
Here the merit is a jitted function of the thickness vector with exact
gradients; needle synthesis evaluates candidate insertions by merit
improvement.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class LayerThicknessVariable:
    """One optimizable layer thickness with bounds
    (reference: thin_film/optimization/variable/layer_thickness.py:20)."""

    def __init__(self, layer_index: int, min_um: float = 1e-4,
                 max_um: float = 2.0):
        self.layer_index = layer_index
        self.min_um = min_um
        self.max_um = max_um


class SpectralOperand:
    """One merit term: a quantity (R/T/A) at wavelength/angle vs a target."""

    def __init__(self, quantity: str, wavelength_nm, aoi_deg=0.0, pol="s",
                 target=0.0, weight=1.0):
        self.quantity = quantity
        self.wavelength_um = np.asarray(wavelength_nm, float) * 1e-3
        self.aoi_rad = np.deg2rad(np.asarray(aoi_deg, float))
        self.pol = pol
        self.target = np.asarray(target, float)
        self.weight = weight

    def delta(self, stack, thicknesses):
        idx = {"R": 2, "T": 3, "A": 4}[self.quantity]
        val = stack.compute_rtRTA(
            self.wavelength_um, self.aoi_rad, self.pol, thicknesses=thicknesses
        )[idx]
        return jnp.ravel(val - self.target)


class ThinFilmOptimizer:
    """Gradient coating optimizer with a fluent API
    (reference: thin_film/optimization/optimizer.py:68)."""

    def __init__(self, stack):
        self.stack = stack
        self.operands: list[SpectralOperand] = []
        self.variables: list[LayerThicknessVariable] = []

    def add_variable(self, layer_index: int, min_um: float = 1e-4,
                     max_um: float = 2.0):
        self.variables.append(LayerThicknessVariable(layer_index, min_um, max_um))
        return self

    def add_all_thickness_variables(self, min_um: float = 1e-4,
                                    max_um: float = 2.0):
        for i in range(len(self.stack.layers)):
            self.add_variable(i, min_um, max_um)
        return self

    def add_operand(self, quantity: str, wavelength_nm, aoi_deg=0.0, pol="s",
                    target=0.0, weight=1.0):
        self.operands.append(
            SpectralOperand(quantity, wavelength_nm, aoi_deg, pol, target, weight)
        )
        return self

    add_spectral_operand = add_operand

    def add_angular_operand(self, quantity: str, wavelength_nm, aoi_deg,
                            pol="s", target=0.0, weight=1.0):
        return self.add_operand(quantity, wavelength_nm, aoi_deg, pol, target, weight)

    # ------------------------------------------------------------------

    def _thickness_vector(self):
        return jnp.asarray([l.thickness_um for l in self.stack.layers])

    def _merit(self, d_var):
        d_full = self._thickness_vector()
        for i, var in enumerate(self.variables):
            d_full = d_full.at[var.layer_index].set(
                jnp.clip(d_var[i], var.min_um, var.max_um)
            )
        total = 0.0
        for op in self.operands:
            delta = op.delta(self.stack, d_full)
            total = total + op.weight * jnp.sum(delta**2)
        return total

    def sum_squared(self):
        x0 = jnp.asarray(
            [self.stack.layers[v.layer_index].thickness_um for v in self.variables]
        )
        return float(self._merit(x0))

    def rss(self):
        return float(np.sqrt(self.sum_squared()))

    def optimize(self, method: str = "L-BFGS-B", maxiter: int = 200,
                 apply: bool = True):
        """SciPy optimization with exact JAX gradient."""
        from scipy import optimize as sciopt

        vg = jax.jit(jax.value_and_grad(self._merit))
        x0 = np.asarray(
            [self.stack.layers[v.layer_index].thickness_um for v in self.variables]
        )

        def fun(x):
            v, g = vg(jnp.asarray(x))
            return float(v), np.asarray(g, float)

        bounds = [(v.min_um, v.max_um) for v in self.variables]
        res = sciopt.minimize(
            fun, x0, jac=True, method=method, bounds=bounds,
            options={"maxiter": maxiter},
        )
        if apply:
            for i, var in enumerate(self.variables):
                self.stack.layers[var.layer_index].thickness_um = float(
                    np.clip(res.x[i], var.min_um, var.max_um)
                )
        return res

    def get_current_performance(self):
        return {"merit": self.sum_squared(), "rss": self.rss()}


def needle_synthesis(
    optimizer: ThinFilmOptimizer,
    needle_material,
    needle_thickness_um: float = 0.005,
    num_positions: int = 20,
    max_needles: int = 5,
    reoptimize_iters: int = 100,
):
    """Needle insertion synthesis (reference:
    thin_film/optimization/needle.py): screen sampled positions with a
    thin trial needle (finite-difference estimate of the variational
    derivative), insert at the best position, reoptimize all thicknesses,
    and keep the insertion only if the *reoptimized* merit improves —
    otherwise roll back and try the next-best position. Rejected
    (layer, position) candidates are remembered and skipped, and the
    rejected set resets after each accepted needle (the stack geometry
    changed), matching the reference's rejected-set acceptance semantics
    (needle.py:382-456); acceptance is judged on the post-reoptimization
    merit (needle.py `merit_after`).
    """
    stack = optimizer.stack
    history = [optimizer.sum_squared()]
    rejected: set = set()
    for _ in range(max_needles):
        base_merit = optimizer.sum_squared()
        total_d = sum(l.thickness_um for l in stack.layers)
        if total_d <= 0 or not stack.layers:
            break
        candidates = []
        for frac in np.linspace(0.05, 0.95, num_positions):
            depth = frac * total_d
            # locate the layer containing this depth
            z = 0.0
            for li, layer in enumerate(stack.layers):
                if z + layer.thickness_um >= depth:
                    pos_frac = (depth - z) / max(layer.thickness_um, 1e-12)
                    if (li, round(pos_frac, 9)) in rejected:
                        break
                    trial = stack.copy()
                    trial.split_layer(li, pos_frac)
                    trial.insert_layer(li + 1, needle_material, needle_thickness_um)
                    trial_opt = ThinFilmOptimizer(trial)
                    trial_opt.operands = optimizer.operands
                    trial_opt.add_all_thickness_variables()
                    merit = trial_opt.sum_squared()
                    candidates.append((merit, li, pos_frac))
                    break
                z += layer.thickness_um
        if not candidates:
            break
        # Insert the best screening candidate and reoptimize; acceptance
        # is judged on the reoptimized merit (rollback on regression, then
        # keep screening the remaining positions next iteration).
        _, li, pos_frac = min(candidates, key=lambda c: c[0])
        saved_stack = stack.copy()
        stack.split_layer(li, pos_frac)
        stack.insert_layer(li + 1, needle_material, needle_thickness_um)
        optimizer.variables = []
        optimizer.add_all_thickness_variables()
        optimizer.optimize(maxiter=reoptimize_iters)
        new_merit = optimizer.sum_squared()
        if new_merit >= base_merit - 1e-12:
            # rollback: restore layers from the saved copy and remember the
            # rejected candidate so other positions still get screened
            stack.layers = saved_stack.layers
            optimizer.variables = []
            optimizer.add_all_thickness_variables()
            rejected.add((li, round(pos_frac, 9)))
            continue
        rejected.clear()
        history.append(new_merit)
    return history
