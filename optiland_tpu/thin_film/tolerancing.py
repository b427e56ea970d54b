"""Thin-film tolerancing: perturbations, sensitivity, Monte-Carlo.

(reference: optiland/thin_film/tolerancing/*.py:18-35)
"""

from __future__ import annotations

import numpy as np


class ThinFilmPerturbation:
    """Perturb one layer's thickness by absolute or relative amounts."""

    def __init__(self, layer_index: int, delta_um: float | None = None,
                 relative: float | None = None):
        if (delta_um is None) == (relative is None):
            raise ValueError("Specify exactly one of delta_um or relative.")
        self.layer_index = layer_index
        self.delta_um = delta_um
        self.relative = relative

    def apply(self, stack, scale: float = 1.0):
        layer = stack.layers[self.layer_index]
        if self.delta_um is not None:
            layer.thickness_um += self.delta_um * scale
        else:
            layer.thickness_um *= 1.0 + self.relative * scale


class ThinFilmSensitivityAnalysis:
    """Per-layer sensitivity of a spectral metric to thickness changes."""

    def __init__(self, stack, metric_fn, delta_um: float = 1e-3):
        """metric_fn(stack) -> float scalar metric."""
        self.stack = stack
        self.metric_fn = metric_fn
        self.delta_um = delta_um

    def run(self):
        base = self.metric_fn(self.stack)
        sens = []
        for i in range(len(self.stack.layers)):
            trial = self.stack.copy()
            trial.layers[i].thickness_um += self.delta_um
            sens.append((self.metric_fn(trial) - base) / self.delta_um)
        return {"base": base, "sensitivity": np.asarray(sens)}


class ThinFilmMonteCarlo:
    """Monte-Carlo over random thickness errors."""

    def __init__(self, stack, metric_fn, sigma_relative: float = 0.02,
                 seed: int | None = None):
        self.stack = stack
        self.metric_fn = metric_fn
        self.sigma_relative = sigma_relative
        self.rng = np.random.default_rng(seed)

    def run(self, num_trials: int = 100):
        results = []
        for _ in range(num_trials):
            trial = self.stack.copy()
            for layer in trial.layers:
                layer.thickness_um *= 1.0 + self.rng.normal(
                    0.0, self.sigma_relative
                )
            results.append(self.metric_fn(trial))
        arr = np.asarray(results)
        return {
            "values": arr,
            "mean": float(arr.mean()),
            "std": float(arr.std()),
            "p95": float(np.percentile(arr, 95)),
        }
