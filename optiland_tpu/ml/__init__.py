"""ML framework integration.

The native path is JAX: ``jax_loss(problem)`` returns a jitted, fully
differentiable scalar loss over the flat variable vector, ready for optax /
custom training loops. ``OpticalSystemModule`` additionally wraps the same
problem as a torch ``nn.Module`` whose forward/backward bridge into the
jitted JAX merit and gradient via a custom autograd Function, so an optical
system can sit inside a larger torch model
(reference: optiland/ml/wrappers.py:1-152 OpticalSystemModule).
"""

from __future__ import annotations

import numpy as np

try:
    import torch
    from torch import nn
except ImportError:  # pragma: no cover - torch is present in CI image
    torch = None
    nn = None


def jax_loss(problem, objective: str = "sum_squared"):
    """(loss_fn, x0): a jitted scalar loss over the flat variable vector.

    ``objective``: "sum_squared" (default) or "rss".
    """
    import jax
    import jax.numpy as jnp

    merit = problem.merit_fn()
    if objective == "sum_squared":
        fn = merit
    elif objective == "rss":
        fn = lambda x: jnp.sqrt(merit(x))
    else:
        raise ValueError(f"Unknown objective {objective!r}")
    return jax.jit(fn), np.asarray(problem.initial_x())


class _JaxMeritBridge(torch.autograd.Function if torch is not None else object):
    """torch.autograd bridge into the jitted JAX merit/gradient."""

    @staticmethod
    def forward(ctx, x, value_and_grad):
        val, grad = value_and_grad(np.asarray(x.detach().cpu(), np.float64))
        ctx.save_for_backward(
            torch.as_tensor(np.array(grad, copy=True), dtype=x.dtype)
        )
        return torch.as_tensor(float(val), dtype=x.dtype)

    @staticmethod
    def backward(ctx, grad_output):
        (g,) = ctx.saved_tensors
        return grad_output * g, None


class OpticalSystemModule(nn.Module if nn is not None else object):
    """torch nn.Module over an OptimizationProblem
    (reference: ml/wrappers.py:30-152).

    Exposes the problem's variables as one trainable parameter vector; the
    forward pass evaluates the (JAX-jitted) merit function and backward
    returns its exact gradient.
    """

    def __init__(self, optic, problem, objective_fn=None):
        if torch is None:
            raise RuntimeError(
                "OpticalSystemModule requires the 'torch' package."
            )
        super().__init__()
        self.optic = optic
        self.problem = problem
        self._vg = problem.value_and_grad_fn()
        x0 = np.asarray(problem.initial_x(), np.float64)
        self.params = nn.Parameter(torch.as_tensor(x0))
        self.objective_fn = objective_fn

    def forward(self):
        if self.objective_fn is not None:
            self.sync_to_problem()
            return self.objective_fn()
        return _JaxMeritBridge.apply(self.params, self._vg)

    def sync_to_problem(self):
        """Write the current parameter vector back into the Optic."""
        self.problem.update_optic(
            np.asarray(self.params.detach().cpu(), np.float64)
        )

    def apply_bounds(self):
        """Clamp parameters to each variable's (scaled) bounds in-place
        (reference: ml/wrappers.py:95-118)."""
        with torch.no_grad():
            for i, var in enumerate(self.problem.variables):
                lo, hi = getattr(var, "min_val", None), getattr(
                    var, "max_val", None
                )
                if lo is not None:
                    lo = float(var.scaler.scale(lo))
                if hi is not None:
                    hi = float(var.scaler.scale(hi))
                if lo is not None and hi is not None and lo > hi:
                    lo, hi = hi, lo
                if lo is not None:
                    self.params.data[i].clamp_(min=lo)
                if hi is not None:
                    self.params.data[i].clamp_(max=hi)


__all__ = ["OpticalSystemModule", "jax_loss"]
