"""Thin-film coating design: transfer-matrix method stacks.

A functional JAX TMM (Abeles matrices, Macleod admittance conventions)
matching the reference's physics (reference: optiland/thin_film/core.py,
layer.py:21, stack.py:34-345). Layer thicknesses are differentiable, so
coating merit functions optimize with jax.grad/optax directly.
"""

from optiland_tpu.thin_film.stack import Layer, ThinFilmStack, tmm_coherent
from optiland_tpu.thin_film.analysis import SpectralAnalyzer
from optiland_tpu.thin_film.optimization import (
    LayerThicknessVariable,
    ThinFilmOptimizer,
    needle_synthesis,
)
from optiland_tpu.thin_film.tolerancing import (
    ThinFilmMonteCarlo,
    ThinFilmPerturbation,
    ThinFilmSensitivityAnalysis,
)

__all__ = [
    "Layer",
    "LayerThicknessVariable",
    "SpectralAnalyzer",
    "ThinFilmMonteCarlo",
    "ThinFilmOptimizer",
    "ThinFilmPerturbation",
    "ThinFilmSensitivityAnalysis",
    "ThinFilmStack",
    "needle_synthesis",
    "tmm_coherent",
]
