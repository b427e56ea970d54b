"""optiland_tpu — a TPU-native differentiable optical design framework.

A from-scratch reimplementation of the capabilities of Optiland
(github.com/lordpositron/optiland) designed for JAX/XLA on TPU hardware:
pure-functional pytree system descriptions, jit/vmap-compiled trace loops,
Pallas kernels for the fused per-surface intersect+refract step, jax.grad
through every analysis, and ray batches sharded across device meshes.
"""

from optiland_tpu import config  # noqa: F401  (enables x64 before array use)
from optiland_tpu.coordinate_system import CoordinateSystem  # noqa: F401
from optiland_tpu.core.geometry import register_geometry  # noqa: F401

__version__ = "0.1.0"
