"""Ray bundle pytrees.

Rays are structure-of-arrays pytrees (one flat array per component), the
TPU-native analog of the reference's mutable RealRays/ParaxialRays classes
(reference: optiland/rays/real_rays.py:23, paraxial_rays.py:1). All kernels
that mutate rays in the reference are pure functions here
(optiland_tpu.ops.kernels) returning new bundles.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class RealRays:
    """A bundle of real rays in 3D space (SoA layout).

    Attributes:
        x, y, z: positions.
        L, M, N: direction cosines (normalized).
        i: intensity.
        w: wavelength in micrometers.
        opd: accumulated optical path length.
        L0, M0, N0: pre-interaction direction cosines of the most recent
            surface interaction (None before the first interaction).
    """

    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray
    L: jnp.ndarray
    M: jnp.ndarray
    N: jnp.ndarray
    i: jnp.ndarray
    w: jnp.ndarray
    opd: jnp.ndarray
    L0: Optional[jnp.ndarray] = None
    M0: Optional[jnp.ndarray] = None
    N0: Optional[jnp.ndarray] = None

    @classmethod
    def create(cls, x, y, z, L, M, N, intensity, wavelength):
        """Build a bundle from broadcastable components."""
        x, y, z, L, M, N, intensity, wavelength = jnp.broadcast_arrays(
            *[jnp.atleast_1d(jnp.asarray(a, dtype=jnp.result_type(float)))
              for a in (x, y, z, L, M, N, intensity, wavelength)]
        )
        return cls(
            x=x, y=y, z=z, L=L, M=M, N=N, i=intensity, w=wavelength,
            opd=jnp.zeros_like(x),
        )

    @property
    def num_rays(self) -> int:
        return self.x.shape[0]


@struct.dataclass
class ParaxialRays:
    """A bundle of paraxial rays (height y, slope u, axial position z)."""

    y: jnp.ndarray
    u: jnp.ndarray
    z: jnp.ndarray
    w: jnp.ndarray

    @classmethod
    def create(cls, y, u, z, wavelength):
        y, u, z, wavelength = jnp.broadcast_arrays(
            *[jnp.atleast_1d(jnp.asarray(a, dtype=jnp.result_type(float)))
              for a in (y, u, z, wavelength)]
        )
        return cls(y=y, u=u, z=z, w=wavelength)
