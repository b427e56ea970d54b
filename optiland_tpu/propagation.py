"""Propagation models (API-parity shim).

The trace engine propagates rays homogeneously inline (straight lines with
Beer-Lambert absorption, core/trace.py); these classes exist for API and
serialization parity with the reference's strategy objects
(reference: optiland/propagation/base.py:16, homogeneous.py:18, grin.py:14
— GRIN is an unimplemented placeholder there too).
"""

from __future__ import annotations

import jax.numpy as jnp


class BasePropagationModel:
    _registry: dict[str, type] = {}

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        BasePropagationModel._registry[cls.__name__] = cls

    def propagate(self, rays, t):
        raise NotImplementedError

    def to_dict(self):
        return {"model_class": type(self).__name__}

    @classmethod
    def from_dict(cls, d, material=None):
        sub = cls._registry[d["model_class"]]
        if sub is HomogeneousPropagation:
            return sub(material)
        return sub()


class HomogeneousPropagation(BasePropagationModel):
    """Straight-line propagation with optional absorption
    (reference: propagation/homogeneous.py:18)."""

    def __init__(self, material=None):
        self.material = material

    def propagate(self, rays, t):
        t = jnp.asarray(t)
        out = rays.replace(
            x=rays.x + t * rays.L,
            y=rays.y + t * rays.M,
            z=rays.z + t * rays.N,
        )
        if self.material is not None:
            n = self.material.n(rays.w)
            out = out.replace(opd=rays.opd + jnp.abs(t * n))
            k = getattr(self.material, "k", None)
            if callable(k):
                kv = jnp.asarray(k(rays.w))
                out = out.replace(
                    i=out.i * jnp.exp(-4 * jnp.pi * kv / rays.w * t * 1e3)
                )
        return out


class GRINPropagation(BasePropagationModel):
    """Placeholder, matching the reference's unimplemented GRIN seam
    (reference: propagation/grin.py:14)."""

    def propagate(self, rays, t):
        raise NotImplementedError("GRIN propagation is not yet implemented.")

    @classmethod
    def from_dict(cls, d, material=None):
        return cls()


__all__ = [
    "BasePropagationModel",
    "HomogeneousPropagation",
    "GRINPropagation",
]
