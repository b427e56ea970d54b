"""Propagation models.

The trace engine propagates rays homogeneously inline (straight lines with
Beer-Lambert absorption, core/trace.py); these classes exist for API and
serialization parity with the reference's strategy objects
(reference: optiland/propagation/base.py:16, homogeneous.py:18, grin.py:14).

GRIN propagation goes BEYOND the reference (whose grin.py:14 raises
NotImplementedError): rays through a gradient-index medium integrate the
ray equation d/ds(n dr/ds) = grad n with a fixed-step RK4 under
``lax.scan`` — static shapes, jit/grad/vmap-compatible — and accumulate
OPD as the integral of n ds.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


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
        # delegate to a subclass override (e.g. GRINPropagation rebuilds
        # its medium), avoiding infinite recursion through this base
        if sub.from_dict.__func__ is not BasePropagationModel.from_dict.__func__:
            return sub.from_dict(d, material)
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


class GRINMedium:
    """Radial-plus-axial polynomial gradient-index profile.

        n(x, y, z) = n0 + nr2 r^2 + nr4 r^4 + nz1 z + nz2 z^2,  r^2 = x^2+y^2

    The classic SELFOC/Wood lens n(r) = n0 (1 - (A/2) r^2) is
    ``GRINMedium(n0, nr2=-n0*A/2)``. All coefficients are differentiable
    inputs; ``n`` and its analytic gradient are pure jnp.
    """

    def __init__(self, n0: float, nr2: float = 0.0, nr4: float = 0.0,
                 nz1: float = 0.0, nz2: float = 0.0):
        self.n0 = n0
        self.nr2 = nr2
        self.nr4 = nr4
        self.nz1 = nz1
        self.nz2 = nz2

    def n(self, x, y, z):
        r2 = x**2 + y**2
        return (self.n0 + self.nr2 * r2 + self.nr4 * r2**2
                + self.nz1 * z + self.nz2 * z**2)

    def grad_n(self, x, y, z):
        r2 = x**2 + y**2
        d_dr2 = self.nr2 + 2 * self.nr4 * r2
        return (2 * x * d_dr2, 2 * y * d_dr2,
                self.nz1 + 2 * self.nz2 * z)

    def to_dict(self):
        return {"n0": self.n0, "nr2": self.nr2, "nr4": self.nr4,
                "nz1": self.nz1, "nz2": self.nz2}

    @classmethod
    def from_dict(cls, d):
        return cls(**d)


class GRINPropagation(BasePropagationModel):
    """Curved-ray propagation through a gradient-index medium.

    Integrates the ray equation in its Hamiltonian form with optical
    momentum p = n * (L, M, N):

        dr/ds = p / n,      dp/ds = grad n

    using fixed-step RK4 under ``lax.scan`` (static step count: one
    compiled program regardless of path length; reference grin.py:14 is an
    unimplemented placeholder). ``t`` is the total path length in mm; OPD
    accumulates as the integral of n ds.
    """

    def __init__(self, medium: GRINMedium | None = None,
                 num_steps: int = 64):
        self.medium = medium if medium is not None else GRINMedium(1.5)
        self.num_steps = int(num_steps)

    def propagate(self, rays, t):
        med = self.medium
        ds = jnp.asarray(t) / self.num_steps

        def deriv(state):
            x, y, z, px, py, pz = state
            n = med.n(x, y, z)
            gx, gy, gz = med.grad_n(x, y, z)
            return (px / n, py / n, pz / n, gx, gy, gz)

        def rk4(carry, _):
            x, y, z, px, py, pz, opd = carry
            s0 = (x, y, z, px, py, pz)
            k1 = deriv(s0)
            s1 = tuple(v + 0.5 * ds * d for v, d in zip(s0, k1))
            k2 = deriv(s1)
            s2 = tuple(v + 0.5 * ds * d for v, d in zip(s0, k2))
            k3 = deriv(s2)
            s3 = tuple(v + ds * d for v, d in zip(s0, k3))
            k4 = deriv(s3)
            new = tuple(
                v + ds / 6.0 * (a + 2 * b + 2 * c + d)
                for v, a, b, c, d in zip(s0, k1, k2, k3, k4)
            )
            # OPD via Simpson-like average of n along the step
            n_mid = med.n(s1[0], s1[1], s1[2])
            n_a = med.n(s0[0], s0[1], s0[2])
            n_b = med.n(new[0], new[1], new[2])
            opd = opd + ds * (n_a + 4 * n_mid + n_b) / 6.0
            return new + (opd,), None

        n_start = med.n(rays.x, rays.y, rays.z)
        carry = (rays.x, rays.y, rays.z,
                 n_start * rays.L, n_start * rays.M, n_start * rays.N,
                 rays.opd)
        (x, y, z, px, py, pz, opd), _ = lax.scan(
            rk4, carry, None, length=self.num_steps
        )
        n_end = med.n(x, y, z)
        return rays.replace(
            x=x, y=y, z=z,
            L=px / n_end, M=py / n_end, N=pz / n_end,
            opd=opd,
        )

    def to_dict(self):
        return {
            **super().to_dict(),
            "medium": self.medium.to_dict(),
            "num_steps": self.num_steps,
        }

    @classmethod
    def from_dict(cls, d, material=None):
        medium = GRINMedium.from_dict(d["medium"]) if "medium" in d else None
        return cls(medium, d.get("num_steps", 64))


__all__ = [
    "BasePropagationModel",
    "HomogeneousPropagation",
    "GRINMedium",
    "GRINPropagation",
]
