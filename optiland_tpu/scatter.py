"""Monte-Carlo surface scattering (BSDF models).

The reference implements per-ray rejection sampling in Numba kernels
(reference: optiland/scatter.py:23-136, BaseBSDF:138, LambertianBSDF:212,
GaussianBSDF:239). Here scattering is vectorized with ``jax.random``:
in-plane offsets are drawn around the incidence direction in the local
(a, b, n) basis, and out-of-hemisphere draws are resampled a fixed number
of rounds (jit-friendly replacement for the reference's while-loop
rejection sampling).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_RESAMPLE_ROUNDS = 16


class BaseBSDF:
    """Base class for bidirectional scattering distribution functions."""

    _registry: dict[str, type] = {}

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        BaseBSDF._registry[cls.__name__] = cls

    def sample_disk(self, key, shape):
        """Draw in-plane scatter offsets (x, y); subclass-specific."""
        raise NotImplementedError

    def scatter(self, key, L, M, N, nx, ny, nz):
        """Scatter ray directions about the surface normal.

        Args:
            key: jax PRNG key.
            L, M, N: incident direction cosines (after refraction/reflection).
            nx, ny, nz: surface normal components.

        Returns:
            (L', M', N') scattered direction cosines.
        """
        L, M, N = jnp.broadcast_arrays(L, M, N)
        nx = jnp.broadcast_to(nx, L.shape)
        ny = jnp.broadcast_to(ny, L.shape)
        nz = jnp.broadcast_to(nz, L.shape)

        # Local basis (a, b) perpendicular to the normal
        # (reference: scatter.py:58-80)
        use_x = jnp.abs(L) < 0.999
        ax = jnp.where(use_x, 1.0, 0.0)
        ay = jnp.where(use_x, 0.0, 1.0)
        # a = n x arbitrary
        a1 = ny * 0.0 - nz * ay
        a2 = nz * ax - nx * 0.0
        a3 = nx * ay - ny * ax
        amag = jnp.sqrt(a1**2 + a2**2 + a3**2)
        a1, a2, a3 = a1 / amag, a2 / amag, a3 / amag
        # b = n x a
        b1 = ny * a3 - nz * a2
        b2 = nz * a1 - nx * a3
        b3 = nx * a2 - ny * a1

        ra = L * a1 + M * a2 + N * a3
        rb = L * b1 + M * b2 + N * b3

        def body(i, state):
            key, sx, sy, valid = state
            key, sub = jax.random.split(key)
            x, y = self.sample_disk(sub, L.shape)
            cand_x = ra + x
            cand_y = rb + y
            ok = cand_x**2 + cand_y**2 <= 1.0
            take = (~valid) & ok
            sx = jnp.where(take, cand_x, sx)
            sy = jnp.where(take, cand_y, sy)
            return key, sx, sy, valid | ok

        init = (key, ra, rb, jnp.zeros_like(L, dtype=bool))
        _, sx, sy, valid = jax.lax.fori_loop(0, _RESAMPLE_ROUNDS, body, init)
        # Unconverged rays fall back to specular (offset zero)
        sx = jnp.where(valid, sx, ra)
        sy = jnp.where(valid, sy, rb)
        sz = jnp.sqrt(jnp.maximum(1.0 - sx**2 - sy**2, 0.0))

        Ls = sx * a1 + sy * b1 + sz * nx
        Ms = sx * a2 + sy * b2 + sz * ny
        Ns = sx * a3 + sy * b3 + sz * nz
        return Ls, Ms, Ns

    def to_dict(self):
        return {"type": type(self).__name__}

    @classmethod
    def from_dict(cls, data):
        sub = cls._registry[data["type"]]
        kwargs = {k: v for k, v in data.items() if k != "type"}
        return sub(**kwargs)


class LambertianBSDF(BaseBSDF):
    """Diffuse scattering: uniform point on the unit disk
    (reference: scatter.py:212)."""

    def sample_disk(self, key, shape):
        k1, k2 = jax.random.split(key)
        r = jnp.sqrt(jax.random.uniform(k1, shape))
        theta = jax.random.uniform(k2, shape, minval=0.0, maxval=2 * jnp.pi)
        return r * jnp.cos(theta), r * jnp.sin(theta)


class GaussianBSDF(BaseBSDF):
    """Gaussian scattering of width sigma (reference: scatter.py:239)."""

    def __init__(self, sigma: float):
        self.sigma = sigma

    def sample_disk(self, key, shape):
        xy = self.sigma * jax.random.normal(key, (2,) + shape)
        return xy[0], xy[1]

    def to_dict(self):
        return {**super().to_dict(), "sigma": self.sigma}
