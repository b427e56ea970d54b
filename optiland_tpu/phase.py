"""Phase profiles for diffractive/metasurface interactions.

(reference: optiland/phase/base.py:14, constant.py:11, radial.py:11,
linear_grating.py:11, grid.py:12, interpolators.py:22, height_profile.py:19)
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class BasePhaseProfile:
    """Base phase profile: phase(x, y) plus its gradient
    (reference: phase/base.py:14)."""

    _registry: dict[str, type] = {}
    phase_type: str | None = None

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        if getattr(cls, "phase_type", None):
            BasePhaseProfile._registry[cls.phase_type] = cls

    @property
    def efficiency(self) -> float:
        return 1.0

    def get_phase(self, x, y, wavelength=None):
        raise NotImplementedError

    def get_gradient(self, x, y, wavelength=None):
        raise NotImplementedError

    def to_dict(self):
        return {"type": self.phase_type}

    @classmethod
    def from_dict(cls, data):
        sub = cls._registry[data["type"]]
        return sub._from_dict(data)


class ConstantPhaseProfile(BasePhaseProfile):
    """Constant phase, zero gradient (reference: phase/constant.py:11)."""

    phase_type = "constant"

    def __init__(self, phase: float = 0.0):
        self.phase = phase

    def get_phase(self, x, y, wavelength=None):
        return jnp.full_like(jnp.asarray(x), self.phase)

    def get_gradient(self, x, y, wavelength=None):
        z = jnp.zeros_like(jnp.asarray(x))
        return z, z, z

    def to_dict(self):
        return {**super().to_dict(), "phase": self.phase}

    @classmethod
    def _from_dict(cls, d):
        return cls(d.get("phase", 0.0))


class RadialPhaseProfile(BasePhaseProfile):
    """phi(r) = a_2 r^2 + a_4 r^4 + ... (reference: phase/radial.py:11)."""

    phase_type = "radial"

    def __init__(self, coefficients):
        self.coefficients = list(coefficients)

    def get_phase(self, x, y, wavelength=None):
        r2 = x**2 + y**2
        phase = jnp.zeros_like(jnp.asarray(x))
        for i, c in enumerate(self.coefficients):
            phase = phase + c * r2 ** (i + 1)
        return phase

    def get_gradient(self, x, y, wavelength=None):
        r2 = x**2 + y**2
        dphidr2 = jnp.zeros_like(jnp.asarray(x))
        for i, c in enumerate(self.coefficients):
            dphidr2 = dphidr2 + c * (i + 1) * r2**i
        return 2 * x * dphidr2, 2 * y * dphidr2, jnp.zeros_like(jnp.asarray(x))

    def to_dict(self):
        return {**super().to_dict(), "coefficients": list(self.coefficients)}

    @classmethod
    def _from_dict(cls, d):
        return cls(d["coefficients"])


class LinearGratingPhaseProfile(BasePhaseProfile):
    """Linear grating phase: K (cos a, sin a) . (x, y)
    (reference: phase/linear_grating.py:11)."""

    phase_type = "linear_grating"

    def __init__(self, period: float, angle: float = 0.0, order: int = 1,
                 efficiency: float = 1.0):
        if period <= 0:
            raise ValueError("Grating period must be positive.")
        if not (0.0 <= efficiency <= 1.0):
            raise ValueError("Efficiency must be between 0 and 1.")
        self.period = period
        self.angle = angle
        self.order = order
        self._efficiency = efficiency
        K = order * 2 * np.pi / period
        self._K_x = K * np.cos(angle)
        self._K_y = K * np.sin(angle)

    @property
    def efficiency(self):
        return self._efficiency

    def get_phase(self, x, y, wavelength=None):
        return self._K_x * x + self._K_y * y

    def get_gradient(self, x, y, wavelength=None):
        shape = jnp.asarray(x)
        return (
            jnp.full_like(shape, self._K_x),
            jnp.full_like(shape, self._K_y),
            jnp.zeros_like(shape),
        )

    def to_dict(self):
        return {
            **super().to_dict(),
            "period": self.period, "angle": self.angle,
            "order": self.order, "efficiency": self._efficiency,
        }

    @classmethod
    def _from_dict(cls, d):
        return cls(d["period"], d.get("angle", 0.0), d.get("order", 1),
                   d.get("efficiency", 1.0))


class GridPhaseProfile(BasePhaseProfile):
    """Bilinear-interpolated phase from a rectangular grid
    (reference: phase/grid.py:12, interpolators.py:22)."""

    phase_type = "grid"

    def __init__(self, x_coords, y_coords, phase_grid):
        self.x_coords = jnp.asarray(x_coords)
        self.y_coords = jnp.asarray(y_coords)
        self.phase_grid = jnp.asarray(phase_grid)  # (ny, nx)

    def _frac_index(self, coords, v):
        idx = jnp.clip(
            jnp.searchsorted(coords, v, side="right") - 1, 0, coords.shape[0] - 2
        )
        frac = (v - coords[idx]) / (coords[idx + 1] - coords[idx])
        return idx, jnp.clip(frac, 0.0, 1.0)

    def get_phase(self, x, y, wavelength=None):
        ix, fx = self._frac_index(self.x_coords, x)
        iy, fy = self._frac_index(self.y_coords, y)
        g = self.phase_grid
        p00 = g[iy, ix]
        p01 = g[iy, ix + 1]
        p10 = g[iy + 1, ix]
        p11 = g[iy + 1, ix + 1]
        return (
            p00 * (1 - fx) * (1 - fy)
            + p01 * fx * (1 - fy)
            + p10 * (1 - fx) * fy
            + p11 * fx * fy
        )

    def get_gradient(self, x, y, wavelength=None):
        ix, fx = self._frac_index(self.x_coords, x)
        iy, fy = self._frac_index(self.y_coords, y)
        g = self.phase_grid
        dx = self.x_coords[ix + 1] - self.x_coords[ix]
        dy = self.y_coords[iy + 1] - self.y_coords[iy]
        p00, p01 = g[iy, ix], g[iy, ix + 1]
        p10, p11 = g[iy + 1, ix], g[iy + 1, ix + 1]
        dpdx = ((p01 - p00) * (1 - fy) + (p11 - p10) * fy) / dx
        dpdy = ((p10 - p00) * (1 - fx) + (p11 - p01) * fx) / dy
        return dpdx, dpdy, jnp.zeros_like(jnp.asarray(x))

    def to_dict(self):
        return {
            **super().to_dict(),
            "x_coords": np.asarray(self.x_coords).tolist(),
            "y_coords": np.asarray(self.y_coords).tolist(),
            "phase_grid": np.asarray(self.phase_grid).tolist(),
        }

    @classmethod
    def _from_dict(cls, d):
        return cls(d["x_coords"], d["y_coords"], d["phase_grid"])


class HeightProfile(BasePhaseProfile):
    """Phase from a physical height map: phi = 2 pi (n2 - n1) h / lambda
    (reference: phase/height_profile.py:19)."""

    phase_type = "height"

    def __init__(self, height_profile: BasePhaseProfile, n_pre: float = 1.0,
                 n_post: float = 1.5):
        self.height_profile = height_profile
        self.n_pre = n_pre
        self.n_post = n_post

    def get_phase(self, x, y, wavelength=None):
        h = self.height_profile.get_phase(x, y)
        dn = self.n_post - self.n_pre
        return 2 * jnp.pi * dn * h / wavelength

    def get_gradient(self, x, y, wavelength=None):
        hx, hy, hz = self.height_profile.get_gradient(x, y)
        dn = self.n_post - self.n_pre
        f = 2 * jnp.pi * dn / wavelength
        return f * hx, f * hy, f * hz
