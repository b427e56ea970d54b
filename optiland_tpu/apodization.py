"""Pupil apodization profiles.

Intensity scaling over normalized pupil coordinates, applied at ray
generation (reference: optiland/apodization/*.py; applied at
rays/ray_generator.py:81-85).
"""

from __future__ import annotations

import jax.numpy as jnp


class BaseApodization:
    _registry: dict[str, type] = {}

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        BaseApodization._registry[cls.__name__] = cls

    def get_intensity(self, Px, Py):
        raise NotImplementedError

    def to_dict(self):
        return {"type": type(self).__name__}

    @classmethod
    def from_dict(cls, data):
        sub = cls._registry[data["type"]]
        kwargs = {k: v for k, v in data.items() if k != "type"}
        return sub(**kwargs)


class UniformApodization(BaseApodization):
    """No apodization (reference: apodization/uniform.py)."""

    def get_intensity(self, Px, Py):
        return jnp.ones_like(jnp.asarray(Px))


class GaussianApodization(BaseApodization):
    """exp(-r^2 / 2 sigma^2) (reference: apodization/gaussian.py:16)."""

    def __init__(self, sigma: float = 1.0):
        if sigma <= 0:
            raise ValueError("sigma must be positive for GaussianApodization.")
        self.sigma = sigma

    def get_intensity(self, Px, Py):
        return jnp.exp(-(Px**2 + Py**2) / (2 * self.sigma**2))

    def to_dict(self):
        return {**super().to_dict(), "sigma": self.sigma}


class TukeyApodization(BaseApodization):
    """Flat core with cosine taper (reference: apodization/tukey.py)."""

    def __init__(self, R: float = 1.0, alpha: float = 0.5):
        if R <= 0:
            raise ValueError("R must be positive for TukeyApodization.")
        if not (0 <= alpha <= 1):
            raise ValueError("alpha must be between 0 and 1 for TukeyApodization.")
        self.R = R
        self.alpha = alpha

    def get_intensity(self, Px, Py):
        r = jnp.sqrt(Px**2 + Py**2)
        if self.alpha == 0:
            return jnp.where(r < self.R, 1.0, 0.0)
        flat_end = self.R * (1 - self.alpha / 2)
        cos_arg = jnp.pi * (r - flat_end) / (self.R * self.alpha / 2)
        taper = 0.5 * (1 + jnp.cos(cos_arg))
        out = jnp.where(r <= flat_end, 1.0, 0.0)
        out = jnp.where((r > flat_end) & (r <= self.R), taper, out)
        return out

    def to_dict(self):
        return {**super().to_dict(), "R": self.R, "alpha": self.alpha}


class HannApodization(BaseApodization):
    """0.5 (1 - cos(2 pi r / D)) inside r < D/2
    (reference: apodization/hann.py)."""

    def __init__(self, D: float = 2.0):
        self.D = D

    def get_intensity(self, Px, Py):
        r = jnp.sqrt(Px**2 + Py**2)
        intensity = 0.5 * (1 - jnp.cos(2 * jnp.pi * r / self.D))
        return jnp.where(r < self.D / 2, intensity, 0.0)

    def to_dict(self):
        return {**super().to_dict(), "D": self.D}


class PolynomialApodization(BaseApodization):
    """(1 - (r/R)^2)^p inside r < R (reference: apodization/polynomial.py)."""

    def __init__(self, R: float = 1.0, p: float = 1.0):
        if R <= 0:
            raise ValueError("R must be positive for PolynomialApodization.")
        if p < 0:
            raise ValueError("p must be non-negative for PolynomialApodization.")
        self.R = R
        self.p = p

    def get_intensity(self, Px, Py):
        r = jnp.sqrt(Px**2 + Py**2)
        intensity = (1 - (r / self.R) ** 2) ** self.p
        return jnp.where(r < self.R, intensity, 0.0)

    def to_dict(self):
        return {**super().to_dict(), "R": self.R, "p": self.p}


class CosineSquaredApodization(BaseApodization):
    """cos^2(pi r / 2R) inside r < R
    (reference: apodization/cosine_squared.py:10)."""

    def __init__(self, R: float = 1.0):
        if R <= 0:
            raise ValueError("R must be positive for CosineSquaredApodization.")
        self.R = R

    def get_intensity(self, Px, Py):
        r = jnp.sqrt(Px**2 + Py**2)
        intensity = jnp.cos(jnp.pi * r / (2 * self.R)) ** 2
        return jnp.where(r < self.R, intensity, 0.0)

    def to_dict(self):
        return {**super().to_dict(), "R": self.R}


class SuperGaussianApodization(BaseApodization):
    """exp(-(r/w)^n) (reference: apodization/super_gaussian.py)."""

    def __init__(self, w: float = 1.0, n: float = 2.0):
        if w <= 0:
            raise ValueError("w must be positive for SuperGaussianApodization.")
        if n < 2:
            raise ValueError("n must be >= 2 for SuperGaussianApodization.")
        self.w = w
        self.n = n

    def get_intensity(self, Px, Py):
        r = jnp.sqrt(Px**2 + Py**2)
        return jnp.exp(-((r / self.w) ** self.n))

    def to_dict(self):
        return {**super().to_dict(), "w": self.w, "n": self.n}
