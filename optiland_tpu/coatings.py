"""Surface coatings: intensity scaling and Jones-based polarized models.

(reference: optiland/coatings.py:27 BaseCoating, :164 SimpleCoating,
:266 BaseCoatingPolarized, :362 FresnelCoating, :418 PolarizerCoating,
:450 RetarderCoating, :488 JonesThinFilm, :544 ThinFilmCoating)

Coatings are static per-surface objects. In the trace they act after the
refraction/reflection step: they may scale the ray intensity and, for
polarized traces, supply the per-ray Jones matrix that updates the
polarization matrix p.
"""

from __future__ import annotations

import jax.numpy as jnp

from optiland_tpu.polarization import (
    BaseJones,
    JonesFresnel,
    JonesLinearPolarizer,
    JonesLinearRetarder,
    JonesThinFilm,
)


class BaseCoating:
    _registry: dict[str, type] = {}

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        BaseCoating._registry[cls.__name__] = cls

    #: True when the coating's physics needs the polarization matrix
    polarization_dependent = False

    def intensity_factor(self, reflect: bool):
        """Scalar intensity multiplier (for unpolarized traces)."""
        return 1.0

    def jones(self) -> BaseJones | None:
        """Jones model applied in polarized traces (None = identity)."""
        return None

    @staticmethod
    def compute_aoi(L0, M0, N0, nx, ny, nz):
        """Angle of incidence from pre-interaction directions
        (reference: coatings.py:72-110)."""
        dot = jnp.abs(nx * L0 + ny * M0 + nz * N0)
        return jnp.arccos(jnp.clip(dot, -1.0, 1.0))

    def to_dict(self):
        return {"type": type(self).__name__}


class SimpleCoating(BaseCoating):
    """Fixed transmittance/reflectance (reference: coatings.py:164)."""

    def __init__(self, transmittance: float, reflectance: float = 0):
        self.transmittance = transmittance
        self.reflectance = reflectance
        self.absorptance = 1 - reflectance - transmittance

    def intensity_factor(self, reflect: bool):
        return self.reflectance if reflect else self.transmittance

    def to_dict(self):
        return {
            **super().to_dict(),
            "transmittance": self.transmittance,
            "reflectance": self.reflectance,
        }


class FresnelCoating(BaseCoating):
    """Fresnel amplitude coefficients of the bare interface
    (reference: coatings.py:362)."""

    polarization_dependent = True

    def __init__(self, material_pre, material_post):
        self.material_pre = material_pre
        self.material_post = material_post
        self._jones = JonesFresnel(material_pre, material_post)

    def jones(self):
        return self._jones


class PolarizerCoating(BaseCoating):
    """Linear polarizer coating (reference: coatings.py:418)."""

    polarization_dependent = True

    def __init__(self, axis=(1, 0, 0)):
        self._jones = JonesLinearPolarizer(axis)

    def jones(self):
        return self._jones


class RetarderCoating(BaseCoating):
    """Linear retarder coating (reference: coatings.py:450)."""

    polarization_dependent = True

    def __init__(self, retardance, axis=None, *, theta=None):
        self._jones = JonesLinearRetarder(retardance, axis=axis, theta=theta)

    def jones(self):
        return self._jones


class ThinFilmCoating(BaseCoating):
    """Multilayer coating driven by a ThinFilmStack's TMM
    (reference: coatings.py:544)."""

    polarization_dependent = True

    def __init__(self, stack):
        self.stack = stack
        self._jones = JonesThinFilm(stack)

    def jones(self):
        return self._jones
