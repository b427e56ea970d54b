"""Surface-type converters: ideal thin lens <-> thick lens.

(reference: optiland/surfaces/converters.py:1-242
ParaxialToThickLensConverter)
"""

from __future__ import annotations

import math

import numpy as np

from optiland_tpu.materials import BaseMaterial, IdealMaterial, resolve_material


class ParaxialToThickLensConverter:
    """Replace a paraxial (ideal thin lens) surface with an equivalent
    equiconvex/equiconcave thick lens via the lensmaker's equation
    (reference: surfaces/converters.py:20-242)."""

    def __init__(self, paraxial_index: int, optic,
                 material="N-BK7", center_thickness: float = 3.0):
        surf = optic.surfaces.surfaces[paraxial_index]
        if surf.surface_type != "paraxial":
            raise TypeError(
                f"Surface {paraxial_index} is not a paraxial (thin lens) "
                "surface."
            )
        self.optic = optic
        self.index = paraxial_index
        self.original_focal_length = float(surf.geo_p1)
        self.center_thickness = float(center_thickness)
        self._material = self._resolve(material)

    @staticmethod
    def _resolve(material):
        if isinstance(material, BaseMaterial):
            return material
        if isinstance(material, (int, float)):
            return IdealMaterial(float(material))
        return resolve_material(material)

    def _radii(self):
        """Solve the lensmaker's equation for an equiconvex/equiconcave
        element (R1 = -R2) (reference: converters.py:84-160)."""
        n = float(np.ravel(np.asarray(
            self._material.n(float(self.optic.primary_wavelength))
        ))[0])
        f = self.original_focal_length
        d = self.center_thickness
        if abs(f) < 1e-9 or math.isinf(f):
            return np.inf, np.inf
        P = 1.0 / f
        a = P * n
        b = -2 * n * (n - 1)
        c = (n - 1) ** 2 * d
        if abs(a) < 1e-9:
            r1 = -c / b
        else:
            disc = b * b - 4 * a * c
            if disc < 0:
                raise ValueError(
                    "Lensmaker's equation has no real solution for this "
                    "focal length / thickness / index combination."
                )
            sols = sorted(
                [(-b + math.sqrt(disc)) / (2 * a),
                 (-b - math.sqrt(disc)) / (2 * a)]
            )
            want_positive = f > 0
            cands = [s for s in sols if (s > 0) == want_positive and s != 0]
            if not cands:
                raise ValueError(
                    "No radius solution with the required sign found."
                )
            r1 = cands[0] if not want_positive else cands[-1]
        return float(r1), float(-r1)

    def convert(self):
        """Swap the paraxial surface for two standard surfaces in place."""
        r1, r2 = self._radii()
        surfs = self.optic.surfaces.surfaces
        old = surfs[self.index]
        surfs.pop(self.index)
        self.optic.surfaces.add(
            index=self.index, radius=r1, material=self._material,
            is_stop=old.is_stop, thickness=self.center_thickness,
            comment="Thick Lens - Surface 1",
        )
        self.optic.surfaces.add(
            index=self.index + 1, radius=r2, material=old.material,
            thickness=float(old.thickness),
            comment="Thick Lens - Surface 2",
        )
        self.optic._invalidate()
        return r1, r2


__all__ = ["ParaxialToThickLensConverter"]
