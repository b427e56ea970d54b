"""Tabulated lens prescription report.

(reference: optiland/visualization/info/lens_info_viewer.py:31,
providers.py:20-99; Optic.info, optic/optic.py:566-690)
"""

from __future__ import annotations

import numpy as np


class LensInfoViewer:
    """Prescription table: type, radius, thickness, material, index, semi-dia."""

    def __init__(self, optic):
        self.optic = optic

    def get_dataframe(self):
        import pandas as pd

        optic = self.optic
        system = optic.system
        from optiland_tpu.core.system import n_all
        from optiland_tpu.visualization.viewer import _semi_apertures

        n = np.asarray(n_all(system.stack, system.cfg, optic.primary_wavelength))
        semis = _semi_apertures(optic)
        rows = []
        for i, s in enumerate(optic.surfaces.surfaces):
            mat = s.material
            if isinstance(mat, tuple):
                mat_name = f"{mat[0]} ({mat[1]})"
            elif hasattr(mat, "name"):
                mat_name = mat.name
            elif isinstance(mat, str):
                mat_name = mat
            else:
                mat_name = type(mat).__name__
            if i == 0:
                stype = "Object"
            elif i == len(optic.surfaces.surfaces) - 1:
                stype = "Image"
            else:
                stype = (s.surface_type or "standard").replace("_", " ").title()
            if s.is_stop:
                stype += " (Stop)"
            rows.append(
                {
                    "Type": stype,
                    "Comment": s.comment,
                    "Radius": s.radius,
                    "Thickness": s.thickness,
                    "Material": mat_name,
                    "Conic": s.conic,
                    "Index": float(n[i]),
                    "Semi-aperture": float(semis[i]) if i < len(semis) else np.nan,
                }
            )
        return pd.DataFrame(rows)

    def view(self):
        df = self.get_dataframe()
        print(df.to_string(index=True))
        return df
