"""Spot-diagram analysis and functional spot metrics.

Functional core (jit/grad-friendly) plus a SpotDiagram analysis class
mirroring the reference's API (reference:
optiland/analysis/spot_diagram/core.py:36-110, and the rms_spot_size
operand, optimization/operand/ray.py:300-340).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from optiland_tpu.core import raygen, trace as trace_core
from optiland_tpu.core.distributions import create_distribution
from optiland_tpu.core.system import System


def spot_coordinates(system: System, Hx, Hy, Px, Py, wavelength):
    """Image-plane (x, y, intensity) for a bundle (functional, jittable)."""
    rays = raygen.generate_rays(system, Hx, Hy, Px, Py, wavelength)
    final, _ = trace_core.trace(system, rays, record=False)
    return final.x, final.y, final.i


def rms_spot_size(system: System, Hx, Hy, Px, Py, wavelength):
    """RMS spot radius about the centroid (reference:
    optimization/operand/ray.py:336-340). Jittable and differentiable."""
    x, y, _ = spot_coordinates(system, Hx, Hy, Px, Py, wavelength)
    r2 = (x - jnp.mean(x)) ** 2 + (y - jnp.mean(y)) ** 2
    return jnp.sqrt(jnp.mean(r2))


class SpotData:
    """Spot data for one (field, wavelength): intersection coordinates."""

    def __init__(self, x, y, intensity):
        self.x = np.asarray(x)
        self.y = np.asarray(y)
        self.intensity = np.asarray(intensity)

    @property
    def centroid(self):
        return float(np.mean(self.x)), float(np.mean(self.y))

    def rms_radius(self):
        cx, cy = self.centroid
        r2 = (self.x - cx) ** 2 + (self.y - cy) ** 2
        return float(np.sqrt(np.mean(r2)))

    def geometric_radius(self):
        cx, cy = self.centroid
        r = np.sqrt((self.x - cx) ** 2 + (self.y - cy) ** 2)
        return float(np.max(r))


class SpotDiagram:
    """Spot diagram across fields and wavelengths.

    Args:
        optic: an Optic instance.
        fields: "all" or list of (Hx, Hy) normalized coordinates.
        wavelengths: "all" or list of wavelengths (um).
        num_rings: hexapolar ring count.
    """

    def __init__(self, optic, fields="all", wavelengths="all", num_rings=6,
                 distribution="hexapolar"):
        self.optic = optic
        if fields == "all":
            fields = optic.fields.get_field_coords()
        if wavelengths == "all":
            wavelengths = optic.wavelengths.get_wavelengths()
        self.fields = fields
        self.wavelengths = wavelengths
        dist = create_distribution(distribution)
        dist.generate_points(num_rings)
        self._Px, self._Py = dist.x, dist.y
        self.data = self._generate_data()

    def _generate_data(self):
        data = []
        for (Hx, Hy) in self.fields:
            row = []
            for wl in self.wavelengths:
                res = self.optic.trace_generic(
                    np.full_like(self._Px, Hx),
                    np.full_like(self._Px, Hy),
                    self._Px,
                    self._Py,
                    wl,
                    record=False,
                )
                row.append(SpotData(res.x, res.y, res.i))
            data.append(row)
        return data

    def rms_spot_radius(self):
        """Per-field, per-wavelength RMS spot radii."""
        return [[sd.rms_radius() for sd in row] for row in self.data]

    def geometric_spot_radius(self):
        return [[sd.geometric_radius() for sd in row] for row in self.data]

    def view(self, ax=None):
        """Plot the spot grid with matplotlib."""
        import matplotlib.pyplot as plt

        nf = len(self.fields)
        fig, axes = plt.subplots(1, nf, figsize=(3 * nf, 3), squeeze=False)
        for i, ((hx, hy), row) in enumerate(zip(self.fields, self.data)):
            ax = axes[0][i]
            for sd, wl in zip(row, self.wavelengths):
                cx, cy = row[0].centroid
                ax.scatter(sd.x - cx, sd.y - cy, s=1, label=f"{wl:.3f} um")
            ax.set_title(f"Hx={hx:.2f}, Hy={hy:.2f}")
            ax.set_aspect("equal")
        axes[0][0].legend(fontsize=6)
        return fig, axes
