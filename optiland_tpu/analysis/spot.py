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
    """Image-plane (x, y, intensity) for a bundle (functional, jittable).

    When ``wavelength`` is a concrete Python float the trace dispatches to
    the fused Pallas kernel on accelerator backends (core/trace.trace)."""
    rays = raygen.generate_rays(system, Hx, Hy, Px, Py, wavelength)
    final, _ = trace_core.trace(
        system, rays, record=False, wavelength=wavelength
    )
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
                 distribution="hexapolar", coordinates="local",
                 reference="chief_ray"):
        self.optic = optic
        if fields == "all":
            fields = optic.fields.get_field_coords()
        if wavelengths == "all":
            wavelengths = optic.wavelengths.get_wavelengths()
        if coordinates not in ("global", "local"):
            raise ValueError("Coordinates must be 'global' or 'local'.")
        if reference not in ("chief_ray", "centroid"):
            raise ValueError("Reference must be 'chief_ray' or 'centroid'.")
        self.fields = fields
        self.wavelengths = wavelengths
        self.coordinates = coordinates
        self.reference = reference
        # centering/centroids use the primary wavelength if analyzed, else
        # the first (reference: spot_diagram/core.py:113-119)
        prim = float(optic.primary_wavelength)
        wl_vals = [float(w) for w in wavelengths]
        self._ref_idx = wl_vals.index(prim) if prim in wl_vals else 0
        dist = create_distribution(distribution)
        dist.generate_points(num_rings)
        self._Px, self._Py = dist.x, dist.y
        self.data = self._generate_data()

    def _to_local(self, x, y, z):
        """Global -> image-surface-local coordinates (reference:
        visualization/system/utils.transform with is_global=True). Identity
        for the common untilted, undecentered image surface."""
        st = self.optic.system.stack
        dx, dy = float(st.dx[-1]), float(st.dy[-1])
        rx, ry, rz = float(st.rx[-1]), float(st.ry[-1]), float(st.rz[-1])
        if (dx, dy, rx, ry, rz) == (0.0, 0.0, 0.0, 0.0, 0.0):
            return x, y
        from optiland_tpu.core.system import positions
        from optiland_tpu.ops import kernels

        pos = positions(st)
        x = np.asarray(x) - dx
        y = np.asarray(y) - dy
        zl = np.asarray(z) - float(pos[-1] + st.dz[-1])
        zero = np.zeros_like(x)
        x, y, _, _ = (np.asarray(a) for a in
                      kernels.rotate_z(x, y, zero, zero, -rz))
        x, zl, _, _ = (np.asarray(a) for a in
                       kernels.rotate_y(x, zl, zero, zero, -ry))
        y, zl, _, _ = (np.asarray(a) for a in
                       kernels.rotate_x(y, zl, zero, zero, -rx))
        return x, y

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
                # zero-intensity (vignetted/TIR) rays are dropped, matching
                # reference spot_diagram/core.py:470-472
                i = np.asarray(res.i)
                mask = i > 0
                x, y = np.asarray(res.x)[mask], np.asarray(res.y)[mask]
                if self.coordinates == "local":
                    x, y = self._to_local(x, y, np.asarray(res.z)[mask])
                row.append(SpotData(x, y, i[mask]))
            data.append(row)
        return data

    def _reference_centers(self):
        """Per-field (x, y) centering points: the chief-ray intercept or the
        reference-wavelength centroid (reference: spot_diagram/reference.py)."""
        if self.reference == "centroid":
            return [row[self._ref_idx].centroid for row in self.data]
        wl = float(self.wavelengths[self._ref_idx])
        centers = []
        for (Hx, Hy) in self.fields:
            res = self.optic.trace_generic(
                np.asarray([Hx]), np.asarray([Hy]),
                np.zeros(1), np.zeros(1), wl, record=False,
            )
            x, y = np.asarray(res.x), np.asarray(res.y)
            if self.coordinates == "local":
                x, y = self._to_local(x, y, np.asarray(res.z))
            centers.append((float(np.ravel(x)[0]), float(np.ravel(y)[0])))
        return centers

    def centroid(self):
        """Reference-wavelength spot centroid per field
        (reference: spot_diagram/core.py:329-340)."""
        return [row[self._ref_idx].centroid for row in self.data]

    def rms_spot_radius(self):
        """Per-field, per-wavelength RMS spot radii about the reference
        center (reference: spot_diagram/core.py:357-372)."""
        out = []
        for (cx, cy), row in zip(self._reference_centers(), self.data):
            out.append([
                float(np.sqrt(np.mean((sd.x - cx) ** 2 + (sd.y - cy) ** 2)))
                for sd in row
            ])
        return out

    def geometric_spot_radius(self):
        """Max spot radius about the reference center
        (reference: spot_diagram/core.py:342-355)."""
        out = []
        for (cx, cy), row in zip(self._reference_centers(), self.data):
            out.append([
                float(np.max(np.sqrt((sd.x - cx) ** 2 + (sd.y - cy) ** 2)))
                for sd in row
            ])
        return out

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
