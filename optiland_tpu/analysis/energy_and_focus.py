"""Encircled energy and through-focus analyses.

(reference: optiland/analysis/encircled_energy.py:23,
through_focus.py:15, through_focus_spot_diagram.py:29,
through_focus_mtf.py:27)
"""

from __future__ import annotations

import copy

import numpy as np

from optiland_tpu.analysis.spot import SpotDiagram


class EncircledEnergy(SpotDiagram):
    """Fraction of energy within a radius of the centroid
    (reference: analysis/encircled_energy.py:23)."""

    def __init__(self, optic, fields="all", wavelength="primary",
                 num_rays=100_000, distribution="random", num_points=256):
        if wavelength == "primary":
            wavelength = optic.primary_wavelength
        self.num_points = num_points
        super().__init__(
            optic, fields=fields, wavelengths=[wavelength],
            num_rings=num_rays, distribution=distribution,
        )

    def centroid(self):
        return [
            (float(np.mean(row[0].x)), float(np.mean(row[0].y)))
            for row in self.data
        ]

    def curves(self):
        """(radius, fraction) encircled-energy curves per field."""
        out = []
        for row in self.data:
            sd = row[0]
            cx, cy = sd.centroid
            r = np.hypot(sd.x - cx, sd.y - cy)
            energy = sd.intensity
            order = np.argsort(r)
            r_sorted = r[order]
            cum = np.cumsum(energy[order])
            cum = cum / cum[-1]
            radii = np.linspace(0, r_sorted[-1], self.num_points)
            frac = np.interp(radii, r_sorted, cum)
            out.append((radii, frac))
        return out

    def view(self, figsize=(7, 4.5), ax=None):
        import matplotlib.pyplot as plt

        if ax is None:
            fig, ax = plt.subplots(figsize=figsize)
        else:
            fig = ax.figure
        for (radii, frac), field in zip(self.curves(), self.fields):
            ax.plot(radii * 1e3, frac, label=f"field {field}")
        ax.set_xlabel("Radius (um)")
        ax.set_ylabel("Encircled energy fraction")
        ax.legend(fontsize=7)
        return fig, ax


class ThroughFocusAnalysis:
    """Base for analyses repeated across focal shifts
    (reference: analysis/through_focus.py:15)."""

    def __init__(self, optic, delta_focus: float = 0.1, num_steps: int = 5,
                 fields="all", wavelengths="all"):
        if num_steps % 2 == 0:
            num_steps += 1
        self.optic = optic
        self.delta_focus = delta_focus
        self.num_steps = num_steps
        if fields == "all":
            fields = optic.fields.get_field_coords()
        self.fields = fields
        if wavelengths == "all":
            wavelengths = optic.wavelengths.get_wavelengths()
        elif wavelengths == "primary":
            wavelengths = [optic.primary_wavelength]
        self.wavelengths = wavelengths
        # absolute image-plane z positions (reference: through_focus.py:89-97)
        from optiland_tpu.core.system import positions as _positions

        nominal_z = float(
            np.ravel(np.asarray(_positions(optic.system.stack)))[-1]
        )
        self.positions = [
            nominal_z + (k - num_steps // 2) * delta_focus
            for k in range(num_steps)
        ]
        self.data = self._generate_through_focus_data()

    def _generate_through_focus_data(self):
        nominal = self.optic.surfaces.surfaces[-2].thickness
        results = []
        for k in range(self.num_steps):
            dz = (k - self.num_steps // 2) * self.delta_focus
            self.optic.surfaces.surfaces[-2].thickness = nominal + dz
            self.optic._invalidate()
            results.append(self._perform_analysis_at_focus())
        self.optic.surfaces.surfaces[-2].thickness = nominal
        self.optic._invalidate()
        return results

    def _perform_analysis_at_focus(self):
        raise NotImplementedError


class ThroughFocusSpotDiagram(ThroughFocusAnalysis):
    """Spot diagrams across focus
    (reference: analysis/through_focus_spot_diagram.py:29)."""

    def __init__(self, optic, delta_focus: float = 0.1, num_steps: int = 5,
                 fields="all", wavelengths="all", num_rings: int = 6,
                 distribution: str = "hexapolar"):
        self.num_rings = num_rings
        self.distribution = distribution
        super().__init__(optic, delta_focus, num_steps, fields, wavelengths)

    def _perform_analysis_at_focus(self):
        return SpotDiagram(
            self.optic, fields=self.fields, wavelengths=self.wavelengths,
            num_rings=self.num_rings, distribution=self.distribution,
        )

    def rms_through_focus(self):
        """(num_steps, num_fields, num_wavelengths) RMS radii."""
        return np.array([sd.rms_spot_radius() for sd in self.data])

    def view(self, figsize_per_plot=(3, 3)):
        import matplotlib.pyplot as plt

        nf, ns = len(self.fields), self.num_steps
        fig, axes = plt.subplots(
            nf, ns, sharex=True, sharey=True, squeeze=False,
            figsize=(ns * figsize_per_plot[0], nf * figsize_per_plot[1]),
        )
        for j, sd in enumerate(self.data):
            for i, row in enumerate(sd.data):
                for spot in row:
                    cx, cy = row[0].centroid
                    axes[i][j].scatter(spot.x - cx, spot.y - cy, s=1)
                axes[i][j].set_title(
                    f"dz={self.positions[j]:+.3f}", fontsize=7
                )
        fig.tight_layout()
        return fig, axes


class ThroughFocusMTF(ThroughFocusAnalysis):
    """Geometric MTF at one frequency across focus
    (reference: analysis/through_focus_mtf.py:27)."""

    def __init__(self, optic, freq: float, delta_focus: float = 0.05,
                 num_steps: int = 7, fields="all", wavelength="primary",
                 num_rays: int = 100, distribution: str = "uniform"):
        self.freq = freq
        self.num_rays = num_rays
        self.distribution = distribution
        if wavelength == "primary":
            wavelength = optic.primary_wavelength
        self._wavelength = wavelength
        super().__init__(optic, delta_focus, num_steps, fields, [wavelength])

    def _perform_analysis_at_focus(self):
        from optiland_tpu.mtf import GeometricMTF

        m = GeometricMTF(
            self.optic, fields=self.fields, wavelength=self._wavelength,
            num_rays=self.num_rays, distribution=self.distribution,
            max_freq=max(self.freq * 1.1, 1.0), num_points=64,
        )
        out = []
        freqs = np.asarray(m.freq)
        for tan, sag in m.mtf:
            out.append(
                (
                    float(np.interp(self.freq, freqs, np.asarray(tan))),
                    float(np.interp(self.freq, freqs, np.asarray(sag))),
                )
            )
        return out

    def view(self, figsize=(7, 4.5), ax=None):
        import matplotlib.pyplot as plt

        if ax is None:
            fig, ax = plt.subplots(figsize=figsize)
        else:
            fig = ax.figure
        arr = np.array(self.data)  # (steps, fields, 2)
        for i, field in enumerate(self.fields):
            ax.plot(self.positions, arr[:, i, 0], f"C{i}-", label=f"{field} T")
            ax.plot(self.positions, arr[:, i, 1], f"C{i}--", label=f"{field} S")
        ax.set_xlabel("Focus shift (mm)")
        ax.set_ylabel(f"MTF @ {self.freq} cyc/mm")
        ax.legend(fontsize=7)
        return fig, ax
