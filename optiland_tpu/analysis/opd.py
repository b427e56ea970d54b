"""OPD map, OPD fan, and Zernike-OPD analyses.

(reference: optiland/wavefront/opd.py:37, opd_fan.py:27, zernike_opd.py:21)
"""

from __future__ import annotations

import numpy as np

from optiland_tpu.wavefront import Wavefront


class OPD(Wavefront):
    """OPD map over the pupil for one field/wavelength
    (reference: wavefront/opd.py:37)."""

    def __init__(self, optic, field, wavelength, num_rings: int = 15,
                 strategy: str = "chief_ray", **kwargs):
        super().__init__(
            optic, fields=[field], wavelengths=[wavelength],
            num_rays=num_rings, distribution="hexapolar", strategy=strategy,
            **kwargs,
        )
        self.field = field
        self.wavelength = wavelength

    def rms(self) -> float:
        d = self.get_data(self.field, self.wavelength)
        valid = np.asarray(d.intensity) > 0
        return float(np.sqrt(np.mean(np.asarray(d.opd)[valid] ** 2)))

    def peak_to_valley(self) -> float:
        d = self.get_data(self.field, self.wavelength)
        valid = np.asarray(d.intensity) > 0
        opd = np.asarray(d.opd)[valid]
        return float(np.max(opd) - np.min(opd))

    def view(self, projection="2d", num_points: int = 256, ax=None):
        import matplotlib.pyplot as plt
        from scipy.interpolate import griddata

        d = self.get_data(self.field, self.wavelength)
        x = np.asarray(self.distribution.x)
        y = np.asarray(self.distribution.y)
        opd = np.asarray(d.opd)
        xi = np.linspace(-1, 1, num_points)
        Xg, Yg = np.meshgrid(xi, xi)
        Z = griddata((x, y), opd, (Xg, Yg), method="cubic")
        Z = np.where(Xg**2 + Yg**2 <= 1, Z, np.nan)
        if ax is None:
            fig, ax = plt.subplots()
        else:
            fig = ax.figure
        im = ax.imshow(Z, origin="lower", extent=(-1, 1, -1, 1), cmap="RdBu_r")
        fig.colorbar(im, ax=ax, label="OPD (waves)")
        return fig, ax


class OPDFan(Wavefront):
    """OPD along pupil x/y cross-sections (reference: wavefront/opd_fan.py:27)."""

    def __init__(self, optic, fields="all", wavelengths="all",
                 num_rays: int = 100):
        self.pupil_coord = np.linspace(-1, 1, num_rays)
        from optiland_tpu.core.distributions import CrossDistribution

        dist = CrossDistribution()
        dist.generate_points(num_rays)
        # cross: first block is the y-line (x=0), second the x-line (y=0)
        super().__init__(
            optic, fields=fields, wavelengths=wavelengths,
            distribution=dist, num_rays=num_rays,
        )
        self.num_rays = num_rays

    def view(self, figsize=(10, 3), axs=None):
        import matplotlib.pyplot as plt

        nf = len(self.fields)
        fig, axes = plt.subplots(nf, 2, squeeze=False,
                                 figsize=(figsize[0], figsize[1] * nf))
        n = self.num_rays
        for i, field in enumerate(self.fields):
            for wl in self.wavelengths:
                d = self.get_data(field, wl)
                opd = np.asarray(d.opd)
                inten = np.asarray(d.intensity)
                opd_y = np.where(inten[:n] > 0, opd[:n], np.nan)
                opd_x_block = opd[n:]
                int_x_block = inten[n:]
                opd_x = np.where(int_x_block > 0, opd_x_block, np.nan)
                axes[i][0].plot(self.pupil_coord, opd_y, label=f"{wl:.4f} um")
                px = self.pupil_coord
                if opd_x.shape[0] != px.shape[0]:
                    mid = px.shape[0] // 2
                    px = np.concatenate([px[:mid], px[mid + 1:]])
                axes[i][1].plot(px, opd_x, label=f"{wl:.4f} um")
            axes[i][0].set_title(f"field {field} (Py)")
            axes[i][1].set_title(f"field {field} (Px)")
        axes[0][0].legend(fontsize=6)
        fig.tight_layout()
        return fig, axes


class ZernikeOPD:
    """Zernike decomposition of the wavefront OPD
    (reference: wavefront/zernike_opd.py:21)."""

    def __init__(self, optic, field, wavelength, num_rings: int = 15,
                 zernike_type: str = "fringe", num_terms: int = 37,
                 strategy: str = "chief_ray"):
        from optiland_tpu.core.distributions import create_distribution
        from optiland_tpu.zernike import ZernikeFit

        self.opd_analysis = OPD(
            optic, field, wavelength, num_rings=num_rings, strategy=strategy
        )
        d = self.opd_analysis.get_data(field, wavelength)
        x = np.asarray(self.opd_analysis.distribution.x)
        y = np.asarray(self.opd_analysis.distribution.y)
        self.fit = ZernikeFit(
            x, y, np.asarray(d.opd), zernike_type=zernike_type,
            num_terms=num_terms,
        )
        self.coeffs = np.asarray(self.fit.coeffs)

    def view(self, ax=None):
        import matplotlib.pyplot as plt

        if ax is None:
            fig, ax = plt.subplots(figsize=(8, 4))
        else:
            fig = ax.figure
        ax.bar(np.arange(len(self.coeffs)), self.coeffs)
        ax.set_xlabel("Zernike term")
        ax.set_ylabel("Coefficient (waves)")
        return fig, ax
