"""Field-domain analyses: ray fans, distortion, field curvature, and
RMS-vs-field curves.

Numeric semantics mirror the reference analyses
(reference: optiland/analysis/ray_fan.py:20, distortion.py:24,
grid_distortion.py:26, field_curvature.py:24, rms_vs_field.py:26,121,
y_ybar.py:26, pupil_aberration.py:27).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from optiland_tpu.analysis.base import BaseAnalysis


class RayFan(BaseAnalysis):
    """Transverse ray aberration fans (reference: analysis/ray_fan.py:20)."""

    def __init__(self, optic, fields="all", wavelengths="all", num_points=256):
        # odd number of points so the chief ray is sampled
        self.num_points = num_points if num_points % 2 == 1 else num_points + 1
        if fields == "all":
            fields = optic.fields.get_field_coords()
        self.fields = fields
        super().__init__(optic, wavelengths)

    def _generate_data(self):
        data = {
            "Px": np.linspace(-1, 1, self.num_points),
            "Py": np.linspace(-1, 1, self.num_points),
        }
        for field in self.fields:
            Hx, Hy = field
            fkey = f"{tuple(field)}"
            data[fkey] = {}
            for wl in self.wavelengths:
                rays_x = self.optic.trace(
                    Hx=Hx, Hy=Hy, wavelength=wl,
                    num_rays=self.num_points, distribution="line_x",
                )
                rays_y = self.optic.trace(
                    Hx=Hx, Hy=Hy, wavelength=wl,
                    num_rays=self.num_points, distribution="line_y",
                )
                data[fkey][f"{wl}"] = {
                    "x": np.asarray(rays_x.x),
                    "intensity_x": np.asarray(rays_x.i),
                    "y": np.asarray(rays_y.y),
                    "intensity_y": np.asarray(rays_y.i),
                }
        return self._remove_distortion(data)

    def _remove_distortion(self, data):
        """Offset each fan by the primary-wavelength chief-ray intercept
        (reference: ray_fan.py:161-203)."""
        wave_ref = self.optic.primary_wavelength
        c = self.num_points // 2
        for field in self.fields:
            fkey = f"{tuple(field)}"
            ref = data[fkey][f"{wave_ref}"]
            ix, iy = ref["intensity_x"], ref["intensity_y"]
            x_off = (
                ref["x"][c] if ix[c] > 0
                else np.mean(ref["x"][ix > 0]) if (ix > 0).any() else 0.0
            )
            y_off = (
                ref["y"][c] if iy[c] > 0
                else np.mean(ref["y"][iy > 0]) if (iy > 0).any() else 0.0
            )
            for wl in self.wavelengths:
                d = data[fkey][f"{wl}"]
                d["x"] = d["x"] - x_off
                d["y"] = d["y"] - y_off
        return data

    def view(self, figsize=(10, 3.33), ax=None):
        import matplotlib.pyplot as plt

        nf = len(self.fields)
        fig, axes = plt.subplots(
            nf, 2, figsize=(figsize[0], figsize[1] * nf), squeeze=False
        )
        for i, field in enumerate(self.fields):
            fkey = f"{tuple(field)}"
            for wl in self.wavelengths:
                d = self.data[fkey][f"{wl}"]
                ey = np.where(d["intensity_y"] > 0, d["y"], np.nan)
                ex = np.where(d["intensity_x"] > 0, d["x"], np.nan)
                axes[i][0].plot(self.data["Py"], ey, label=f"{wl:.4f} um")
                axes[i][1].plot(self.data["Px"], ex, label=f"{wl:.4f} um")
            axes[i][0].set_title(f"Hy fan, field {field}")
            axes[i][1].set_title(f"Hx fan, field {field}")
        axes[0][0].legend(fontsize=6)
        fig.tight_layout()
        return fig, axes


class BestFitRayFan(RayFan):
    """Ray fan referenced to the best-fit sphere center
    (reference: analysis/ray_fan.py:247-320).

    Instead of recentering each fan on the primary-wavelength chief-ray
    intercept, the lateral (x, y) coordinates of the center of the
    wavefront's best-fit sphere (computed at the primary wavelength over a
    hexapolar pupil grid) become the origin. No chief-ray distortion
    removal is applied, so the fans show all aberrations — including
    distortion — relative to the point of optimal focus.
    """

    def __init__(self, optic, fields="all", wavelengths="all",
                 num_points: int = 256, num_rays_for_fit: int = 15):
        self.num_rays_for_fit = num_rays_for_fit
        super().__init__(optic, fields, wavelengths, num_points)

    def _generate_data(self):
        from optiland_tpu.core.distributions import create_distribution
        from optiland_tpu.wavefront import compute_wavefront_data

        dist = create_distribution("hexapolar")
        dist.generate_points(self.num_rays_for_fit)
        Px2d = jnp.asarray(dist.x)
        Py2d = jnp.asarray(dist.y)

        data = {
            "Px": np.linspace(-1, 1, self.num_points),
            "Py": np.linspace(-1, 1, self.num_points),
        }
        wave_ref = self.optic.primary_wavelength
        for field in self.fields:
            Hx, Hy = field
            fkey = f"{tuple(field)}"
            wdata = compute_wavefront_data(
                self.optic.system, Hx, Hy, wave_ref, Px2d, Py2d,
                strategy="best_fit",
            )
            ref_x = float(wdata.center[0])
            ref_y = float(wdata.center[1])
            data[fkey] = {}
            for wl in self.wavelengths:
                rays_x = self.optic.trace(
                    Hx=Hx, Hy=Hy, wavelength=wl,
                    num_rays=self.num_points, distribution="line_x",
                )
                rays_y = self.optic.trace(
                    Hx=Hx, Hy=Hy, wavelength=wl,
                    num_rays=self.num_points, distribution="line_y",
                )
                data[fkey][f"{wl}"] = {
                    "x": np.asarray(rays_x.x) - ref_x,
                    "intensity_x": np.asarray(rays_x.i),
                    "y": np.asarray(rays_y.y) - ref_y,
                    "intensity_y": np.asarray(rays_y.i),
                }
        return data


class Distortion(BaseAnalysis):
    """Distortion vs field (reference: analysis/distortion.py:24)."""

    def __init__(self, optic, wavelengths="all", num_points=128,
                 distortion_type="f-tan"):
        self.num_points = num_points
        self.distortion_type = distortion_type
        super().__init__(optic, wavelengths)

    def _generate_data(self):
        Hx = np.zeros(self.num_points)
        Hy = np.linspace(1e-10, 1, self.num_points)
        max_field_rad = np.radians(self.optic.fields.max_field)
        data = []
        for wl in self.wavelengths:
            res = self.optic.trace_generic(
                Hx=Hx, Hy=Hy, Px=np.zeros_like(Hx), Py=np.zeros_like(Hx),
                wavelength=wl,
            )
            yr = np.asarray(res.y)
            const = yr[0] / np.tan(1e-10 * max_field_rad)
            if self.distortion_type == "f-tan":
                yp = const * np.tan(Hy * max_field_rad)
            elif self.distortion_type == "f-theta":
                yp = const * Hy * max_field_rad
            else:
                raise ValueError('Distortion type must be "f-tan" or "f-theta"')
            data.append(100 * (yr - yp) / yp)
        return data

    def view(self, figsize=(7, 5.5), ax=None):
        import matplotlib.pyplot as plt

        if ax is None:
            fig, ax = plt.subplots(figsize=figsize)
        else:
            fig = ax.figure
        field = np.linspace(1e-10, self.optic.fields.max_field, self.num_points)
        for k, wl in enumerate(self.wavelengths):
            ax.plot(np.asarray(self.data[k]), field, label=f"{wl:.4f} um")
        ax.axvline(0, color="k", lw=1, ls="--")
        ax.set_xlabel("Distortion (%)")
        ax.set_ylabel("Field")
        ax.legend(fontsize=7)
        return fig, ax


class GridDistortion(BaseAnalysis):
    """Distortion of a rectangular field grid
    (reference: analysis/grid_distortion.py:26)."""

    def __init__(self, optic, wavelength="primary", num_points=10,
                 distortion_type="f-tan"):
        if wavelength == "primary":
            wavelength = optic.primary_wavelength
        self.wavelength = wavelength
        self.num_points = num_points
        self.distortion_type = distortion_type
        super().__init__(optic, [wavelength])

    def _generate_data(self):
        """Ideal grid from a paraxial-like small-field chief ray; real grid
        chief-centered (reference: grid_distortion.py:133-220)."""
        wl = self.wavelength
        chief = self.optic.trace_generic(
            Hx=np.zeros(1), Hy=np.zeros(1), Px=np.zeros(1), Py=np.zeros(1),
            wavelength=wl,
        )
        x_chief = float(np.ravel(np.asarray(chief.x))[0])
        y_chief = float(np.ravel(np.asarray(chief.y))[0])
        small = self.optic.trace_generic(
            Hx=np.zeros(1), Hy=np.full(1, 1e-10), Px=np.zeros(1),
            Py=np.zeros(1), wavelength=wl,
        )
        y_ref = float(np.ravel(np.asarray(small.y))[0])

        extent = np.sqrt(2) / 2
        H = np.linspace(-extent, extent, self.num_points)
        Hx, Hy = np.meshgrid(H, H)
        mf_rad = np.radians(self.optic.fields.max_field)
        if self.distortion_type == "f-tan":
            const = (y_ref - y_chief) / np.tan(1e-10 * mf_rad)
            xp = const * np.tan(Hx * mf_rad)
            yp = const * np.tan(Hy * mf_rad)
        elif self.distortion_type == "f-theta":
            const = (y_ref - y_chief) / (1e-10 * mf_rad)
            xp = const * Hx * mf_rad
            yp = const * Hy * mf_rad
        else:
            raise ValueError('Distortion type must be "f-tan" or "f-theta"')

        res = self.optic.trace_generic(
            Hx=Hx.ravel(), Hy=Hy.ravel(),
            Px=np.zeros(Hx.size), Py=np.zeros(Hx.size),
            wavelength=wl,
        )
        xr = np.asarray(res.x).reshape(Hx.shape) - x_chief
        yr = np.asarray(res.y).reshape(Hy.shape) - y_chief
        delta = np.hypot(xr - xp, yr - yp)
        rp = np.hypot(xp, yp)
        # guard the on-axis grid point (rp = 0 and delta = 0 there)
        rp_safe = np.where(rp == 0, 1.0, rp)
        return {
            "xr": xr, "yr": yr, "xp": xp, "yp": yp,
            "max_distortion": float(np.max(100 * delta / rp_safe)),
        }

    def view(self, figsize=(7, 5.5), ax=None):
        import matplotlib.pyplot as plt

        if ax is None:
            fig, ax = plt.subplots(figsize=figsize)
        else:
            fig = ax.figure
        d = self.data
        ax.plot(d["xp"], d["yp"], "k", lw=0.5)
        ax.plot(d["xp"].T, d["yp"].T, "k", lw=0.5)
        ax.plot(d["xr"], d["yr"], "C3", lw=0.7)
        ax.plot(d["xr"].T, d["yr"].T, "C3", lw=0.7)
        ax.set_title(f"Max distortion {d['max_distortion']:.3f}%")
        ax.set_aspect("equal")
        return fig, ax


class FieldCurvature(BaseAnalysis):
    """Tangential/sagittal parabasal focal surfaces
    (reference: analysis/field_curvature.py:24)."""

    def __init__(self, optic, wavelengths="all", num_points=128):
        self.num_points = num_points
        super().__init__(optic, wavelengths)

    def _generate_data(self):
        data = []
        for wl in self.wavelengths:
            data.append([
                self._parabasal(wl, tangential=True),
                self._parabasal(wl, tangential=False),
            ])
        return data

    def _parabasal(self, wavelength, tangential: bool, delta=1e-5):
        n = self.num_points
        Hx = np.zeros(2 * n)
        Hy = np.repeat(np.linspace(0, 1, n), 2)
        if tangential:
            Px = np.zeros(2 * n)
            Py = np.tile([-delta, delta], n)
        else:
            Px = np.tile([-delta, delta], n)
            Py = np.zeros(2 * n)
        res = self.optic.trace_generic(Hx, Hy, Px, Py, wavelength=wavelength)
        if tangential:
            A1, N1 = np.asarray(res.M)[::2], np.asarray(res.N)[::2]
            A2, N2 = np.asarray(res.M)[1::2], np.asarray(res.N)[1::2]
            c01, z01 = np.asarray(res.y)[::2], np.asarray(res.z)[::2]
            c02, z02 = np.asarray(res.y)[1::2], np.asarray(res.z)[1::2]
        else:
            A1, N1 = np.asarray(res.L)[::2], np.asarray(res.N)[::2]
            A2, N2 = np.asarray(res.L)[1::2], np.asarray(res.N)[1::2]
            c01, z01 = np.asarray(res.x)[::2], np.asarray(res.z)[::2]
            c02, z02 = np.asarray(res.x)[1::2], np.asarray(res.z)[1::2]
        t = (A2 * z01 - A2 * z02 - N2 * c01 + N2 * c02) / (A1 * N2 - A2 * N1)
        return t * N1

    def view(self, figsize=(8, 5.5), ax=None):
        import matplotlib.pyplot as plt

        if ax is None:
            fig, ax = plt.subplots(figsize=figsize)
        else:
            fig = ax.figure
        field = np.linspace(0, self.optic.fields.max_field, self.num_points)
        for k, wl in enumerate(self.wavelengths):
            ax.plot(self.data[k][0], field, f"C{k}-", label=f"{wl:.4f} um T")
            ax.plot(self.data[k][1], field, f"C{k}--", label=f"{wl:.4f} um S")
        ax.set_xlabel("Focal shift (mm)")
        ax.set_ylabel("Field")
        ax.legend(fontsize=7)
        return fig, ax


class RmsSpotSizeVsField(BaseAnalysis):
    """RMS spot size against field height (reference: rms_vs_field.py:26)."""

    def __init__(self, optic, num_fields=64, wavelengths="all", num_rings=6,
                 distribution="hexapolar"):
        self.num_fields = num_fields
        self.num_rings = num_rings
        self.distribution = distribution
        super().__init__(optic, wavelengths)

    def _generate_data(self):
        from optiland_tpu.analysis.spot import SpotDiagram

        Hy = np.linspace(0, 1, self.num_fields)
        fields = [(0.0, h) for h in Hy]
        sd = SpotDiagram(
            self.optic, fields=fields, wavelengths=self.wavelengths,
            num_rings=self.num_rings, distribution=self.distribution,
        )
        return {
            "Hy": Hy,
            "rms": np.array(sd.rms_spot_radius()),  # (F, W)
        }

    def view(self, figsize=(7, 4.5), ax=None):
        import matplotlib.pyplot as plt

        if ax is None:
            fig, ax = plt.subplots(figsize=figsize)
        else:
            fig = ax.figure
        field = self.data["Hy"] * self.optic.fields.max_field
        for k, wl in enumerate(self.wavelengths):
            ax.plot(field, self.data["rms"][:, k], label=f"{wl:.4f} um")
        ax.set_xlabel("Field")
        ax.set_ylabel("RMS spot size (mm)")
        ax.legend(fontsize=7)
        return fig, ax


class RmsWavefrontErrorVsField(BaseAnalysis):
    """RMS wavefront error against field height
    (reference: rms_vs_field.py:121)."""

    def __init__(self, optic, num_fields=32, wavelengths="all", num_rays=12,
                 distribution="hexapolar"):
        self.num_fields = num_fields
        self.num_rays = num_rays
        self.distribution = distribution
        super().__init__(optic, wavelengths)

    def _generate_data(self):
        from optiland_tpu.wavefront import Wavefront

        Hy = np.linspace(0, 1, self.num_fields)
        fields = [(0.0, h) for h in Hy]
        wf = Wavefront(
            self.optic, fields=fields, wavelengths=self.wavelengths,
            num_rays=self.num_rays, distribution=self.distribution,
        )
        rms = np.zeros((self.num_fields, len(self.wavelengths)))
        for i, f in enumerate(fields):
            for k, wl in enumerate(self.wavelengths):
                d = wf.get_data(f, wl)
                w = np.asarray(d.intensity) > 0
                opd = np.asarray(d.opd)[w]
                rms[i, k] = np.sqrt(np.mean(opd**2))
        return {"Hy": Hy, "rms": rms}

    def view(self, figsize=(7, 4.5), ax=None):
        import matplotlib.pyplot as plt

        if ax is None:
            fig, ax = plt.subplots(figsize=figsize)
        else:
            fig = ax.figure
        field = self.data["Hy"] * self.optic.fields.max_field
        for k, wl in enumerate(self.wavelengths):
            ax.plot(field, self.data["rms"][:, k], label=f"{wl:.4f} um")
        ax.set_xlabel("Field")
        ax.set_ylabel("RMS wavefront error (waves)")
        ax.legend(fontsize=7)
        return fig, ax


class YYbar(BaseAnalysis):
    """Marginal vs chief ray height diagram (reference: y_ybar.py:26)."""

    def __init__(self, optic, wavelength="primary"):
        if wavelength == "primary":
            wavelength = optic.primary_wavelength
        self.wavelength = wavelength
        super().__init__(optic, [wavelength])

    def _generate_data(self):
        ya, _ = self.optic.paraxial.marginal_ray()
        yb, _ = self.optic.paraxial.chief_ray()
        return {"y": np.ravel(np.asarray(ya)), "ybar": np.ravel(np.asarray(yb))}

    def view(self, figsize=(7, 5.5), ax=None):
        import matplotlib.pyplot as plt

        if ax is None:
            fig, ax = plt.subplots(figsize=figsize)
        else:
            fig = ax.figure
        ax.plot(self.data["ybar"], self.data["y"], "o-")
        ax.set_xlabel("Chief ray height (ybar)")
        ax.set_ylabel("Marginal ray height (y)")
        return fig, ax


class PupilAberration(BaseAnalysis):
    """Real vs paraxial entrance pupil mismatch
    (reference: pupil_aberration.py:27)."""

    def __init__(self, optic, fields="all", wavelengths="all", num_points=128):
        self.num_points = num_points if num_points % 2 == 1 else num_points + 1
        if fields == "all":
            fields = optic.fields.get_field_coords()
        self.fields = fields
        super().__init__(optic, wavelengths)

    def _generate_data(self):
        """Percent deviation of the real stop intercept from the paraxial
        one, normalized by the paraxial stop semi-diameter, for rays along
        both pupil axes; vignetted rays are NaN (reference:
        pupil_aberration.py:180-236)."""
        from optiland_tpu.core import paraxial as px

        system = self.optic.system
        stop_idx = system.cfg.stop_index
        # The paraxial reference is deliberately evaluated at the PRIMARY
        # wavelength for every analyzed wavelength (reference:
        # pupil_aberration.py:6,33 — "deviation ... relative to the
        # paraxial pupil at the primary wavelength"); goldens confirm.
        wl0 = float(self.optic.primary_wavelength)
        P = np.linspace(-1, 1, self.num_points)

        y_unit, _ = px.trace(system, 0.0, 1.0, wl0)
        d = float(np.ravel(np.asarray(y_unit[stop_idx]))[0])
        y_grid, _ = px.trace(system, 0.0, P, wl0)
        parax_ref = np.asarray(y_grid[stop_idx])

        data = {"Px": P, "Py": P}
        for field in self.fields:
            fkey = f"{tuple(field)}"
            data[fkey] = {}
            for wl in self.wavelengths:
                entry = {}
                for axis, dist in (("x", "line_x"), ("y", "line_y")):
                    res = self.optic.trace(
                        Hx=field[0], Hy=field[1], wavelength=wl,
                        num_rays=self.num_points, distribution=dist,
                    )
                    real = np.asarray(res.history[axis])[stop_idx]
                    inten = np.asarray(res.history["intensity"])[stop_idx]
                    err = (parax_ref - real) / d * 100
                    entry[axis] = np.where(inten == 0, np.nan, err)
                data[fkey][f"{wl}"] = entry
        return data

    def view(self, figsize=(7, 4.5), ax=None):
        import matplotlib.pyplot as plt

        nf = len(self.fields)
        fig, axes = plt.subplots(nf, 1, figsize=(figsize[0], figsize[1] * nf),
                                 squeeze=False)
        for i, field in enumerate(self.fields):
            fkey = f"{tuple(field)}"
            for wl in self.wavelengths:
                d = self.data[fkey][f"{wl}"]
                axes[i][0].plot(self.data["Py"], d["y"], label=f"{wl:.4f} um")
            axes[i][0].set_title(f"field {field}")
            axes[i][0].set_ylabel("Pupil aberration (%)")
        axes[0][0].legend(fontsize=7)
        fig.tight_layout()
        return fig, axes
