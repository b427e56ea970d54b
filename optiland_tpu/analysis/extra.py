"""Detector and field-scan analyses.

IncoherentIrradiance / RadiantIntensity accumulate ray power onto spatial /
angular detector grids with a differentiable bilinear scatter-add (the
reference only does this in its torch-grad mode and uses a hard histogram
otherwise; here the soft binning is the single path, so gradients always
flow) (reference: optiland/analysis/irradiance.py:1-668, intensity.py:1-682,
angle_vs_height.py:1-480, mtf_vs_field.py:1-224,
visualization/analysis/surface_sag.py:33-200).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from optiland_tpu.analysis.base import BaseAnalysis


def bilinear_scatter(x, y, power, x_edges, y_edges):
    """Differentiable power accumulation onto a (ny, nx) pixel grid.

    Each ray deposits its power bilinearly onto the 4 neighbouring pixel
    centers. Returns the (ny, nx) power map.
    """
    nx = x_edges.shape[0] - 1
    ny = y_edges.shape[0] - 1
    dx = x_edges[1] - x_edges[0]
    dy = y_edges[1] - y_edges[0]
    # continuous pixel-center coordinates
    fx = (x - x_edges[0]) / dx - 0.5
    fy = (y - y_edges[0]) / dy - 0.5
    ix0 = jnp.floor(fx).astype(int)
    iy0 = jnp.floor(fy).astype(int)
    wx1 = fx - ix0
    wy1 = fy - iy0
    out = jnp.zeros((ny, nx))
    for di, wxi in ((0, 1 - wx1), (1, wx1)):
        for dj, wyj in ((0, 1 - wy1), (1, wy1)):
            ii = ix0 + di
            jj = iy0 + dj
            ok = (ii >= 0) & (ii < nx) & (jj >= 0) & (jj < ny)
            w = jnp.where(ok, wxi * wyj * power, 0.0)
            out = out.at[
                jnp.clip(jj, 0, ny - 1), jnp.clip(ii, 0, nx - 1)
            ].add(w)
    return out


class IncoherentIrradiance(BaseAnalysis):
    """Power-per-area maps on a detector surface
    (reference: analysis/irradiance.py:27)."""

    def __init__(self, optic, num_rays: int = 128, res=(128, 128),
                 px_size=None, detector_surface: int = -1, *, fields="all",
                 wavelengths="all", distribution: str = "random",
                 user_initial_rays=None, source=None):
        if fields == "all":
            fields = optic.fields.get_field_coords()
        self.fields = tuple(fields)
        if source is not None and user_initial_rays is not None:
            raise ValueError(
                "Cannot specify both 'source' and 'user_initial_rays'."
            )
        if source is not None:
            user_initial_rays = source.generate_rays(num_rays)
            self.fields = ((0.0, 0.0),)
        self.user_initial_rays = user_initial_rays
        self.num_rays = num_rays
        self.npix_x, self.npix_y = res
        self.px_size = px_size
        self.detector_surface = int(detector_surface)
        self.distribution = distribution

        surf = optic.surfaces.surfaces[self.detector_surface]
        ap = surf.aperture
        if ap is None:
            raise ValueError(
                "Detector surface has no physical aperture - set one "
                "(e.g. RectangularAperture) so that the detector size is "
                "defined."
            )
        if isinstance(ap, (int, float)):
            r = float(ap) / 2
            self.extent = (-r, r, -r, r)
        elif hasattr(ap, "extent"):
            self.extent = tuple(float(v) for v in ap.extent)
        else:
            r = float(getattr(ap, "r_max", 1.0))
            self.extent = (-r, r, -r, r)
        super().__init__(optic, wavelengths)

    def _bin(self, x, y, power):
        x_min, x_max, y_min, y_max = self.extent
        if self.px_size is not None:
            dx, dy = self.px_size
            x_edges = jnp.arange(x_min, x_max + 0.5 * dx, dx)
            y_edges = jnp.arange(y_min, y_max + 0.5 * dy, dy)
            self.npix_x, self.npix_y = x_edges.shape[0] - 1, y_edges.shape[0] - 1
            pixel_area = dx * dy
        else:
            x_edges = jnp.linspace(x_min, x_max, self.npix_x + 1)
            y_edges = jnp.linspace(y_min, y_max, self.npix_y + 1)
            pixel_area = float(
                (x_edges[1] - x_edges[0]) * (y_edges[1] - y_edges[0])
            )
        pmap = bilinear_scatter(x, y, power, x_edges, y_edges)
        return pmap / pixel_area, np.asarray(x_edges), np.asarray(y_edges)

    def _generate_data(self):
        from optiland_tpu.core import trace as trace_core
        from optiland_tpu.core.system import positions

        data = []
        z_det = positions(self.optic.system.stack)[self.detector_surface]
        for field in self.fields:
            block = []
            for wl in self.wavelengths:
                if self.user_initial_rays is None:
                    r = self.optic.trace(
                        Hx=field[0], Hy=field[1], wavelength=float(wl),
                        num_rays=self.num_rays,
                        distribution=self.distribution,
                    )
                    x, y, power = r.x, r.y, r.i
                else:
                    final, hist = trace_core.trace(
                        self.optic.system, self.user_initial_rays,
                        record=True,
                    )
                    s = self.detector_surface
                    x = hist["x"][s]
                    y = hist["y"][s]
                    power = hist["intensity"][s]
                ok = jnp.isfinite(x) & jnp.isfinite(y) & (power > 0)
                block.append(self._bin(
                    jnp.where(ok, x, self.extent[0] - 1e6),
                    jnp.where(ok, y, self.extent[2] - 1e6),
                    jnp.where(ok, power, 0.0),
                ))
            data.append(block)
        return data

    def peak_irradiance(self):
        return [[float(jnp.max(irr)) for irr, *_ in block]
                for block in self.data]

    def view(self, figsize=(6, 5), cmap="inferno", normalize=True, ax=None):
        import matplotlib.pyplot as plt

        nf, nw = len(self.data), len(self.data[0])
        fig, axs = plt.subplots(nf, nw, figsize=figsize, squeeze=False)
        for i, block in enumerate(self.data):
            for j, (irr, xe, ye) in enumerate(block):
                img = np.asarray(irr)
                if normalize and img.max() > 0:
                    img = img / img.max()
                im = axs[i][j].imshow(
                    img, origin="lower", cmap=cmap,
                    extent=[xe[0], xe[-1], ye[0], ye[-1]],
                )
                fig.colorbar(im, ax=axs[i][j])
        return fig, axs


class RadiantIntensity(BaseAnalysis):
    """Angular power maps (W/sr with use_absolute_units)
    (reference: analysis/intensity.py:36)."""

    def __init__(self, optic, num_rays: int = 128, num_angular_bins_X=64,
                 num_angular_bins_Y=64, angle_X_min=-90.0, angle_X_max=90.0,
                 angle_Y_min=-90.0, angle_Y_max=90.0,
                 use_absolute_units=False, reference_surface_index=-1, *,
                 fields="all", wavelengths="all", distribution="random",
                 user_initial_rays=None, source=None):
        if fields == "all":
            fields = optic.fields.get_field_coords()
        self.fields = tuple(fields)
        if source is not None and user_initial_rays is not None:
            raise ValueError(
                "Cannot specify both 'source' and 'user_initial_rays'."
            )
        if source is not None:
            user_initial_rays = source.generate_rays(num_rays)
            self.fields = ((0.0, 0.0),)
        self.user_initial_rays = user_initial_rays
        self.num_rays = num_rays
        self.nbx, self.nby = num_angular_bins_X, num_angular_bins_Y
        self.ax_min, self.ax_max = float(angle_X_min), float(angle_X_max)
        self.ay_min, self.ay_max = float(angle_Y_min), float(angle_Y_max)
        self.use_absolute_units = use_absolute_units
        self.reference_surface_index = int(reference_surface_index)
        self.distribution = distribution
        super().__init__(optic, wavelengths)

    def _generate_data(self):
        from optiland_tpu.core import trace as trace_core

        data = []
        for field in self.fields:
            block = []
            for wl in self.wavelengths:
                if self.user_initial_rays is None:
                    r = self.optic.trace(
                        Hx=field[0], Hy=field[1], wavelength=float(wl),
                        num_rays=self.num_rays,
                        distribution=self.distribution,
                    )
                    L, M, N, power = r.L, r.M, r.N, r.i
                else:
                    final, hist = trace_core.trace(
                        self.optic.system, self.user_initial_rays,
                        record=True,
                    )
                    s = self.reference_surface_index
                    L = hist["L"][s]
                    M = hist["M"][s]
                    N = hist["N"][s]
                    power = hist["intensity"][s]
                block.append(self._bin(L, M, N, power))
            data.append(block)
        return data

    def _bin(self, L, M, N, power):
        ax_edges = jnp.linspace(self.ax_min, self.ax_max, self.nbx + 1)
        ay_edges = jnp.linspace(self.ay_min, self.ay_max, self.nby + 1)
        ok = jnp.isfinite(L) & jnp.isfinite(N) & (power > 0)
        angle_x = jnp.rad2deg(jnp.arctan2(L, N))
        angle_y = jnp.rad2deg(jnp.arctan2(M, N))
        pmap = bilinear_scatter(
            jnp.where(ok, angle_x, self.ax_min - 1e6),
            jnp.where(ok, angle_y, self.ay_min - 1e6),
            jnp.where(ok, power, 0.0), ax_edges, ay_edges,
        )
        if self.use_absolute_units:
            # true solid angle of each (tan-mapped) angular pixel
            # (reference: intensity.py:193-214)
            dx = jnp.deg2rad(ax_edges[1] - ax_edges[0])
            dy = jnp.deg2rad(ay_edges[1] - ay_edges[0])
            axc = jnp.deg2rad((ax_edges[:-1] + ax_edges[1:]) / 2)
            ayc = jnp.deg2rad((ay_edges[:-1] + ay_edges[1:]) / 2)
            AX, AY = jnp.meshgrid(axc, ayc)
            t2x, t2y = jnp.tan(AX) ** 2, jnp.tan(AY) ** 2
            jac = ((1 + t2x) * (1 + t2y)) / (1 + t2x + t2y) ** 1.5
            omega = jac * dx * dy
            pmap = jnp.where(omega > 1e-12, pmap / omega, 0.0)
        return pmap, np.asarray(ax_edges), np.asarray(ay_edges)

    def peak_intensity_values(self):
        return [[float(jnp.max(entry[0])) for entry in block]
                for block in self.data]

    def view(self, figsize=(6, 5), cmap="inferno", ax=None):
        import matplotlib.pyplot as plt

        nf, nw = len(self.data), len(self.data[0])
        fig, axs = plt.subplots(nf, nw, figsize=figsize, squeeze=False)
        for i, block in enumerate(self.data):
            for j, (pmap, xe, ye) in enumerate(block):
                im = axs[i][j].imshow(
                    np.asarray(pmap), origin="lower", cmap=cmap,
                    extent=[xe[0], xe[-1], ye[0], ye[-1]],
                )
                fig.colorbar(im, ax=axs[i][j])
                axs[i][j].set_xlabel("angle X (deg)")
                axs[i][j].set_ylabel("angle Y (deg)")
        return fig, axs


class BaseAngleVsHeightAnalysis(BaseAnalysis):
    """Incident angle vs image height scans
    (reference: analysis/angle_vs_height.py:96)."""

    def __init__(self, optic, surface_idx: int = -1, axis: int = 1,
                 wavelength="primary", num_points: int = 128, **kwargs):
        self.surface_idx = surface_idx
        self.axis = axis
        self.num_points = num_points
        if wavelength == "primary":
            wavelength = float(optic.primary_wavelength)
        super().__init__(optic, wavelengths=[wavelength])

    def _get_trace_coordinates(self, scan):
        raise NotImplementedError

    def _generate_data(self):
        scan = np.linspace(-1, 1, self.num_points)
        Hx, Hy, Px, Py, label = self._get_trace_coordinates(scan)
        wl = float(self.wavelengths[0])
        r = self.optic.trace_generic(
            Hx=Hx, Hy=Hy, Px=Px, Py=Py, wavelength=wl
        )
        s = self.surface_idx
        if self.axis == 1:
            dirc = r.history["M"][s]
            height = r.history["y"][s]
        else:
            dirc = r.history["L"][s]
            height = r.history["x"][s]
        angle = jnp.arcsin(dirc)
        if label == "Pupil":
            key = (float(Px[0]), float(Py[0]), wl)
        else:
            key = (float(Hx[0]), float(Hy[0]), wl)
        return {
            key: {
                "height": np.asarray(height),
                "angle": np.asarray(angle),
                "fixed_coordinates": label,
                "scan_range": scan,
            }
        }

    def view(self, figsize=(8, 5.5), ax=None, **kwargs):
        import matplotlib.pyplot as plt

        if ax is None:
            fig, ax = plt.subplots(figsize=figsize)
        else:
            fig = ax.figure
        for key, d in self.data.items():
            ax.plot(d["height"], np.degrees(d["angle"]),
                    label=f"{d['fixed_coordinates']} {key[:2]}")
        ax.set_xlabel("Image Height in Millimeters")
        ax.set_ylabel("Incident Angle in Degrees")
        ax.grid(alpha=0.25)
        ax.legend(fontsize=8)
        return fig, ax


class PupilIncidentAngleVsHeight(BaseAngleVsHeightAnalysis):
    """Scan the pupil at a fixed field
    (reference: angle_vs_height.py:340-400)."""

    def __init__(self, optic, field=(0, 0), **kwargs):
        self.field = field
        super().__init__(optic, **kwargs)

    def _get_trace_coordinates(self, scan):
        hx, hy = self.field
        Hx = np.full_like(scan, hx)
        Hy = np.full_like(scan, hy)
        if self.axis == 1:
            return Hx, Hy, np.zeros_like(scan), scan, "Field"
        return Hx, Hy, scan, np.zeros_like(scan), "Field"


class FieldIncidentAngleVsHeight(BaseAngleVsHeightAnalysis):
    """Scan the field at a fixed pupil point
    (reference: angle_vs_height.py:430-480)."""

    def __init__(self, optic, pupil=(0, 0), **kwargs):
        self.pupil = pupil
        super().__init__(optic, **kwargs)

    def _get_trace_coordinates(self, scan):
        px, py = self.pupil
        Px = np.full_like(scan, px)
        Py = np.full_like(scan, py)
        if self.axis == 1:
            return np.zeros_like(scan), scan, Px, Py, "Pupil"
        return scan, np.zeros_like(scan), Px, Py, "Pupil"


class MTFvsField(BaseAnalysis):
    """Sampled MTF vs normalized field height at given spatial frequencies
    (reference: analysis/mtf_vs_field.py:20)."""

    MAX_FREQUENCIES = 5
    MAX_WAVELENGTHS = 3

    def __init__(self, optic, frequencies, num_fields: int = 32,
                 wavelengths="all", num_rays: int = 128,
                 override_limits: bool = False):
        self.frequencies = list(frequencies)
        self.num_fields = num_fields
        self.num_rays = num_rays
        if not override_limits:
            if len(self.frequencies) > self.MAX_FREQUENCIES:
                raise ValueError(
                    f"Number of frequencies ({len(self.frequencies)}) "
                    f"exceeds the recommended limit of "
                    f"{self.MAX_FREQUENCIES} for clean plots. Set "
                    "override_limits=True to bypass this check."
                )
        super().__init__(optic, wavelengths)

    def _generate_data(self):
        from optiland_tpu.mtf import SampledMTF

        fields = [(0.0, float(hy))
                  for hy in np.linspace(0.0, 1.0, self.num_fields)]
        self._field_coords = np.asarray(fields)
        pairs = []
        for f in self.frequencies:
            pairs.append((f, 0.0))
            pairs.append((0.0, f))
        results = []
        for wl in self.wavelengths:
            wl_res = [
                {"tangential": [], "sagittal": []} for _ in self.frequencies
            ]
            for field in fields:
                sm = SampledMTF(
                    self.optic, field, float(wl), num_rays=self.num_rays
                )
                vals = sm.calculate_mtf(pairs)
                for i in range(len(self.frequencies)):
                    wl_res[i]["tangential"].append(vals[2 * i])
                    wl_res[i]["sagittal"].append(vals[2 * i + 1])
            for i in range(len(self.frequencies)):
                wl_res[i]["tangential"] = np.asarray(wl_res[i]["tangential"])
                wl_res[i]["sagittal"] = np.asarray(wl_res[i]["sagittal"])
            results.append(wl_res)
        return results

    def view(self, figsize=(8, 5), ax=None):
        import matplotlib.pyplot as plt

        if ax is None:
            fig, ax = plt.subplots(figsize=figsize)
        else:
            fig = ax.figure
        hy = self._field_coords[:, 1]
        for w, wl_res in enumerate(self.data):
            for i, f in enumerate(self.frequencies):
                ax.plot(hy, wl_res[i]["tangential"], f"C{i}-",
                        label=f"{f} c/mm T (wl {w})")
                ax.plot(hy, wl_res[i]["sagittal"], f"C{i}--",
                        label=f"{f} c/mm S (wl {w})")
        ax.set_xlabel("Normalized field")
        ax.set_ylabel("Modulation")
        ax.set_ylim(0, 1)
        ax.legend(fontsize=7)
        return fig, ax


class SurfaceSagViewer:
    """2-D sag map + cross-section profiles of one surface
    (reference: visualization/analysis/surface_sag.py:33)."""

    def __init__(self, optic):
        self.optic = optic

    def view(self, surface_index: int, y_cross_section: float = 0.0,
             x_cross_section: float = 0.0, max_extent=None,
             num_points_grid: int = 50, buffer_factor: float = 1.1,
             fig_to_plot_on=None):
        import matplotlib.pyplot as plt

        from optiland_tpu.core import geometry as geom

        system = self.optic.system
        stack, cfg = system.stack, system.cfg
        s = surface_index
        if max_extent is None:
            ap = float(np.asarray(stack.ap_max)[s])
            if not np.isfinite(ap):
                ap = 10.0
            max_extent = ap * buffer_factor
        lin = np.linspace(-max_extent, max_extent, num_points_grid)
        X, Y = np.meshgrid(lin, lin)
        aux = cfg.geom_aux[s] if cfg.geom_aux is not None else None
        Z = geom.sag_static(
            cfg.geom_codes[s], stack.radius[s], stack.conic[s],
            stack.coeffs[s], jnp.asarray(X.ravel()), jnp.asarray(Y.ravel()),
            p1=stack.geo_p1[s], p2=stack.geo_p2[s], aux=aux,
        ).reshape(X.shape)
        Zx = geom.sag_static(
            cfg.geom_codes[s], stack.radius[s], stack.conic[s],
            stack.coeffs[s], jnp.asarray(lin),
            jnp.full_like(jnp.asarray(lin), y_cross_section),
            p1=stack.geo_p1[s], p2=stack.geo_p2[s], aux=aux,
        )
        Zy = geom.sag_static(
            cfg.geom_codes[s], stack.radius[s], stack.conic[s],
            stack.coeffs[s],
            jnp.full_like(jnp.asarray(lin), x_cross_section),
            jnp.asarray(lin),
            p1=stack.geo_p1[s], p2=stack.geo_p2[s], aux=aux,
        )
        fig = fig_to_plot_on or plt.figure(figsize=(9, 9))
        if fig_to_plot_on:
            fig.clear()
        axs = fig.subplots(2, 2)
        im = axs[0][0].imshow(
            np.asarray(Z), origin="lower",
            extent=[-max_extent, max_extent, -max_extent, max_extent],
            cmap="viridis",
        )
        fig.colorbar(im, ax=axs[0][0])
        axs[0][0].set_title(f"Sag map, surface {s}")
        axs[0][1].plot(lin, np.asarray(Zy))
        axs[0][1].set_title(f"Y profile @ x={x_cross_section}")
        axs[1][0].plot(lin, np.asarray(Zx))
        axs[1][0].set_title(f"X profile @ y={y_cross_section}")
        axs[1][1].axis("off")
        fig.tight_layout()
        return fig, axs
