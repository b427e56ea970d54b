"""2D system cross-section viewer with traced ray overlays.

(reference: optiland/visualization/system/optic_viewer.py:24,
rays.py Rays2D:19, surface.py Surface2D:19, lens.py Lens2D:19)
"""

from __future__ import annotations

import numpy as np

from optiland_tpu.core import geometry as geom_mod
from optiland_tpu.core.system import positions


def _semi_apertures(optic):
    """Estimated clear semi-diameters from marginal + chief ray heights
    (reference: optic/optic_updater.py:206-223 update_paraxial)."""
    ya, _ = optic.paraxial.marginal_ray()
    yb, _ = optic.paraxial.chief_ray()
    ya = np.abs(np.ravel(np.asarray(ya)))
    yb = np.abs(np.ravel(np.asarray(yb)))
    return ya + yb


def _surface_profile(optic, idx, semi, num=64):
    """(y, z) cross-section points of surface idx in global coordinates."""
    system = optic.system
    stack, cfg = system.stack, system.cfg
    pos = np.asarray(positions(stack))
    y = np.linspace(-semi, semi, num)
    z_loc = np.asarray(
        geom_mod.sag_static(
            cfg.geom_codes[idx],
            stack.radius[idx],
            stack.conic[idx],
            stack.coeffs[idx],
            np.zeros_like(y),
            y,
            p1=stack.geo_p1[idx],
            p2=stack.geo_p2[idx],
            aux=cfg.geom_aux[idx] if cfg.geom_aux else None,
        )
    )
    return y, z_loc + pos[idx] + float(stack.dz[idx])


def draw_system(
    optic,
    fields="all",
    wavelengths="primary",
    num_rays: int = 3,
    distribution: str = "line_y",
    figsize=(10, 4),
    ax=None,
):
    """Draw the lens cross-section with traced rays
    (reference: Optic.draw, optic/optic.py:566)."""
    import matplotlib.pyplot as plt

    if ax is None:
        fig, ax = plt.subplots(figsize=figsize)
    else:
        fig = ax.figure

    if fields == "all":
        fields = optic.fields.get_field_coords()
    if wavelengths == "primary":
        wavelengths = [optic.primary_wavelength]
    elif wavelengths == "all":
        wavelengths = optic.wavelengths.get_wavelengths()

    semis = _semi_apertures(optic)
    n_surf = optic.surfaces.num_surfaces

    # Ray paths from per-surface trace history
    for fi, (Hx, Hy) in enumerate(fields):
        for wl in wavelengths:
            res = optic.trace(
                Hx=Hx, Hy=Hy, wavelength=wl, num_rays=num_rays,
                distribution=distribution,
            )
            zs = np.asarray(res.history["z"])  # (S, R)
            ys = np.asarray(res.history["y"])
            inten = np.asarray(res.history["intensity"])
            ys = np.where(inten > 0, ys, np.nan)
            ax.plot(zs[1:], ys[1:], color=f"C{fi}", lw=0.8, alpha=0.8)

    # Surface profiles and lens edges
    mats = [s._material_obj for s in optic.surfaces.surfaces]
    prev_profile = None
    for idx in range(1, n_surf):
        semi = float(semis[idx]) * 1.1 if idx < len(semis) else 1.0
        y, z = _surface_profile(optic, idx, max(semi, 1e-6))
        ax.plot(z, y, "k", lw=1.0)
        # shade glass between this surface and the previous when the medium
        # before this surface is not air
        from optiland_tpu.materials import AIR

        if prev_profile is not None and mats[idx - 1] is not AIR:
            yp, zp = prev_profile
            ax.fill(
                np.concatenate([zp, z[::-1]]),
                np.concatenate([yp, y[::-1]]),
                alpha=0.25, color="#9eccf2", lw=0,
            )
            # connect edges
            ax.plot([zp[0], z[0]], [yp[0], y[0]], "k", lw=1.0)
            ax.plot([zp[-1], z[-1]], [yp[-1], y[-1]], "k", lw=1.0)
        prev_profile = (y, z)

    ax.set_xlabel("z (mm)")
    ax.set_ylabel("y (mm)")
    ax.set_aspect("equal", adjustable="datalim")
    return fig, ax


class OpticViewer:
    """Class wrapper around draw_system
    (reference: visualization/system/optic_viewer.py:24)."""

    def __init__(self, optic):
        self.optic = optic

    def view(self, **kwargs):
        return draw_system(self.optic, **kwargs)
