"""3D system viewer: surfaces of revolution + traced ray polylines.

Same component family and API as the reference's VTK-based 3D stack —
``OpticViewer3D``, ``Rays3D``, ``Surface3D``, ``Lens3D``, ``Mirror3D``,
``InteractionManager`` (reference:
optiland/visualization/system/optic_viewer_3d.py:22, rays.py:287,
surface.py:123, lens.py:221, mirror.py:14, interaction.py:18) — rendered
with matplotlib's 3D axes so it runs headless and dependency-free (VTK is
not available in this environment). Surface meshes are evaluated from the
compiled system's sag tables, so every geometry family (including
freeforms, which are NOT surfaces of revolution) renders its true shape.
"""

from __future__ import annotations

import numpy as np

from optiland_tpu.core import geometry as geom_mod
from optiland_tpu.core.system import positions
from optiland_tpu.visualization.viewer import _semi_apertures


def _sag_grid(optic, idx, semi, n_r=24, n_t=49):
    """(X, Y, Z) global-coordinate mesh of surface ``idx``."""
    system = optic.system
    stack, cfg = system.stack, system.cfg
    pos = np.asarray(positions(stack))
    r = np.linspace(0.0, semi, n_r)
    t = np.linspace(0.0, 2 * np.pi, n_t)
    R, T = np.meshgrid(r, t)
    X = R * np.cos(T)
    Y = R * np.sin(T)
    Z = np.asarray(
        geom_mod.sag_static(
            cfg.geom_codes[idx],
            stack.radius[idx],
            stack.conic[idx],
            stack.coeffs[idx],
            X,
            Y,
            p1=stack.geo_p1[idx],
            p2=stack.geo_p2[idx],
            aux=cfg.geom_aux[idx] if cfg.geom_aux else None,
        )
    )
    dx = float(stack.dx[idx])
    dy = float(stack.dy[idx])
    dz = float(stack.dz[idx])
    return X + dx, Y + dy, Z + pos[idx] + dz


class Surface3D:
    """Mesh of one surface (reference: system/surface.py:123)."""

    def __init__(self, optic, index, semi=None):
        self.optic = optic
        self.index = index
        self.semi = semi

    def mesh(self):
        semi = self.semi
        if semi is None:
            semi = float(_semi_apertures(self.optic)[self.index]) * 1.1
        return _sag_grid(self.optic, self.index, max(semi, 1e-6))

    def plot(self, ax, color="#b0c4d8", alpha=0.35):
        X, Y, Z = self.mesh()
        ax.plot_surface(
            Z, X, Y, color=color, alpha=alpha, linewidth=0,
            antialiased=False, shade=True,
        )


class Lens3D:
    """A glass element: two surfaces + edge wall
    (reference: system/lens.py:221)."""

    def __init__(self, optic, idx_front, idx_back, semi=None):
        self.front = Surface3D(optic, idx_front, semi)
        self.back = Surface3D(optic, idx_back, semi)

    def plot(self, ax, color="#9eccf2", alpha=0.35):
        Xf, Yf, Zf = self.front.mesh()
        Xb, Yb, Zb = self.back.mesh()
        ax.plot_surface(Zf, Xf, Yf, color=color, alpha=alpha, linewidth=0)
        ax.plot_surface(Zb, Xb, Yb, color=color, alpha=alpha, linewidth=0)
        # edge wall: connect outer rings
        ax.plot_surface(
            np.stack([Zf[:, -1], Zb[:, -1]]),
            np.stack([Xf[:, -1], Xb[:, -1]]),
            np.stack([Yf[:, -1], Yb[:, -1]]),
            color=color, alpha=alpha, linewidth=0,
        )


class Mirror3D(Surface3D):
    """Reflective surface rendered opaque metallic
    (reference: system/mirror.py:14)."""

    def plot(self, ax, color="#c9c9cf", alpha=0.9):
        super().plot(ax, color=color, alpha=alpha)


class Rays3D:
    """Traced ray polylines in 3D (reference: system/rays.py:287)."""

    def __init__(self, optic, fields="all", wavelengths="primary",
                 num_rays=24, distribution="hexapolar"):
        self.optic = optic
        self.fields = fields
        self.wavelengths = wavelengths
        self.num_rays = num_rays
        self.distribution = distribution

    def plot(self, ax):
        optic = self.optic
        fields = self.fields
        if fields == "all":
            fields = optic.fields.get_field_coords()
        wavelengths = self.wavelengths
        if wavelengths == "primary":
            wavelengths = [optic.primary_wavelength]
        elif wavelengths == "all":
            wavelengths = optic.wavelengths.get_wavelengths()
        for fi, (Hx, Hy) in enumerate(fields):
            for wl in wavelengths:
                res = optic.trace(
                    Hx=Hx, Hy=Hy, wavelength=wl, num_rays=self.num_rays,
                    distribution=self.distribution,
                )
                xs = np.asarray(res.history["x"])
                ys = np.asarray(res.history["y"])
                zs = np.asarray(res.history["z"])
                inten = np.asarray(res.history["intensity"])
                ys = np.where(inten > 0, ys, np.nan)
                n_plot = min(xs.shape[1], 32)
                sel = np.linspace(0, xs.shape[1] - 1, n_plot).astype(int)
                for r in sel:
                    ax.plot(
                        zs[1:, r], xs[1:, r], ys[1:, r],
                        color=f"C{fi}", lw=0.6, alpha=0.7,
                    )


class InteractionManager:
    """Pick/hover event hookup for the 3D axes
    (reference: system/interaction.py:18 — VTK interactor; here a thin
    matplotlib event-dispatch with the same register/handle surface)."""

    def __init__(self, figure):
        self.figure = figure
        self._handlers = {}
        self._cids = []

    def register(self, event_name, callback):
        self._handlers.setdefault(event_name, []).append(callback)
        cid = self.figure.canvas.mpl_connect(
            event_name, lambda ev: self._dispatch(event_name, ev)
        )
        self._cids.append(cid)
        return cid

    def _dispatch(self, event_name, event):
        for cb in self._handlers.get(event_name, []):
            cb(event)

    def disconnect(self):
        for cid in self._cids:
            self.figure.canvas.mpl_disconnect(cid)
        self._cids.clear()


class OpticViewer3D:
    """3D layout viewer (reference: system/optic_viewer_3d.py:22).

    ``view()`` draws glass elements as Lens3D, mirrors as Mirror3D, other
    surfaces as wireframe Surface3D, and overlays traced ray bundles.
    """

    def __init__(self, optic):
        self.optic = optic
        self.interaction = None

    def view(self, fields="all", wavelengths="primary", num_rays=24,
             distribution="hexapolar", figsize=(9, 6), ax=None,
             elev=18, azim=-58):
        import matplotlib.pyplot as plt

        if ax is None:
            fig = plt.figure(figsize=figsize)
            ax = fig.add_subplot(111, projection="3d")
        else:
            fig = ax.figure

        optic = self.optic
        system = optic.system
        cfg = system.cfg
        semis = _semi_apertures(optic)
        from optiland_tpu.materials import AIR

        mats = [s._material_obj for s in optic.surfaces.surfaces]
        n_surf = optic.surfaces.num_surfaces

        idx = 1
        while idx < n_surf:
            semi = float(semis[idx]) * 1.1 if idx < len(semis) else 1.0
            if cfg.reflective[idx]:
                Mirror3D(optic, idx, semi).plot(ax)
                idx += 1
            elif idx + 1 < n_surf and mats[idx] is not AIR:
                semi2 = (
                    float(semis[idx + 1]) * 1.1
                    if idx + 1 < len(semis) else semi
                )
                Lens3D(optic, idx, idx + 1, max(semi, semi2)).plot(ax)
                idx += 2
            else:
                if idx < n_surf - 1:  # skip dummy planes, draw image plane
                    Surface3D(optic, idx, semi).plot(ax, alpha=0.15)
                else:
                    Surface3D(optic, idx, semi).plot(
                        ax, color="#666666", alpha=0.3
                    )
                idx += 1

        Rays3D(optic, fields, wavelengths, num_rays, distribution).plot(ax)

        ax.set_xlabel("z (mm)")
        ax.set_ylabel("x (mm)")
        ax.set_zlabel("y (mm)")
        try:
            ax.set_box_aspect((2.2, 1, 1))
        except AttributeError:
            pass
        ax.view_init(elev=elev, azim=azim)
        self.interaction = InteractionManager(fig)
        return fig, ax


__all__ = [
    "InteractionManager",
    "Lens3D",
    "Mirror3D",
    "OpticViewer3D",
    "Rays3D",
    "Surface3D",
]
