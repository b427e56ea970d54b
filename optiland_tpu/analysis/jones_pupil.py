"""Jones pupil analysis: spatially-resolved exit-pupil Jones matrix.

Projects each ray's accumulated 3x3 polarization matrix onto a dipole-like
local basis at the exit pupil, yielding the 2x2 Jones matrix as a function
of normalized pupil coordinates (reference: optiland/analysis/jones_pupil.py:26-231).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from optiland_tpu.analysis.base import BaseAnalysis


class JonesPupil(BaseAnalysis):
    """Jones matrix sampled on a square pupil grid
    (reference: analysis/jones_pupil.py:26).

    Args:
        optic: the Optic (polarization is temporarily enabled if "ignore").
        field: normalized (Hx, Hy) field coordinates.
        wavelengths: 'all' or a list of wavelengths in um.
        grid_size: points along one pupil dimension (grid spans [-1, 1]).

    Attributes:
        data: list (per wavelength) of dicts {"Px", "Py", "J"} where J is
            the (N, 2, 2) complex Jones matrix array.
    """

    def __init__(self, optic, field=(0, 0), wavelengths="all",
                 grid_size: int = 65):
        self.field = field
        self.grid_size = grid_size
        super().__init__(optic, wavelengths)

    def _generate_data(self):
        x = np.linspace(-1.0, 1.0, self.grid_size)
        Px, Py = np.meshgrid(x, x)
        Px, Py = Px.ravel(), Py.ravel()
        return [
            self._generate_single_data(
                self.field[0], self.field[1], Px, Py, wl
            )
            for wl in self.wavelengths
        ]

    def _generate_single_data(self, Hx, Hy, Px, Py, wavelength):
        from optiland_tpu.polarization import PolarizationState

        original = self.optic.polarization
        if original == "ignore":
            # unpolarized state still carries the polarization matrix
            self.optic.set_polarization(PolarizationState())
        try:
            rays = self.optic.trace_generic(
                Hx=Hx, Hy=Hy, Px=Px, Py=Py, wavelength=wavelength
            )
        finally:
            if original == "ignore":
                self.optic.set_polarization("ignore")

        p = rays.p
        k = jnp.stack([rays.L, rays.M, rays.N], axis=1)
        k = k / jnp.linalg.norm(k, axis=1)[:, None]

        # Dipole-like local basis: v ~ y-axis, u ~ x-axis
        # (reference: analysis/jones_pupil.py:186-212)
        xhat = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), k.shape)
        v = jnp.cross(k, xhat)
        v = v / (jnp.linalg.norm(v, axis=1) + 1e-15)[:, None]
        u = jnp.cross(v, k)
        u = u / (jnp.linalg.norm(u, axis=1) + 1e-15)[:, None]

        P_x_in = p[:, :, 0]
        P_y_in = p[:, :, 1]
        Jxx = jnp.sum(u * P_x_in, axis=1)
        Jxy = jnp.sum(u * P_y_in, axis=1)
        Jyx = jnp.sum(v * P_x_in, axis=1)
        Jyy = jnp.sum(v * P_y_in, axis=1)
        J = jnp.stack(
            [
                jnp.stack([Jxx, Jxy], axis=1),
                jnp.stack([Jyx, Jyy], axis=1),
            ],
            axis=1,
        )
        return {"Px": Px, "Py": Py, "J": J}

    def view(self, fig_to_plot_on=None, figsize=(16, 8)):
        import matplotlib.pyplot as plt

        wl_idx = 0
        primary = float(self.optic.primary_wavelength)
        wls = [float(w) for w in self.wavelengths]
        if primary in wls:
            wl_idx = wls.index(primary)
        d = self.data[wl_idx]
        fig = fig_to_plot_on or plt.figure(figsize=figsize)
        if fig_to_plot_on:
            fig.clear()
        axs = fig.subplots(2, 4, sharex=True, sharey=True)
        n = self.grid_size
        px = np.asarray(d["Px"]).reshape(n, n)
        py = np.asarray(d["Py"]).reshape(n, n)
        J = np.asarray(d["J"])
        elements = [
            ("Jxx", J[:, 0, 0]), ("Jxy", J[:, 0, 1]),
            ("Jyx", J[:, 1, 0]), ("Jyy", J[:, 1, 1]),
        ]
        for col, (name, val) in enumerate(elements):
            val = val.reshape(n, n)
            for row, (part, lab) in enumerate(
                ((np.real, "Re"), (np.imag, "Im"))
            ):
                ax = axs[row, col]
                im = ax.pcolormesh(px, py, part(val), shading="nearest",
                                   cmap="viridis")
                ax.set_title(f"{lab}({name})")
                ax.set_aspect("equal")
                fig.colorbar(im, ax=ax, fraction=0.046, pad=0.04)
        for ax in axs[:, 0]:
            ax.set_ylabel("Py")
        for ax in axs[-1, :]:
            ax.set_xlabel("Px")
        fig.suptitle(
            f"Jones Pupil - Field: {self.field}, "
            f"Wavelength: {wls[wl_idx]:.4f} um"
        )
        fig.tight_layout()
        return fig, fig.get_axes()
