"""Spectral analysis of thin-film stacks
(reference: optiland/thin_film/analysis.py:39)."""

from __future__ import annotations

import numpy as np


class SpectralAnalyzer:
    """R/T/A spectral response plots and tables for a ThinFilmStack."""

    def __init__(self, stack):
        self.stack = stack

    def spectrum(self, wavelength_nm, aoi_deg=0.0, pol="s"):
        """(R, T, A) arrays over a wavelength grid (nm) at one angle."""
        return tuple(
            np.asarray(a)
            for a in self.stack.RTA_nm_deg(wavelength_nm, aoi_deg, pol)
        )

    def angular(self, wavelength_nm, aoi_deg, pol="s"):
        """(R, T, A) arrays over an angle grid (deg) at one wavelength."""
        import jax.numpy as jnp

        R, T, A = self.stack.RTA(
            jnp.asarray(wavelength_nm) * 1e-3,
            jnp.deg2rad(jnp.asarray(aoi_deg)),
            pol,
        )
        return np.asarray(R), np.asarray(T), np.asarray(A)

    def plot_spectrum(self, wavelength_nm, aoi_deg=0.0,
                      polarization=("s", "p"), quantities=("R", "T"), ax=None):
        import matplotlib.pyplot as plt

        if isinstance(polarization, str):
            polarization = [polarization]
        if ax is None:
            fig, ax = plt.subplots(figsize=(8, 4))
        else:
            fig = ax.figure
        styles = ["-", "--", ":"]
        for i, pol in enumerate(polarization):
            R, T, A = self.spectrum(wavelength_nm, aoi_deg, pol)
            vals = {"R": R, "T": T, "A": A}
            for q in quantities:
                ax.plot(wavelength_nm, vals[q], styles[i % 3],
                        label=f"{q} ({pol})")
        ax.set_xlabel("Wavelength (nm)")
        ax.set_ylabel("Fraction")
        ax.legend(fontsize=7)
        return fig, ax

    def plot_angular(self, wavelength_nm, aoi_deg, polarization=("s", "p"),
                     quantity="R", ax=None):
        import matplotlib.pyplot as plt

        if isinstance(polarization, str):
            polarization = [polarization]
        if ax is None:
            fig, ax = plt.subplots(figsize=(8, 4))
        else:
            fig = ax.figure
        for pol in polarization:
            R, T, A = self.angular(wavelength_nm, aoi_deg, pol)
            vals = {"R": R, "T": T, "A": A}
            ax.plot(aoi_deg, vals[quantity], label=f"{quantity} ({pol})")
        ax.set_xlabel("Angle of incidence (deg)")
        ax.set_ylabel("Fraction")
        ax.legend(fontsize=7)
        return fig, ax
