"""FFT-based point spread function.

The pupil function P = sqrt(I) * exp(-i 2*pi OPD) is sampled on a square
grid (wavefront computed on the disk-masked uniform distribution),
zero-padded to the FFT grid, and transformed; normalization makes a
diffraction-limited system peak at 100 (reference: optiland/psf/fft.py:42-290).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from optiland_tpu.core.system import System
from optiland_tpu.wavefront import (
    Wavefront,
    compute_wavefront_data,
    fit_and_remove_tilt,
)


def calculate_grid_size(num_rays: int) -> tuple[int, int]:
    """OpticStudio-style effective pupil sampling and FFT grid size
    (reference: psf/fft.py:20-39)."""
    effective = int(np.floor(32 * 2 ** ((np.log2(num_rays) - 5) / 2)))
    return effective, effective * 2


def pupil_grid_coords(num_rays: int):
    """Flattened square-grid pupil coordinates and the in-disk mask."""
    x = np.linspace(-1, 1, num_rays)
    x, y = np.meshgrid(x, x)
    x, y = x.ravel(), y.ravel()
    mask = x**2 + y**2 <= 1
    return x, y, mask


def fft_psf(
    system: System,
    Hx,
    Hy,
    wavelength,
    num_rays: int = 32,
    grid_size: int = 64,
    strategy: str = "chief_ray",
    remove_tilt: bool = True,
):
    """Compute the FFT PSF (functional, jittable, differentiable).

    Returns a (grid_size, grid_size) array normalized so a diffraction
    limited system peaks at 100.
    """
    xg, yg, mask = pupil_grid_coords(num_rays)
    data = compute_wavefront_data(
        system, Hx, Hy, wavelength, xg[mask], yg[mask], strategy=strategy
    )
    opd = data.opd
    if remove_tilt:
        opd = fit_and_remove_tilt(data)
    amplitude = jnp.sqrt(jnp.maximum(data.intensity, 0.0))
    vals = amplitude * jnp.exp(-1j * 2 * jnp.pi * opd)

    P = jnp.zeros((num_rays * num_rays,), dtype=vals.dtype)
    P = P.at[np.nonzero(mask)[0]].set(vals)
    P = P.reshape(num_rays, num_rays)

    pad_before = (grid_size - num_rays) // 2
    pad_after = pad_before + (grid_size - num_rays) % 2
    P = jnp.pad(P, ((pad_before, pad_after), (pad_before, pad_after)))

    amp = jnp.fft.fftshift(jnp.fft.fft2(P))
    psf = jnp.real(amp * jnp.conj(amp))
    norm = jnp.sum(jnp.abs(P) > 0) ** 2
    return psf / norm * 100


def vectorial_fft_psf(
    system: System,
    Hx,
    Hy,
    wavelength,
    num_rays: int = 32,
    grid_size: int = 64,
    strategy: str = "chief_ray",
    remove_tilt: bool = True,
    pol_state=None,
):
    """Vectorial FFT PSF: incoherent sum over the Cartesian components of the
    exit-pupil E-field for each incoherent polarization state
    (reference: psf/vectorial_fft.py:17-85).

    Requires a polarized system (cfg.polarized).
    """
    xg, yg, mask = pupil_grid_coords(num_rays)
    data = compute_wavefront_data(
        system, Hx, Hy, wavelength, xg[mask], yg[mask], strategy=strategy,
        pol_state=pol_state,
    )
    if data.E_exits is None:
        raise ValueError(
            "E_exits must be populated in WavefrontData for the vectorial "
            "FFT PSF. Enable polarization on the optic."
        )
    opd = data.opd
    if remove_tilt:
        opd = fit_and_remove_tilt(data)
    is_valid = data.intensity > 0
    phase = jnp.exp(-1j * 2 * jnp.pi * opd)

    pad_before = (grid_size - num_rays) // 2
    pad_after = pad_before + (grid_size - num_rays) % 2
    idx = np.nonzero(mask)[0]

    psf = jnp.zeros((grid_size, grid_size))
    norm = 0.0
    for E_exit in data.E_exits:
        for comp in range(3):
            amp = jnp.where(is_valid, E_exit[:, comp], 0.0)
            vals = amp * phase
            P = jnp.zeros((num_rays * num_rays,), dtype=vals.dtype)
            P = P.at[idx].set(vals).reshape(num_rays, num_rays)
            P = jnp.pad(P, ((pad_before, pad_after), (pad_before, pad_after)))
            a = jnp.fft.fftshift(jnp.fft.fft2(P))
            psf = psf + jnp.real(a * jnp.conj(a))
            norm = norm + jnp.sum(jnp.abs(P)) ** 2
    return psf / norm * 100


class ScalarFFTPSF:
    """FFT PSF analysis (reference: psf/fft.py:42 ScalarFFTPSF + :290 factory).

    Args:
        optic: the Optic.
        field: (Hx, Hy) normalized field.
        wavelength: wavelength in um ('primary' allowed).
        num_rays: pupil samples across the diameter.
        grid_size: FFT grid (defaults to OpticStudio-style sizing).
    """

    def __init__(
        self,
        optic,
        field,
        wavelength="primary",
        num_rays: int = 128,
        grid_size: int | None = None,
        strategy: str = "chief_ray",
        remove_tilt: bool = True,
        **kwargs,
    ):
        if wavelength == "primary":
            wavelength = optic.primary_wavelength
        if grid_size is None:
            if num_rays < 32:
                raise ValueError(
                    "num_rays must be at least 32 if grid_size is not specified."
                )
            num_rays, grid_size = calculate_grid_size(num_rays)
        elif grid_size < num_rays:
            raise ValueError(
                f"Grid size ({grid_size}) must be >= number of rays ({num_rays})."
            )
        self.optic = optic
        self.field = field
        self.wavelength = wavelength
        self.num_rays = num_rays
        self.grid_size = grid_size
        self.psf = fft_psf(
            optic.system, field[0], field[1], wavelength,
            num_rays=num_rays, grid_size=grid_size, strategy=strategy,
            remove_tilt=remove_tilt,
        )

    def strehl_ratio(self) -> float:
        """Peak intensity relative to the diffraction limit
        (reference: psf/base.py:418-437)."""
        c = self.grid_size // 2
        return float(self.psf[c, c] / 100)

    def view(self, projection: str = "2d", log: bool = False, ax=None, **kwargs):
        import matplotlib.pyplot as plt

        psf = np.asarray(self.psf)
        if log:
            psf = np.log10(np.maximum(psf, 1e-12))
        if ax is None:
            fig, ax = plt.subplots()
        else:
            fig = ax.figure
        im = ax.imshow(psf, origin="lower", cmap="inferno")
        fig.colorbar(im, ax=ax)
        ax.set_title("FFT PSF")
        return fig, ax


class FFTPSF(ScalarFFTPSF):
    """FFT PSF factory: returns the vectorial implementation when the optic
    carries a polarization state, else the scalar one
    (reference: psf/fft.py:290-330 FFTPSF factory)."""

    def __new__(cls, optic, *args, **kwargs):
        if cls is FFTPSF and getattr(optic, "polarization_state", None) is not None:
            from optiland_tpu.psf.vectorial import VectorialFFTPSF

            return VectorialFFTPSF(optic, *args, **kwargs)
        return super().__new__(cls)
