"""Matrix-multiply DFT PSF: pupil -> image via a Fourier triple product.

Computes G = L g R with explicit DFT kernels, decoupling image-plane
sampling (pixel pitch, image size) from the pupil grid — unlike the FFT
PSF whose output pitch is fixed by zero-padding
(reference: optiland/psf/mmdft.py:19-308).

The triple product is two complex matmuls — ideal MXU work on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from optiland_tpu.psf.fft import calculate_grid_size, pupil_grid_coords
from optiland_tpu.psf.huygens_fresnel import working_FNO
from optiland_tpu.wavefront import compute_wavefront_data, fit_and_remove_tilt


def mmdft_psf(
    system,
    Hx,
    Hy,
    wavelength,
    num_rays: int,
    image_size: int,
    pixel_pitch: float,
    strategy: str = "chief_ray",
    remove_tilt: bool = False,
    fno: float | None = None,
):
    """Functional MMDFT PSF (jittable, differentiable).

    ``pixel_pitch`` is in micrometers. Normalized so a diffraction-limited
    system peaks at 100.
    """
    if fno is None:
        fno = working_FNO(system, Hx, Hy, wavelength)

    xg, yg, mask = pupil_grid_coords(num_rays)
    data = compute_wavefront_data(
        system, Hx, Hy, wavelength, xg[mask], yg[mask], strategy=strategy
    )
    opd = fit_and_remove_tilt(data) if remove_tilt else data.opd
    amplitude = jnp.sqrt(jnp.maximum(data.intensity, 0.0))
    vals = amplitude * jnp.exp(-1j * 2 * jnp.pi * opd)
    P = jnp.zeros((num_rays * num_rays,), dtype=vals.dtype)
    P = P.at[np.nonzero(mask)[0]].set(vals).reshape(num_rays, num_rays)

    clear_size = num_rays - 1
    pad_size = wavelength * fno * clear_size / pixel_pitch
    if image_size > pad_size:
        raise ValueError(
            f"Supplied image_size of {image_size} not less than or equal to "
            f"calculated pad size of {int(pad_size)}. Consider increasing "
            "num_rays."
        )

    pupil_coords = jnp.arange(num_rays) - num_rays // 2
    image_coords = jnp.arange(image_size) - image_size // 2
    right = jnp.exp(
        -2j * jnp.pi * jnp.outer(pupil_coords, image_coords) / pad_size
    )
    left = jnp.exp(
        -2j * jnp.pi * jnp.outer(image_coords, pupil_coords) / pad_size
    )
    G = left @ (P.astype(right.dtype) @ right)
    psf = jnp.real(G * jnp.conj(G))
    norm = jnp.sum(jnp.abs(P) > 0) ** 2
    return psf * 100 / norm


class MMDFTPSF:
    """MMDFT PSF analysis (reference: psf/mmdft.py:19).

    Args:
        optic: the Optic.
        field: (Hx, Hy) normalized field.
        wavelength: wavelength in um or 'primary'.
        num_rays: pupil samples across the diameter.
        image_size: output image pixels (defaults to the FFT grid size).
        pixel_pitch: image pixel size in um (defaults to the FFT-equivalent
            pitch lambda*FNO*(num_rays-1)/image_size).
    """

    def __init__(
        self,
        optic,
        field,
        wavelength="primary",
        num_rays: int = 128,
        image_size: int | None = None,
        pixel_pitch: float | None = None,
        strategy: str = "chief_ray",
        remove_tilt: bool = False,
        **kwargs,
    ):
        if wavelength == "primary":
            wavelength = optic.primary_wavelength
        grid_size = None
        if image_size is None and pixel_pitch is None:
            if num_rays < 32:
                raise ValueError(
                    "num_rays must be at least 32 if image_size and "
                    "pixel_pitch are not specified."
                )
            num_rays, grid_size = calculate_grid_size(num_rays)

        self.optic = optic
        self.field = field
        self.wavelength = wavelength
        self.num_rays = num_rays
        fno = float(working_FNO(optic.system, field[0], field[1], wavelength))
        clear_size = num_rays - 1

        if pixel_pitch is None:
            if image_size is None:
                image_size = grid_size
            pixel_pitch = wavelength * fno * clear_size / image_size
        if image_size is None:
            image_size = int(wavelength * fno * clear_size / pixel_pitch)

        self.image_size = image_size
        self.pixel_pitch = pixel_pitch
        self.psf = mmdft_psf(
            optic.system, field[0], field[1], wavelength,
            num_rays=num_rays, image_size=image_size,
            pixel_pitch=pixel_pitch, strategy=strategy,
            remove_tilt=remove_tilt, fno=fno,
        )

    def strehl_ratio(self) -> float:
        """Peak (not necessarily centered) over the diffraction limit
        (reference: psf/mmdft.py:203-221)."""
        return float(jnp.max(self.psf) / 100)

    def view(self, log: bool = False, ax=None, **kwargs):
        import matplotlib.pyplot as plt

        psf = np.asarray(self.psf)
        if log:
            psf = np.log10(np.maximum(psf, 1e-12))
        if ax is None:
            fig, ax = plt.subplots()
        else:
            fig = ax.figure
        extent = [0, psf.shape[1] * self.pixel_pitch,
                  0, psf.shape[0] * self.pixel_pitch]
        im = ax.imshow(psf, origin="lower", cmap="inferno", extent=extent)
        fig.colorbar(im, ax=ax)
        ax.set_xlabel("x (um)")
        ax.set_ylabel("y (um)")
        ax.set_title("MMDFT PSF")
        return fig, ax
