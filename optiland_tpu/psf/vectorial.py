"""Vectorial PSF analyses for polarized systems.

VectorialFFTPSF sums the FFT intensities of the three Cartesian components
of the exit-pupil E-field per incoherent polarization state
(reference: optiland/psf/vectorial_fft.py:17-85); VectorialHuygensPSF does
the same with the Huygens-Fresnel direct summation
(reference: optiland/psf/vectorial_huygens.py:21-169).
"""

from __future__ import annotations

from optiland_tpu.psf.fft import (
    ScalarFFTPSF,
    calculate_grid_size,
    vectorial_fft_psf,
)
from optiland_tpu.psf.huygens_fresnel import ScalarHuygensPSF


class VectorialFFTPSF(ScalarFFTPSF):
    """Vectorial FFT PSF (reference: psf/vectorial_fft.py:17)."""

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
        self.psf = vectorial_fft_psf(
            optic.system, field[0], field[1], wavelength,
            num_rays=num_rays, grid_size=grid_size, strategy=strategy,
            remove_tilt=remove_tilt,
            pol_state=getattr(optic, "polarization_state", None),
        )


class VectorialHuygensPSF(ScalarHuygensPSF):
    """Vectorial Huygens PSF (reference: psf/vectorial_huygens.py:21)."""

    _vectorial = True
