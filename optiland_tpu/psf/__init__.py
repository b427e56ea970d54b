"""Point spread function computation.

FFT PSF: zero-padded pupil FFT with OpticStudio-style grid sizing
(reference: optiland/psf/fft.py:20-39, 42-290, psf/base.py:51). The
functional core is jittable/differentiable; the FFTPSF class provides the
reference-compatible interface (Strehl ratio, viewing).
"""

from optiland_tpu.psf.fft import FFTPSF, calculate_grid_size, fft_psf
from optiland_tpu.psf.huygens_fresnel import HuygensPSF, huygens_psf

__all__ = ["FFTPSF", "HuygensPSF", "calculate_grid_size", "fft_psf", "huygens_psf"]
