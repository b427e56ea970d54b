"""Point spread function computation.

FFT PSF: zero-padded pupil FFT with OpticStudio-style grid sizing
(reference: optiland/psf/fft.py:20-39, 42-290, psf/base.py:51). The
functional core is jittable/differentiable; the FFTPSF class provides the
reference-compatible interface (Strehl ratio, viewing). FFTPSF/HuygensPSF
are factories that dispatch to the vectorial implementations when the optic
carries a polarization state (reference: psf/fft.py:290, vectorial_fft.py,
vectorial_huygens.py).
"""

from optiland_tpu.psf.fft import (
    FFTPSF,
    ScalarFFTPSF,
    calculate_grid_size,
    fft_psf,
    vectorial_fft_psf,
)
from optiland_tpu.psf.huygens_fresnel import (
    HuygensPSF,
    ScalarHuygensPSF,
    huygens_psf,
)
from optiland_tpu.psf.mmdft import MMDFTPSF, mmdft_psf
from optiland_tpu.psf.vectorial import VectorialFFTPSF, VectorialHuygensPSF

__all__ = [
    "FFTPSF",
    "MMDFTPSF",
    "mmdft_psf",
    "ScalarFFTPSF",
    "VectorialFFTPSF",
    "HuygensPSF",
    "ScalarHuygensPSF",
    "VectorialHuygensPSF",
    "calculate_grid_size",
    "fft_psf",
    "vectorial_fft_psf",
    "huygens_psf",
]
