"""Diffraction analysis: FFT PSF, Strehl ratio, MTF curves.

Run: python examples/03_psf_mtf.py
(mirrors the reference's Tutorial_3 wave-optics workflow)
"""

import os

os.environ.setdefault("MPLBACKEND", "Agg")

import jax

jax.config.update("jax_platforms", "cpu")

import matplotlib.pyplot as plt

from optiland_tpu.mtf import FFTMTF, GeometricMTF
from optiland_tpu.psf import FFTPSF
from optiland_tpu.samples import CookeTriplet
from optiland_tpu.zernike import ZernikeFit
from optiland_tpu.wavefront import Wavefront


def main():
    lens = CookeTriplet()

    psf = FFTPSF(lens, field=(0, 0), wavelength=0.55)
    print(f"on-axis Strehl ratio: {psf.strehl_ratio():.4f}")

    fig, ax = plt.subplots()
    psf.view(ax=ax)
    fig.savefig("cooke_psf.png", dpi=110)

    mtf = FFTMTF(lens)
    fig2, ax2 = plt.subplots()
    mtf.view(ax=ax2)
    fig2.savefig("cooke_mtf_fft.png", dpi=110)

    gmtf = GeometricMTF(lens)
    fig3, ax3 = plt.subplots()
    gmtf.view(ax=ax3)
    fig3.savefig("cooke_mtf_geometric.png", dpi=110)

    # Zernike decomposition of the on-axis wavefront
    wf = Wavefront(lens)
    data = wf.get_data((0, 0), 0.55)
    fit = ZernikeFit(data.pupil_x, data.pupil_y, data.opd,
                     zernike_type="fringe", num_terms=16)
    print("first 8 fringe-Zernike coefficients (waves):")
    for i, c in enumerate(fit.coeffs[:8]):
        print(f"  Z{i + 1}: {float(c):+0.5f}")
    print("wrote cooke_psf.png, cooke_mtf_fft.png, cooke_mtf_geometric.png")


if __name__ == "__main__":
    main()
