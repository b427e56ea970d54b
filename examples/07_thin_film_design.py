"""Thin-film coating design: broadband anti-reflection via gradient
optimization and needle synthesis.

Run: python examples/07_thin_film_design.py
(mirrors the reference's thin_film optimization workflow,
reference: optiland/thin_film/optimization/{optimizer,needle}.py)
"""

import os

os.environ.setdefault("MPLBACKEND", "Agg")

import jax

jax.config.update("jax_platforms", "cpu")

import matplotlib.pyplot as plt
import numpy as np

from optiland_tpu.materials import IdealMaterial
from optiland_tpu.thin_film import (
    SpectralAnalyzer,
    ThinFilmOptimizer,
    ThinFilmStack,
    needle_synthesis,
)

AIR = IdealMaterial(1.0)
GLASS = IdealMaterial(1.52)
MGF2 = IdealMaterial(1.38)
TIO2 = IdealMaterial(2.35)

DESIGN_NM = np.linspace(420, 680, 27)


def band_average_R(stack):
    R = np.ravel(np.asarray(stack.reflectance_nm_deg(DESIGN_NM, 0.0, "s")))
    return float(np.mean(R))


def main():
    # 1. Classic single-layer QWOT AR as the starting point.
    stack = ThinFilmStack(
        incident_material=AIR, substrate_material=GLASS,
        reference_wl_um=0.55,
    )
    stack.add_layer_qwot(MGF2, 1.0)
    print(f"single QWOT MgF2:      mean R = {band_average_R(stack):.4%}")

    # 2. Gradient optimization of layer thicknesses (jax.grad through the
    #    2x2 transfer-matrix scan).
    opt = ThinFilmOptimizer(stack)
    opt.add_all_thickness_variables()
    opt.add_operand("R", wavelength_nm=list(DESIGN_NM), target=0.0)
    opt.optimize(maxiter=100)
    print(f"thickness-optimized:   mean R = {band_average_R(stack):.4%}")

    # 3. Needle synthesis: insert thin high-index needles where they most
    #    reduce the merit, re-optimizing after each insertion.
    history = needle_synthesis(
        opt, needle_material=TIO2, max_needles=3, num_positions=10,
        reoptimize_iters=60,
    )
    print(
        f"after needle synthesis: mean R = {band_average_R(stack):.4%} "
        f"({len(stack)} layers, merit history {[f'{h:.2e}' for h in history]})"
    )

    # 4. Spectral report.
    analyzer = SpectralAnalyzer(stack)
    fig, _ = analyzer.plot_spectrum(
        wavelength_nm=np.linspace(400, 700, 121), quantities=("R",),
    )
    fig.savefig("/tmp/ar_coating_spectrum.png", dpi=110)
    print("saved /tmp/ar_coating_spectrum.png")
    plt.close("all")


if __name__ == "__main__":
    main()
