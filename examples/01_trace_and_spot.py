"""Trace a Cooke triplet and draw layout + spot diagram.

Run: python examples/01_trace_and_spot.py
(mirrors the reference's Tutorial_1 'first lens' workflow)
"""

import os

os.environ.setdefault("MPLBACKEND", "Agg")

import jax

jax.config.update("jax_platforms", "cpu")

import matplotlib.pyplot as plt
import numpy as np

from optiland_tpu.analysis import SpotDiagram
from optiland_tpu.samples import CookeTriplet


def main():
    lens = CookeTriplet()

    # paraxial summary
    print(f"EFL   = {float(lens.paraxial.f2()):.4f} mm")
    print(f"F/#   = {float(lens.paraxial.FNO()):.4f}")
    print(f"EPD   = {float(lens.paraxial.EPD()):.4f} mm")

    # trace the full field, report RMS spot sizes
    spot = SpotDiagram(lens)
    for (hx, hy), rms_row in zip(
        lens.fields.get_field_coords(), spot.rms_spot_radius()
    ):
        rms = float(rms_row[0])  # primary wavelength
        print(f"field ({hx:+.2f}, {hy:+.2f}): RMS spot = {rms*1e3:.2f} um")

    # figures
    fig1, _ = lens.draw(num_rays=5)
    fig1.savefig("cooke_layout.png", dpi=110)
    fig2, _ = lens.draw3D(num_rays=24)
    fig2.savefig("cooke_layout_3d.png", dpi=110)
    fig3, ax = plt.subplots(1, 3, figsize=(11, 3.5))
    spot.view(ax=np.atleast_1d(ax))
    fig3.savefig("cooke_spots.png", dpi=110)
    print("wrote cooke_layout.png, cooke_layout_3d.png, cooke_spots.png")


if __name__ == "__main__":
    main()
