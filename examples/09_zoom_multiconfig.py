"""Multi-configuration (zoom) systems: linked configurations with
per-config overrides, traced and analyzed independently.

Run: python examples/09_zoom_multiconfig.py
(reference: optiland/multiconfig/multi_configuration.py)
"""

import os

os.environ.setdefault("MPLBACKEND", "Agg")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from optiland_tpu.analysis import SpotDiagram
from optiland_tpu.multiconfig import MultiConfiguration
from optiland_tpu.optic import Optic


def two_group_zoom():
    """A toy two-group zoom: moving the air gap between a positive and a
    negative group changes the effective focal length."""
    o = Optic()
    o.surfaces.add(index=0, radius=np.inf, thickness=np.inf)
    o.surfaces.add(index=1, radius=40.0, thickness=5.0, material="N-BK7",
                   is_stop=True)
    o.surfaces.add(index=2, radius=-40.0, thickness=30.0)
    o.surfaces.add(index=3, radius=-25.0, thickness=3.0, material="SF11")
    o.surfaces.add(index=4, radius=25.0, thickness=40.0)
    o.surfaces.add(index=5)
    o.set_aperture("EPD", 10.0)
    o.fields.set_type("angle")
    o.fields.add(y=0)
    o.fields.add(y=3)
    o.wavelengths.add(0.55, is_primary=True)
    return o


def main():
    mc = MultiConfiguration(two_group_zoom())
    wide = mc.configurations[0]
    tele = mc.add_configuration()

    # Zoom by overriding the group separation in configuration 1 only;
    # everything else stays linked through pickups.
    mc.set_thickness(2, 35.0, [1])
    # refocus each configuration independently
    for i, cfg in enumerate(mc.configurations):
        cfg.image_solve()
        f = float(np.ravel(cfg.paraxial.f2())[0])
        fno = float(np.ravel(cfg.paraxial.FNO())[0])
        print(f"config {i}: EFL = {f:8.3f} mm   F/{fno:.2f}")

    # A shared design change still propagates to both configurations.
    mc.set_radius(1, 42.0, "all")
    assert wide.surfaces.surfaces[1].radius == 42.0
    assert tele.surfaces.surfaces[1].radius == 42.0

    # Per-configuration analysis.
    for i, cfg in enumerate(mc.configurations):
        spot = SpotDiagram(cfg, num_rings=6)
        rms = [float(np.ravel(r)[0]) * 1e3 for r in spot.rms_spot_radius()]
        print(f"config {i}: RMS spot radii (um, per field) = "
              + ", ".join(f"{v:.1f}" for v in rms))


if __name__ == "__main__":
    main()
