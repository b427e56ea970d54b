"""Categorical glass optimization with GlassExpert: substitute catalog
glasses (a discrete variable) while continuously optimizing curvatures.

Run: python examples/10_glass_expert.py
(reference: optiland/optimization/optimizer/scipy/glass_expert.py)
"""

import os

os.environ.setdefault("MPLBACKEND", "Agg")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

from optiland_tpu.optic import Optic
from optiland_tpu.optimization import GlassExpert, OptimizationProblem


def achromat_seed():
    """Cemented doublet seed: wrong glasses, roughly right shape."""
    o = Optic()
    o.surfaces.add(index=0, radius=np.inf, thickness=np.inf)
    o.surfaces.add(index=1, radius=60.0, thickness=6.0, material="N-BK7",
                   is_stop=True)
    o.surfaces.add(index=2, radius=-45.0, thickness=3.0, material="N-BK7")
    o.surfaces.add(index=3, radius=-120.0, thickness=95.0)
    o.surfaces.add(index=4)
    o.set_aperture("EPD", 20.0)
    o.fields.set_type("angle")
    o.fields.add(y=0)
    o.wavelengths.add(0.48, is_primary=False)
    o.wavelengths.add(0.55, is_primary=True)
    o.wavelengths.add(0.65, is_primary=False)
    return o


CROWNS = ["N-BK7", "N-SK16", "N-PSK53A", "N-LAK22"]
FLINTS = ["SF11", "LF5", "N-SF6", "F2"]


def main():
    lens = achromat_seed()
    p = OptimizationProblem(lens)
    # Achromatic merit: common focus for F, d, C lines + target EFL.
    p.add_operand("f2", target=100.0, weight=1.0)
    p.add_operand("rms_spot_size", target=0.0, weight=20.0,
                  input_data={"Hx": 0.0, "Hy": 0.0, "num_rays": 5,
                              "wavelength": 0.48})
    p.add_operand("rms_spot_size", target=0.0, weight=20.0,
                  input_data={"Hx": 0.0, "Hy": 0.0, "num_rays": 5,
                              "wavelength": 0.65})
    p.add_variable(lens, "radius", surface_number=1)
    p.add_variable(lens, "radius", surface_number=2)
    p.add_variable(lens, "radius", surface_number=3)
    p.add_variable(lens, "material", surface_number=1,
                   glass_selection=CROWNS)
    p.add_variable(lens, "material", surface_number=2,
                   glass_selection=FLINTS)

    print(f"initial merit: {float(p.sum_squared()):.6g}")
    ge = GlassExpert(p)
    res = ge.run(num_neighbours=3, maxiter=40, verbose=False)
    print(f"final merit:   {float(res.fun):.6g}")
    for gv in p.glass_variables:
        print(f"  surface {gv.surface_number}: chose {gv.value}")
    p.variable_info()


if __name__ == "__main__":
    main()
