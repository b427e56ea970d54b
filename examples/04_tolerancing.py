"""Tolerance a Cooke triplet: sensitivity study + Monte Carlo with a
focus compensator.

Run: python examples/04_tolerancing.py
(mirrors the reference's Tutorial_6 tolerancing workflow)
"""

import jax

jax.config.update("jax_platforms", "cpu")

from optiland_tpu.samples import CookeTriplet
from optiland_tpu.tolerancing import (
    DistributionSampler,
    MonteCarlo,
    RangeSampler,
    SensitivityAnalysis,
    Tolerancing,
)


def main():
    lens = CookeTriplet()

    tol = Tolerancing(lens)
    tol.add_operand(
        "rms_spot_size",
        input_data={
            "optic": lens, "Hx": 0.0, "Hy": 0.0,
            "num_rays": 5, "wavelength": 0.55,
            "distribution": "hexapolar",
        },
    )
    # +/-0.1 mm radius tolerance on each glass surface
    for snum in (1, 2, 4, 5):
        tol.add_perturbation(
            "radius", RangeSampler(-0.1, 0.1, steps=5),
            surface_number=snum,
        )
    # image-distance compensator (refocus after each perturbation)
    tol.add_compensator("thickness", surface_number=6)

    print("--- sensitivity analysis ---")
    sa = SensitivityAnalysis(tol)
    import pandas as pd

    rows = sa.run()
    df = pd.DataFrame(
        {
            "perturbation": [r["perturbation_type"] for r in rows],
            "value": [r["value"] for r in rows],
            "rms_spot": [float(r["operands"][0]) for r in rows],
        }
    )
    print(df.to_markdown(index=False))

    print("\n--- Monte Carlo (gaussian perturbations) ---")
    tol2 = Tolerancing(lens)
    tol2.add_operand(
        "rms_spot_size",
        input_data={
            "optic": lens, "Hx": 0.0, "Hy": 0.0,
            "num_rays": 5, "wavelength": 0.55,
            "distribution": "hexapolar",
        },
    )
    # perturbations write absolute values (reference semantics): sample
    # around each surface's nominal radius
    for snum in (1, 2, 4, 5):
        nominal = float(lens.surfaces.surfaces[snum].radius)
        tol2.add_perturbation(
            "radius", DistributionSampler("normal", seed=snum, loc=nominal,
                                          scale=0.05),
            surface_number=snum,
        )
    mc = MonteCarlo(tol2)
    results = mc.run(num_iterations=50)
    print(f"rms_spot over 50 trials: mean={results['mean'][0]:.5f} "
          f"std={results['std'][0]:.5f}")


if __name__ == "__main__":
    main()
