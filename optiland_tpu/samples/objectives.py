"""Sample objective lens systems.

Prescriptions are published lens-design data (same systems the reference
ships for testing; reference: optiland/samples/objectives.py). These sample
systems anchor the parity test suite.
"""

from __future__ import annotations

import numpy as np

from optiland_tpu.optic import Optic


class CookeTriplet(Optic):
    """Cooke triplet, f/5, 20-deg half field (reference:
    optiland/samples/objectives.py:46-73)."""

    def __init__(self):
        super().__init__()
        self.surfaces.add(index=0, radius=np.inf, thickness=np.inf)
        self.surfaces.add(index=1, radius=22.01359, thickness=3.25896, material="SK16")
        self.surfaces.add(index=2, radius=-435.76044, thickness=6.00755)
        self.surfaces.add(
            index=3, radius=-22.21328, thickness=0.99997, material=("F2", "schott")
        )
        self.surfaces.add(index=4, radius=20.29192, thickness=4.75041, is_stop=True)
        self.surfaces.add(index=5, radius=79.68360, thickness=2.95208, material="SK16")
        self.surfaces.add(index=6, radius=-18.39533, thickness=42.20778)
        self.surfaces.add(index=7)

        self.set_aperture(aperture_type="EPD", value=10)
        self.fields.set_type(field_type="angle")
        self.fields.add(y=0)
        self.fields.add(y=14)
        self.fields.add(y=20)

        self.wavelengths.add(value=0.48)
        self.wavelengths.add(value=0.55, is_primary=True)
        self.wavelengths.add(value=0.65)


class DoubleGauss(Optic):
    """Double Gauss, f/5 (reference: optiland/samples/objectives.py:75-114)."""

    def __init__(self):
        super().__init__()
        self.surfaces.add(index=0, radius=np.inf, thickness=np.inf)
        self.surfaces.add(index=1, radius=56.20238, thickness=8.75, material="N-SSK2")
        self.surfaces.add(index=2, radius=152.28580, thickness=0.5)
        self.surfaces.add(index=3, radius=37.68262, thickness=12.5, material="N-SK2")
        self.surfaces.add(
            index=4, radius=np.inf, thickness=3.8, material=("F5", "schott")
        )
        self.surfaces.add(index=5, radius=24.23130, thickness=16.369445)
        self.surfaces.add(index=6, radius=np.inf, thickness=13.747957, is_stop=True)
        self.surfaces.add(
            index=7, radius=-28.37731, thickness=3.8, material=("F5", "schott")
        )
        self.surfaces.add(index=8, radius=np.inf, thickness=11, material="N-SK16")
        self.surfaces.add(index=9, radius=-37.92546, thickness=0.5)
        self.surfaces.add(index=10, radius=177.41176, thickness=7, material="N-SK16")
        self.surfaces.add(index=11, radius=-79.41143, thickness=61.487536)
        self.surfaces.add(index=12)

        self.set_aperture(aperture_type="imageFNO", value=5)
        self.fields.set_type(field_type="angle")
        self.fields.add(y=0)
        self.fields.add(y=10)
        self.fields.add(y=14)

        self.wavelengths.add(value=0.4861)
        self.wavelengths.add(value=0.5876, is_primary=True)
        self.wavelengths.add(value=0.6563)


class TripletTelescopeObjective(Optic):
    """Triplet telescope objective (reference:
    optiland/samples/objectives.py:8-44)."""

    def __init__(self):
        super().__init__()
        self.surfaces.add(index=0, radius=np.inf, thickness=np.inf)
        self.surfaces.add(
            index=1, radius=50.098, thickness=4.5, material="N-BK7", is_stop=True
        )
        self.surfaces.add(index=2, radius=-983.42, thickness=0.1)
        self.surfaces.add(index=3, radius=56.671, thickness=4.5, material="N-BK7")
        self.surfaces.add(index=4, radius=-171.15, thickness=5.571)
        self.surfaces.add(
            index=5, radius=-97.339, thickness=3.5, material=("SF1", "schott")
        )
        self.surfaces.add(index=6, radius=81.454, thickness=75.132)
        self.surfaces.add(index=7)

        self.set_aperture(aperture_type="imageFNO", value=2.8)
        self.fields.set_type(field_type="angle")
        self.fields.add(y=0.0)
        self.fields.add(y=0.7)
        self.fields.add(y=1.0)

        self.wavelengths.add(value=0.4861)
        self.wavelengths.add(value=0.5876, is_primary=True)
        self.wavelengths.add(value=0.6563)


class AsphericSinglet(Optic):
    """Aspheric singlet (reference: optiland/samples/simple.py:161)."""

    def __init__(self):
        super().__init__()
        self.surfaces.add(index=0, radius=np.inf, thickness=np.inf)
        self.surfaces.add(
            index=1,
            thickness=7,
            radius=20.0,
            is_stop=True,
            material="N-SF11",
            surface_type="even_asphere",
            conic=0.0,
            coefficients=[-2.248851e-4, -4.690412e-6, -6.404376e-8],
        )
        self.surfaces.add(index=2, thickness=21.56201105)
        self.surfaces.add(index=3)
        self.set_aperture(aperture_type="EPD", value=20.0)
        self.fields.set_type(field_type="angle")
        self.fields.add(y=0)
        self.wavelengths.add(value=0.587, is_primary=True)
