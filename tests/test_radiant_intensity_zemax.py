"""RadiantIntensity validated against Zemax-exported data: an SMF fiber
source collimated by an H-K3 singlet, angular intensity at the free-
propagation reference surface vs OpticStudio's export
(reference: tests/test_analysis.py TestRadiantIntensity:1829-1895,
data tests/zemax_files/sph_lens_coll_intensity_free_prop.txt)."""

import os

import numpy as np
import pytest

from optiland_tpu.analysis import RadiantIntensity
from optiland_tpu.optic import Optic
from optiland_tpu.physical_apertures import RectangularAperture
from optiland_tpu.sources import SMFSource

ZDATA = "/root/reference/tests/zemax_files/sph_lens_coll_intensity_free_prop.txt"

pytestmark = pytest.mark.skipif(
    not os.path.exists(ZDATA), reason="Zemax export unavailable"
)


def _system():
    optic = Optic(name="fiber collimator")
    optic.set_aperture("objectNA", 0.095)
    optic.set_field_type("angle")
    optic.fields.add(y=0)
    optic.wavelengths.add(1.55, is_primary=True)
    apt = RectangularAperture(-30, 30, -30, 30)
    optic.surfaces.add(index=0, thickness=0)
    optic.surfaces.add(index=1, thickness=0.01)
    optic.surfaces.add(index=2, thickness=129.6554)
    optic.surfaces.add(index=3, thickness=4, radius=131.9743, is_stop=True,
                       material=("H-K3", "cdgm"))
    optic.surfaces.add(index=4, thickness=10.0, radius=-131.9743)
    optic.surfaces.add(index=5, aperture=apt)
    return optic


def test_intensity_cross_section_matches_zemax():
    source = SMFSource(mfd_um=10.4, wavelength_um=1.55, total_power=1.0,
                       seed=0)
    rays = source.generate_rays(num_rays=1_000_000)

    analysis = RadiantIntensity(
        _system(),
        user_initial_rays=rays,
        num_angular_bins_X=101,
        num_angular_bins_Y=101,
        angle_X_min=-12.0, angle_X_max=12.0,
        angle_Y_min=-12.0, angle_Y_max=12.0,
        reference_surface_index=1,
        use_absolute_units=True,
    )
    m, *_rest = analysis.data[0][0]
    amap = np.asarray(m)
    angles_x = np.asarray(_rest[-2])
    angles_y = np.asarray(_rest[-1])
    central = amap[:, int(np.argmin(np.abs(angles_y)))]

    data = np.loadtxt(ZDATA, skiprows=1, usecols=(0, 1), encoding="utf-16")
    zmx_int = data[:, 1]

    ours = central / central.max()
    theirs = zmx_int / zmx_int.max()
    np.testing.assert_allclose(ours, theirs, atol=0.1, rtol=0.1)
