"""All sample systems build, match reference focal lengths, and trace
(reference: optiland/samples/, prescriptions extracted to
optiland_tpu/database/samples.json)."""

from __future__ import annotations

import numpy as np
import pytest

import optiland_tpu.samples as samples

# f2 values from the reference implementation (validated live during
# extraction; regenerate with tools/extract_samples.py + a parity run)
REF_F2 = {
    "AsphericSinglet": 25.484006006625144,
    "CementedAchromat": 20.0059952749227,
    "CookeTriplet": 49.999783071431914,
    "DoubleGauss": 100.00374787083724,
    "Edmund_49_847": 25.397595913429043,
    "EyepieceErfle": 79.68780891169398,
    "HeliarLens": 10.00652933541452,
    "HubbleTelescope": 57600.080998403595,
    "InfraredTriplet": 10.002605806173719,
    "InfraredTripletF4": 3.978671113840912,
    "LensWithFieldCorrector": 127.05805143206152,
    "Microscope20x": 7.856410226130006,
    "NavarroWideAngleEye": 22.029115357447523,
    "Objective60x": 98.57864671748113,
    "ObjectiveUS008879901": 35.97568215109414,
    "PetzvalLens": 50.584531734543596,
    "ProjectionLens120FOV": 1.1233506799713024,
    "ProjectionLens160FOV": 0.9443077914473987,
    "ReverseTelephoto": 2.005240270799113,
    "SingletStopSurf2": 101.50182594885518,
    "Telephoto": 127.0166011378616,
    "TelescopeDoublet": 48.01075268520557,
    "TelescopeObjective48Inch": 47.98450947876408,
    "TessarLens": 3.9977777470211935,
    "TripletTelescopeObjective": 100.0012614217989,
    "UVProjectionLens": 492.76437363076354,
    "UVReflectingMicroscope": 3.2779472613064593,
    "WideAngle100FOV": 0.6562858923564887,
    "WideAngle170FOV": 0.20505353034355128,
}


def test_inventory_complete():
    assert set(samples.__all__) == set(REF_F2)


@pytest.mark.parametrize("name", sorted(REF_F2))
def test_sample_focal_length(name):
    lens = getattr(samples, name)()
    f2 = float(np.ravel(lens.paraxial.f2())[0])
    np.testing.assert_allclose(f2, REF_F2[name], rtol=1e-7)


@pytest.mark.parametrize(
    "name",
    ["HubbleTelescope", "UVReflectingMicroscope",
     pytest.param("WideAngle170FOV", marks=pytest.mark.slow),
     pytest.param("UVProjectionLens", marks=pytest.mark.slow),
     "NavarroWideAngleEye", "PetzvalLens"],
)
def test_feature_rich_samples_trace(name):
    """Mirrors, wide angles (robust aiming), telecentric object space, and
    eye models all trace to finite coordinates."""
    lens = getattr(samples, name)()
    r = lens.trace(Hy=0.7, num_rays=4)
    y = np.asarray(r.y)
    assert np.isfinite(y).all()
