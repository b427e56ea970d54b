from optiland_tpu.analysis.energy_and_focus import (
    EncircledEnergy,
    ThroughFocusAnalysis,
    ThroughFocusMTF,
    ThroughFocusSpotDiagram,
)
from optiland_tpu.analysis.fans_and_fields import (
    BestFitRayFan,
    Distortion,
    FieldCurvature,
    GridDistortion,
    PupilAberration,
    RayFan,
    RmsSpotSizeVsField,
    RmsWavefrontErrorVsField,
    YYbar,
)
from optiland_tpu.analysis.extra import (
    FieldIncidentAngleVsHeight,
    IncoherentIrradiance,
    MTFvsField,
    PupilIncidentAngleVsHeight,
    RadiantIntensity,
    SurfaceSagViewer,
)
from optiland_tpu.analysis.image_simulation import (
    DistortionWarper,
    ImageSimulationEngine,
    PSFBasisGenerator,
    SpatiallyVariableSimulator,
)
from optiland_tpu.analysis.jones_pupil import JonesPupil
from optiland_tpu.analysis.opd import OPD, OPDFan, ZernikeOPD
from optiland_tpu.analysis.spot import SpotDiagram, SpotData, rms_spot_size

__all__ = [
    "BestFitRayFan",
    "Distortion",
    "EncircledEnergy",
    "FieldCurvature",
    "GridDistortion",
    "DistortionWarper",
    "FieldIncidentAngleVsHeight",
    "ImageSimulationEngine",
    "IncoherentIrradiance",
    "JonesPupil",
    "MTFvsField",
    "PSFBasisGenerator",
    "PupilIncidentAngleVsHeight",
    "RadiantIntensity",
    "SpatiallyVariableSimulator",
    "SurfaceSagViewer",
    "OPD",
    "OPDFan",
    "PupilAberration",
    "RayFan",
    "RmsSpotSizeVsField",
    "RmsWavefrontErrorVsField",
    "SpotData",
    "SpotDiagram",
    "ThroughFocusAnalysis",
    "ThroughFocusMTF",
    "ThroughFocusSpotDiagram",
    "YYbar",
    "ZernikeOPD",
    "rms_spot_size",
]
