from optiland_tpu.samples.objectives import (
    AsphericSinglet,
    CookeTriplet,
    DoubleGauss,
    TripletTelescopeObjective,
)

__all__ = ["AsphericSinglet", "CookeTriplet", "DoubleGauss", "TripletTelescopeObjective"]
