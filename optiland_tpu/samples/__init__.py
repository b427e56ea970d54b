from optiland_tpu.samples.objectives import (
    CookeTriplet,
    DoubleGauss,
    TripletTelescopeObjective,
)

__all__ = ["CookeTriplet", "DoubleGauss", "TripletTelescopeObjective"]
