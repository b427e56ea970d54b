"""Sample optical systems (reference: optiland/samples/, ~30 systems).

Four anchor systems are hand-written (objectives.py) and back the parity
suite; the remainder are rebuilt from extracted prescription data
(registry.py, optiland_tpu/database/samples.json).
"""

from optiland_tpu.samples import registry as _registry
from optiland_tpu.samples.objectives import (
    AsphericSinglet,
    CookeTriplet,
    DoubleGauss,
    TripletTelescopeObjective,
)

_HAND_WRITTEN = {
    "AsphericSinglet", "CookeTriplet", "DoubleGauss",
    "TripletTelescopeObjective",
}

for _name in _registry.__all__:
    if _name not in _HAND_WRITTEN:
        globals()[_name] = getattr(_registry, _name)

__all__ = sorted(_HAND_WRITTEN | set(_registry.__all__))
