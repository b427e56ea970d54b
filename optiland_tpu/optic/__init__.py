from optiland_tpu.optic.optic import Optic, TraceResult

__all__ = ["Optic", "TraceResult"]
