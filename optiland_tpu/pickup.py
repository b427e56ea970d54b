"""Pickups: linked surface attributes (scale/offset).

(reference: optiland/pickup.py:19-285)
"""

from __future__ import annotations


_ATTRS = ("radius", "conic", "thickness")


class Pickup:
    """One pickup: target attr = source attr * scale + offset.

    ``attr_type`` may also be a generic dotted path on the optic (e.g.
    'surfaces.surfaces[2].material'), in which case the surface indices are
    ignored and the value is copied verbatim
    (reference: pickup.py generic pickups used by MultiConfiguration)."""

    def __init__(self, optic, source_surface_idx, attr_type,
                 target_surface_idx, scale=1, offset=0, source_optic=None):
        self.is_generic = attr_type not in _ATTRS
        if self.is_generic and not any(c in attr_type for c in ".["):
            raise ValueError(f"Invalid pickup attribute {attr_type!r}")
        self.optic = optic
        self.source_optic = source_optic or optic
        self.source_surface_idx = source_surface_idx
        self.attr_type = attr_type
        self.target_surface_idx = target_surface_idx
        self.scale = scale
        self.offset = offset

    def apply(self):
        if self.is_generic:
            from optiland_tpu.utils import get_attr_by_path, set_attr_by_path

            value = get_attr_by_path(self.source_optic, self.attr_type)
            set_attr_by_path(self.optic, self.attr_type, value)
        else:
            src = self.source_optic.surfaces.surfaces[self.source_surface_idx]
            tgt = self.optic.surfaces.surfaces[self.target_surface_idx]
            value = getattr(src, self.attr_type) * self.scale + self.offset
            setattr(tgt, self.attr_type, value)
        self.optic._invalidate()

    def to_dict(self):
        return {
            "source_surface_idx": self.source_surface_idx,
            "attr_type": self.attr_type,
            "target_surface_idx": self.target_surface_idx,
            "scale": self.scale,
            "offset": self.offset,
        }


class PickupManager:
    """Pickup collection on an optic (reference: pickup.py:19-100)."""

    def __init__(self, optic):
        self.optic = optic
        self.pickups: list[Pickup] = []

    def __len__(self):
        return len(self.pickups)

    def add(self, source_surface_idx, attr_type, target_surface_idx,
            scale=1, offset=0, source_optic=None):
        pickup = Pickup(
            self.optic, source_surface_idx, attr_type, target_surface_idx,
            scale, offset, source_optic,
        )
        pickup.apply()
        self.pickups.append(pickup)
        return pickup

    def apply(self):
        for p in self.pickups:
            p.apply()

    def clear(self):
        self.pickups.clear()
