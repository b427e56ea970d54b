"""Pickups: linked surface attributes (scale/offset).

(reference: optiland/pickup.py:19-285)
"""

from __future__ import annotations


_ATTRS = ("radius", "conic", "thickness")


class Pickup:
    """One pickup: target attr = source attr * scale + offset."""

    def __init__(self, optic, source_surface_idx, attr_type,
                 target_surface_idx, scale=1, offset=0, source_optic=None):
        if attr_type not in _ATTRS:
            raise ValueError(f"Invalid pickup attribute {attr_type!r}")
        self.optic = optic
        self.source_optic = source_optic or optic
        self.source_surface_idx = source_surface_idx
        self.attr_type = attr_type
        self.target_surface_idx = target_surface_idx
        self.scale = scale
        self.offset = offset

    def apply(self):
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
