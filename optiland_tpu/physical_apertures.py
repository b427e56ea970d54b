"""Physical surface apertures: vignetting masks over local coordinates.

Apertures expose ``contains(x, y) -> bool mask``; the trace multiplies ray
intensity by the mask (never compressing the batch), matching the
reference's clip semantics (reference: optiland/physical_apertures/base.py:30-120,
radial.py:31, offset_radial.py:16, elliptical.py:14, rectangular.py:14,
polygon.py:19, boolean ops base.py:259-340).

Apertures are static objects: a per-surface aperture becomes part of the
compiled program (its ``contains`` is pure jnp).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class BaseAperture:
    _registry: dict[str, type] = {}

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        BaseAperture._registry[cls.__name__] = cls

    def contains(self, x, y):
        raise NotImplementedError

    def clip(self, intensity, x, y):
        """Zero intensity outside the aperture."""
        return jnp.where(self.contains(x, y), intensity, 0.0)

    @property
    def extent(self):
        raise NotImplementedError

    def scale(self, factor: float):
        raise NotImplementedError

    # boolean composition (reference: base.py:130-175)
    def __or__(self, other):
        return UnionAperture(self, other)

    __add__ = __or__

    def __and__(self, other):
        return IntersectionAperture(self, other)

    def __sub__(self, other):
        return DifferenceAperture(self, other)

    def to_dict(self):
        return {"type": type(self).__name__}

    @classmethod
    def from_dict(cls, data: dict) -> "BaseAperture":
        """Rebuild an aperture from its dict form via the subclass registry
        (reference: base.py:104-115). Boolean composites rebuild both
        operands recursively."""
        ap_type = data["type"]
        target = BaseAperture._registry[ap_type]
        if issubclass(target, UnionAperture):
            return target(cls.from_dict(data["a"]), cls.from_dict(data["b"]))
        kwargs = {k: v for k, v in data.items() if k != "type"}
        return target(**kwargs)


class RadialAperture(BaseAperture):
    """Annular r_min <= r <= r_max aperture (reference: radial.py:31)."""

    def __init__(self, r_max: float, r_min: float = 0.0):
        self.r_max = r_max
        self.r_min = r_min

    def contains(self, x, y):
        r2 = x**2 + y**2
        return (r2 <= self.r_max**2) & (r2 >= self.r_min**2)

    @property
    def extent(self):
        return (-self.r_max, self.r_max, -self.r_max, self.r_max)

    def scale(self, factor):
        self.r_max *= factor
        self.r_min *= factor

    def to_dict(self):
        return {**super().to_dict(), "r_max": self.r_max, "r_min": self.r_min}


class OffsetRadialAperture(RadialAperture):
    """Radial aperture decentered by (offset_x, offset_y)
    (reference: offset_radial.py:16)."""

    def __init__(self, r_max: float, r_min: float = 0.0,
                 offset_x: float = 0.0, offset_y: float = 0.0):
        super().__init__(r_max, r_min)
        self.offset_x = offset_x
        self.offset_y = offset_y

    def contains(self, x, y):
        return super().contains(x - self.offset_x, y - self.offset_y)

    @property
    def extent(self):
        return (-self.r_max + self.offset_x, self.r_max + self.offset_x,
                -self.r_max + self.offset_y, self.r_max + self.offset_y)

    def to_dict(self):
        return {**super().to_dict(), "offset_x": self.offset_x,
                "offset_y": self.offset_y}


class EllipticalAperture(BaseAperture):
    """(x/a)^2 + (y/b)^2 <= 1 (reference: elliptical.py:14)."""

    def __init__(self, a: float, b: float, offset_x: float = 0.0,
                 offset_y: float = 0.0):
        self.a = a
        self.b = b
        self.offset_x = offset_x
        self.offset_y = offset_y

    def contains(self, x, y):
        xs = (x - self.offset_x) / self.a
        ys = (y - self.offset_y) / self.b
        return xs**2 + ys**2 <= 1.0

    @property
    def extent(self):
        return (-self.a + self.offset_x, self.a + self.offset_x,
                -self.b + self.offset_y, self.b + self.offset_y)

    def scale(self, factor):
        self.a *= factor
        self.b *= factor

    def to_dict(self):
        return {**super().to_dict(), "a": self.a, "b": self.b,
                "offset_x": self.offset_x, "offset_y": self.offset_y}


class RectangularAperture(BaseAperture):
    """x/y extents box (reference: rectangular.py:14)."""

    def __init__(self, x_min: float, x_max: float, y_min: float, y_max: float):
        self.x_min, self.x_max = x_min, x_max
        self.y_min, self.y_max = y_min, y_max

    def contains(self, x, y):
        return (
            (x >= self.x_min) & (x <= self.x_max)
            & (y >= self.y_min) & (y <= self.y_max)
        )

    @property
    def extent(self):
        return (self.x_min, self.x_max, self.y_min, self.y_max)

    def scale(self, factor):
        self.x_min *= factor
        self.x_max *= factor
        self.y_min *= factor
        self.y_max *= factor

    def to_dict(self):
        return {**super().to_dict(), "x_min": self.x_min, "x_max": self.x_max,
                "y_min": self.y_min, "y_max": self.y_max}


class PolygonAperture(BaseAperture):
    """Point-in-polygon via the crossing-number test
    (reference: polygon.py:19)."""

    def __init__(self, x, y):
        self.vx = np.asarray(x, float)
        self.vy = np.asarray(y, float)

    def contains(self, x, y):
        inside = jnp.zeros_like(jnp.asarray(x), dtype=bool)
        n = len(self.vx)
        for i in range(n):
            x1, y1 = self.vx[i], self.vy[i]
            x2, y2 = self.vx[(i + 1) % n], self.vy[(i + 1) % n]
            crosses = ((y1 > y) != (y2 > y)) & (
                x < (x2 - x1) * (y - y1) / (y2 - y1 + 1e-300) + x1
            )
            inside = inside ^ crosses
        return inside

    @property
    def extent(self):
        return (self.vx.min(), self.vx.max(), self.vy.min(), self.vy.max())

    def scale(self, factor):
        self.vx = self.vx * factor
        self.vy = self.vy * factor

    def to_dict(self):
        return {**super().to_dict(), "x": self.vx.tolist(), "y": self.vy.tolist()}


class FileAperture(PolygonAperture):
    """Polygon loaded from a two-column text file (reference: polygon.py:107)."""

    def __init__(self, filepath: str, delimiter=None, skip_header: int = 0):
        data = np.genfromtxt(filepath, delimiter=delimiter,
                             skip_header=skip_header)
        super().__init__(data[:, 0], data[:, 1])
        self.filepath = filepath
        self.delimiter = delimiter
        self.skip_header = skip_header

    def to_dict(self):
        return {"type": type(self).__name__, "filepath": self.filepath,
                "delimiter": self.delimiter, "skip_header": self.skip_header}


class UnionAperture(BaseAperture):
    """A | B (reference: base.py:259)."""

    def __init__(self, a, b):
        self.a, self.b = a, b

    def contains(self, x, y):
        return self.a.contains(x, y) | self.b.contains(x, y)

    @property
    def extent(self):
        ea, eb = self.a.extent, self.b.extent
        return (min(ea[0], eb[0]), max(ea[1], eb[1]),
                min(ea[2], eb[2]), max(ea[3], eb[3]))

    def scale(self, factor):
        self.a.scale(factor)
        self.b.scale(factor)

    def to_dict(self):
        return {**super().to_dict(), "a": self.a.to_dict(),
                "b": self.b.to_dict()}


class IntersectionAperture(UnionAperture):
    """A & B (reference: base.py:286)."""

    def contains(self, x, y):
        return self.a.contains(x, y) & self.b.contains(x, y)


class DifferenceAperture(UnionAperture):
    """A - B (reference: base.py:313)."""

    def contains(self, x, y):
        return self.a.contains(x, y) & ~self.b.contains(x, y)


def configure_aperture(spec):
    """Normalize the surface aperture spec (reference: radial.py
    configure_aperture): scalar = full diameter -> RadialAperture."""
    if spec is None or isinstance(spec, BaseAperture):
        return spec
    if isinstance(spec, (int, float)):
        return RadialAperture(r_max=spec / 2)
    raise ValueError(f"Cannot configure aperture from {spec!r}")
