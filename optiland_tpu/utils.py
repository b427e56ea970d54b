"""Attribute-path helpers shared by pickups and multi-configurations, plus
field/wavelength resolution with weights
(reference: optiland/utils.py:17-330)."""

from __future__ import annotations

import re
from typing import Any, NamedTuple


class FieldPoint(NamedTuple):
    """Normalized field coordinate + relative weight
    (reference: utils.py:17-28)."""

    coord: tuple
    weight: float = 1.0


class WavelengthPoint(NamedTuple):
    """Wavelength value in um + relative weight (reference: utils.py:31-42)."""

    value: float
    weight: float = 1.0


def resolve_fields(optic, fields) -> list[FieldPoint]:
    """Resolve a fields argument ('all', list/tuple of coords, or index)
    into FieldPoints; weights come from the optic only for 'all'
    (reference: utils.py:188-226)."""
    if isinstance(fields, str):
        if fields == "all":
            coords = optic.fields.get_field_coords()
            weights = optic.fields.weights
            return [
                FieldPoint(coord=c, weight=w)
                for c, w in zip(coords, weights)
            ]
        raise ValueError("Invalid field string. Must be 'all'.")
    if isinstance(fields, list):
        return [FieldPoint(coord=c, weight=1.0) for c in fields]
    if isinstance(fields, tuple):
        return [FieldPoint(coord=fields, weight=1.0)]
    if isinstance(fields, int):
        coords = optic.fields.get_field_coords()
        return [FieldPoint(coord=coords[fields], weight=1.0)]
    raise TypeError(
        "Fields must be a string ('all'), a list, a tuple, or an int."
    )


def resolve_wavelengths(optic, wavelengths) -> list[WavelengthPoint]:
    """Resolve a wavelengths argument ('all', 'primary', or a list of um
    values) into WavelengthPoints (reference: utils.py:152-185)."""
    if isinstance(wavelengths, str):
        if wavelengths == "all":
            return [
                WavelengthPoint(value=w.value, weight=w.weight)
                for w in optic.wavelengths.wavelengths
            ]
        if wavelengths == "primary":
            idx = optic.wavelengths.primary_index
            w = optic.wavelengths.wavelengths[idx]
            return [WavelengthPoint(value=w.value, weight=w.weight)]
        raise ValueError(
            "Invalid wavelength string. Must be 'all' or 'primary'."
        )
    if isinstance(wavelengths, list):
        return [WavelengthPoint(value=float(v), weight=1.0)
                for v in wavelengths]
    raise TypeError(
        "Wavelengths must be a string ('all', 'primary') or a list."
    )


def active_fields(resolved: list[FieldPoint]) -> list[FieldPoint]:
    """Only the FieldPoints with weight > 0 (reference: utils.py:109-118)."""
    return [fp for fp in resolved if fp.weight > 0.0]


def active_wavelengths(
    resolved: list[WavelengthPoint],
) -> list[WavelengthPoint]:
    """Only the WavelengthPoints with weight > 0
    (reference: utils.py:120-129)."""
    return [wp for wp in resolved if wp.weight > 0.0]


def weighted_average(values, weights) -> float:
    """Sum(w*x)/Sum(w) with a guard against all-zero weights
    (reference: utils.py:132-149)."""
    total = sum(weights)
    if total == 0.0:
        raise ValueError(
            "Cannot compute weighted average: all weights are zero."
        )
    return sum(w * v for w, v in zip(weights, values)) / total


def _get_item(current_obj, key):
    match = re.match(r"(\w+)\[(\d+)\]", key)
    if match:
        attr_name, index = match.groups()
        return getattr(current_obj, attr_name)[int(index)]
    return getattr(current_obj, key)


def get_attr_by_path(obj: Any, path: str) -> Any:
    """Dotted attribute lookup with list indexing
    (e.g. 'surfaces.surfaces[1].radius')."""
    for part in path.split("."):
        obj = _get_item(obj, part)
    return obj


def set_attr_by_path(obj: Any, path: str, value: Any) -> None:
    """Dotted attribute assignment with list indexing."""
    parts = path.split(".")
    for part in parts[:-1]:
        obj = _get_item(obj, part)
    final = parts[-1]
    match = re.match(r"(\w+)\[(\d+)\]", final)
    if match:
        attr_name, index = match.groups()
        getattr(obj, attr_name)[int(index)] = value
    else:
        setattr(obj, final, value)
