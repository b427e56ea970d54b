"""Small attribute-path helpers shared by pickups and multi-configurations
(reference: optiland/utils.py:256-330)."""

from __future__ import annotations

import re
from typing import Any


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
