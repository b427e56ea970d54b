"""Multi-configuration (zoom) systems.

A MultiConfiguration is a list of independent Optic instances (one per
configuration) linked by cross-optic pickups, so shared parameters stay in
lock-step with configuration 0 while per-configuration overrides (e.g. zoom
spacings) break the link for that surface only
(reference: optiland/multiconfig/multi_configuration.py:27-406).
"""

from __future__ import annotations

import copy
from typing import Any

from optiland_tpu.utils import set_attr_by_path

_STANDARD_ATTRS = ("radius", "thickness", "conic", "material")


class MultiConfiguration:
    """Manager for zoom/multi-configuration systems
    (reference: multiconfig/multi_configuration.py:27)."""

    def __init__(self, base_optic):
        self.configurations = [base_optic]

    def __len__(self):
        return len(self.configurations)

    def add_configuration(self, source_config_idx: int = 0):
        """Deep-copy a configuration and link it back with pickups."""
        source = self.configurations[source_config_idx]
        new_optic = copy.deepcopy(source)
        self.configurations.append(new_optic)
        self._link(source, new_optic)
        return new_optic

    def _link(self, source, target):
        n = len(source.surfaces.surfaces)
        for i in range(n):
            target.pickups.add(
                source_surface_idx=i, attr_type="radius",
                target_surface_idx=i, source_optic=source,
            )
            target.pickups.add(
                source_surface_idx=i, attr_type="conic",
                target_surface_idx=i, source_optic=source,
            )
            if i < n - 1:
                target.pickups.add(
                    source_surface_idx=i, attr_type="thickness",
                    target_surface_idx=i, source_optic=source,
                )

    # -------------------- property setting --------------------

    def set_property(self, value: Any, configurations="all",
                     surface_index: int | None = None,
                     attribute_path: str | None = None):
        """Set a property on some or all configurations.

        With configurations="all" the value goes to configuration 0 and
        link pickups are (re)created on the others; with an explicit list,
        the link is broken and the value applied per configuration.
        """
        if attribute_path in _STANDARD_ATTRS:
            self._set_standard(attribute_path, surface_index, value,
                               configurations)
            return
        configs = (
            list(range(len(self.configurations)))
            if configurations == "all" else configurations
        )
        for idx in configs:
            if idx == 0:
                self._set_generic(0, surface_index, attribute_path, value)
            elif configurations == "all":
                self._ensure_generic_pickup(idx, surface_index, attribute_path)
            else:
                self._remove_generic_pickup(idx, surface_index, attribute_path)
                self._set_generic(idx, surface_index, attribute_path, value)

    def set_radius(self, surface_index, value, configurations="all"):
        self._set_standard("radius", surface_index, value, configurations)

    def set_thickness(self, surface_index, value, configurations="all"):
        self._set_standard("thickness", surface_index, value, configurations)

    def set_conic(self, surface_index, value, configurations="all"):
        self._set_standard("conic", surface_index, value, configurations)

    def set_material(self, surface_index, value, configurations="all"):
        self._set_standard("material", surface_index, value, configurations)

    def set_surface_property(self, surface_index, attribute_path, value,
                             configurations="all"):
        self.set_property(value, configurations, surface_index,
                          attribute_path)

    def set_optic_property(self, attribute_path, value, configurations="all"):
        self.set_property(value, configurations, None, attribute_path)

    def _set_standard(self, attr, surface_index, value, configurations):
        configs = (
            list(range(len(self.configurations)))
            if configurations == "all" else configurations
        )
        for idx in configs:
            if idx == 0:
                self._apply_standard(0, surface_index, attr, value)
            elif configurations == "all":
                if attr == "material":
                    self._ensure_generic_pickup(idx, surface_index, "material")
                else:
                    self._ensure_pickup(idx, surface_index, attr)
            else:
                if attr == "material":
                    self._remove_generic_pickup(idx, surface_index, "material")
                else:
                    self._remove_pickup(idx, surface_index, attr)
                self._apply_standard(idx, surface_index, attr, value)
        # re-apply links so dependent configurations pick up the new value
        for idx in range(1, len(self.configurations)):
            self.configurations[idx].pickups.apply()

    def _apply_standard(self, config_idx, surface_index, attr, value):
        optic = self.configurations[config_idx]
        if attr == "radius":
            optic.set_radius(value, surface_index)
        elif attr == "conic":
            optic.set_conic(value, surface_index)
        elif attr == "thickness":
            optic.set_thickness(value, surface_index)
        elif attr == "material":
            optic.set_material(value, surface_index)

    def _set_generic(self, config_idx, surface_index, path, value):
        optic = self.configurations[config_idx]
        full = (
            f"surfaces.surfaces[{surface_index}].{path}"
            if surface_index is not None else path
        )
        set_attr_by_path(optic, full, value)
        optic._invalidate()

    def _ensure_pickup(self, config_idx, surface_index, attr):
        optic = self.configurations[config_idx]
        for p in optic.pickups.pickups:
            if (p.target_surface_idx == surface_index
                    and p.attr_type == attr
                    and p.source_optic is self.configurations[0]):
                return
        optic.pickups.add(
            source_surface_idx=surface_index, attr_type=attr,
            target_surface_idx=surface_index,
            source_optic=self.configurations[0],
        )

    def _remove_pickup(self, config_idx, surface_index, attr):
        optic = self.configurations[config_idx]
        optic.pickups.pickups[:] = [
            p for p in optic.pickups.pickups
            if not (p.target_surface_idx == surface_index
                    and p.attr_type == attr)
        ]

    def _ensure_generic_pickup(self, config_idx, surface_index, path):
        optic = self.configurations[config_idx]
        source = self.configurations[0]
        full = (
            f"surfaces.surfaces[{surface_index}].{path}"
            if surface_index is not None else path
        )
        for p in optic.pickups.pickups:
            if p.attr_type == full and p.source_optic is source:
                return
        optic.pickups.add(
            source_surface_idx=0, attr_type=full, target_surface_idx=0,
            source_optic=source,
        )

    def _remove_generic_pickup(self, config_idx, surface_index, path):
        optic = self.configurations[config_idx]
        full = (
            f"surfaces.surfaces[{surface_index}].{path}"
            if surface_index is not None else path
        )
        optic.pickups.pickups[:] = [
            p for p in optic.pickups.pickups if p.attr_type != full
        ]

    def current_config(self, index: int):
        return self.configurations[index]

    def apply(self):
        """Re-apply all pickup links across configurations."""
        for optic in self.configurations[1:]:
            optic.pickups.apply()

    def draw(self, figsize=None, **kwargs):
        """Draw every configuration stacked vertically
        (reference: multi_configuration.py:370-406)."""
        import matplotlib.pyplot as plt

        from optiland_tpu.visualization import OpticViewer

        n = len(self.configurations)
        fig, axes = plt.subplots(
            n, 1, figsize=figsize or (8, 3 * n), squeeze=False
        )
        for k, optic in enumerate(self.configurations):
            OpticViewer(optic).view(ax=axes[k][0], **kwargs)
            axes[k][0].set_title(f"Configuration {k}")
        return fig, axes
