"""System visualization: 2D cross-sections, ray paths, prescription report.

(reference: optiland/visualization/system/optic_viewer.py:24, rays.py:19,
surface.py:19, lens.py:19, info/lens_info_viewer.py:31, themes.py:36-164)
"""

from optiland_tpu.visualization.viewer import OpticViewer, draw_system
from optiland_tpu.visualization.info import LensInfoViewer
from optiland_tpu.visualization.themes import Theme, set_theme, theme_context

__all__ = [
    "LensInfoViewer",
    "OpticViewer",
    "Theme",
    "draw_system",
    "set_theme",
    "theme_context",
]
