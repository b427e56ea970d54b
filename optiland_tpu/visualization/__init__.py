"""System visualization: 2D cross-sections, 3D layouts, ray paths,
prescription report.

(reference: optiland/visualization/system/optic_viewer.py:24, rays.py:19,
surface.py:19, lens.py:19, optic_viewer_3d.py:22,
info/lens_info_viewer.py:31, themes.py:36-164)
"""

from optiland_tpu.visualization.viewer import OpticViewer, draw_system
from optiland_tpu.visualization.viewer3d import (
    InteractionManager,
    Lens3D,
    Mirror3D,
    OpticViewer3D,
    Rays3D,
    Surface3D,
)
from optiland_tpu.visualization.webgl import OpticViewer3DHTML
from optiland_tpu.visualization.info import LensInfoViewer
from optiland_tpu.visualization.themes import Theme, set_theme, theme_context

__all__ = [
    "InteractionManager",
    "Lens3D",
    "LensInfoViewer",
    "Mirror3D",
    "OpticViewer",
    "OpticViewer3D",
    "OpticViewer3DHTML",
    "Rays3D",
    "Surface3D",
    "Theme",
    "draw_system",
    "set_theme",
    "theme_context",
]
