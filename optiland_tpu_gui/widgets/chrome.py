"""Window-chrome state helpers, Qt-free so the headless suite pins them
(the Qt widgets in title_bar.py/frameless_window.py consume these;
reference behaviors: optiland_gui/widgets/custom_title_bar.py:158-190)."""

from __future__ import annotations


def title_text(project_name: str | None, dirty: bool = False) -> str:
    """Window title string for the current project (reference:
    custom_title_bar.py:172-181 set_project_name)."""
    name = project_name or "untitled"
    star = " •" if dirty else ""
    return f"optiland-tpu — {name}{star}"


def maximize_glyph(is_maximized: bool) -> str:
    """Button glyph for the maximize/restore toggle (reference:
    custom_title_bar.py:183-190 update_maximize_button_state)."""
    return "❐" if is_maximized else "□"
