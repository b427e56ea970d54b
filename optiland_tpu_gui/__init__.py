"""PySide6 GUI for optiland_tpu.

Mirrors the reference application's structure (reference:
optiland_gui/main_window.py, optiland_connector.py, lens_editor.py,
analysis_panel.py, optimization_panel.py, system_properties_panel.py,
viewer_panel.py, widgets/) but keeps all business logic in the headless
``optiland_tpu.services`` layer; the Qt classes here are thin widgets that
subscribe to connector events and re-emit them as Qt signals.

Importing this package does NOT import Qt. Import the submodules (or call
:func:`main`) to build the actual widgets; they raise a clear ImportError
when PySide6 is unavailable.
"""

from __future__ import annotations

__all__ = ["main", "HAS_QT"]


def _has_qt() -> bool:
    import importlib.util

    return importlib.util.find_spec("PySide6") is not None


HAS_QT = _has_qt()


def main(argv=None):
    """Launch the GUI (console-script entry; reference: run_gui.py)."""
    from optiland_tpu_gui.run_gui import main as _main

    return _main(argv)
