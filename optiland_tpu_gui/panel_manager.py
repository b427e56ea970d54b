"""Dock-panel creation and layout management
(reference: optiland_gui/panel_manager.py).
"""

from __future__ import annotations

from optiland_tpu_gui.qt import QDockWidget, Qt
from optiland_tpu_gui.widgets.docks import CustomDockWidget


class PanelManager:
    """Registers dockable panels on the main window and provides
    show/hide toggles for the View menu."""

    def __init__(self, window):
        self.window = window
        self.docks: dict[str, QDockWidget] = {}

    def add_panel(self, key: str, title: str, widget, area=None):
        if area is None:
            area = Qt.DockWidgetArea.RightDockWidgetArea
        dock = CustomDockWidget(title, self.window)
        dock.setObjectName(f"dock_{key}")
        dock.setWidget(widget)
        self.window.addDockWidget(area, dock)
        self.docks[key] = dock
        return dock

    def toggle(self, key: str):
        dock = self.docks[key]
        dock.setVisible(not dock.isVisible())

    def raise_panel(self, key: str):
        """Show and raise a (possibly tabified) panel — sidebar navigation
        target (reference: panel_manager.py raise behavior)."""
        dock = self.docks[key]
        dock.setVisible(True)
        dock.raise_()

    def get(self, key: str):
        return self.docks[key]

    def tabify(self, key_a: str, key_b: str):
        self.window.tabifyDockWidget(self.docks[key_a], self.docks[key_b])
