"""Central QAction registry: menus, shortcuts, command palette source
(reference: optiland_gui/action_manager.py).
"""

from __future__ import annotations

from optiland_tpu_gui.qt import QAction, QKeySequence


class ActionManager:
    """Creates and stores named QActions so menus, toolbars, and the
    command palette all share one definition."""

    def __init__(self, window):
        self.window = window
        self.actions: dict[str, QAction] = {}

    def add(self, key: str, text: str, callback, shortcut: str | None = None):
        action = QAction(text, self.window)
        if shortcut:
            action.setShortcut(QKeySequence(shortcut))
        action.triggered.connect(callback)
        self.actions[key] = action
        self.window.addAction(action)
        return action

    def get(self, key: str) -> QAction:
        return self.actions[key]

    def palette_commands(self):
        """(name, callable) pairs for the command palette."""
        return [
            (a.text().replace("&", ""), a.trigger)
            for a in self.actions.values()
        ]
