"""Collapsible navigation sidebar (reference: optiland_gui/widgets/sidebar.py:30).

A vertical strip of toggle buttons that shows/hides the main dock panels.
Collapsed, it shows icons only; expanded, icon + label. Buttons emit
``panel_requested`` with the panel key so the main window can raise the
corresponding dock.
"""

from __future__ import annotations

from optiland_tpu_gui.qt import (
    QHBoxLayout,
    QPushButton,
    Qt,
    QVBoxLayout,
    QWidget,
    Signal,
)

#: (key, label, icon glyph) for every navigable panel
PANELS = (
    ("lens_editor", "Lens Editor", "▤"),
    ("viewer", "Viewer", "◉"),
    ("analysis", "Analysis", "∀"),
    ("optimization", "Optimization", "↘"),
    ("system", "System Properties", "⚙"),
    ("terminal", "Console", ">_"),
)


class SidebarWidget(QWidget):
    """Icon rail with panel toggles (reference: sidebar.py:30-210)."""

    panel_requested = Signal(str)
    collapse_changed = Signal(bool)

    EXPANDED_WIDTH = 168
    COLLAPSED_WIDTH = 44

    def __init__(self, parent: QWidget | None = None) -> None:
        super().__init__(parent)
        self._collapsed = False
        self._buttons: dict[str, QPushButton] = {}

        layout = QVBoxLayout(self)
        layout.setContentsMargins(4, 6, 4, 6)
        layout.setSpacing(2)

        self._toggle = QPushButton("☰")
        self._toggle.setFlat(True)
        self._toggle.setToolTip("Collapse sidebar")
        self._toggle.clicked.connect(
            lambda: self.set_collapsed(not self._collapsed)
        )
        header = QHBoxLayout()
        header.addWidget(self._toggle)
        header.addStretch(1)
        layout.addLayout(header)

        for key, label, glyph in PANELS:
            btn = QPushButton(f"{glyph}  {label}")
            btn.setFlat(True)
            btn.setToolTip(label)
            btn.setProperty("panel_key", key)
            btn.clicked.connect(
                lambda _=False, k=key: self.panel_requested.emit(k)
            )
            layout.addWidget(btn)
            self._buttons[key] = btn

        layout.addStretch(1)
        self.setFixedWidth(self.EXPANDED_WIDTH)

    # ------------------------------------------------------------------

    @property
    def collapsed(self) -> bool:
        return self._collapsed

    def set_collapsed(self, collapsed: bool) -> None:
        """Shrink to the icon rail / restore labels
        (reference: sidebar.py:156-201)."""
        self._collapsed = bool(collapsed)
        for (key, label, glyph), btn in zip(PANELS, self._buttons.values()):
            btn.setText(glyph if self._collapsed else f"{glyph}  {label}")
        self.setFixedWidth(
            self.COLLAPSED_WIDTH if self._collapsed else self.EXPANDED_WIDTH
        )
        self._toggle.setToolTip(
            "Expand sidebar" if self._collapsed else "Collapse sidebar"
        )
        self.collapse_changed.emit(self._collapsed)

    def set_active(self, key: str) -> None:
        """Highlight the button for the currently raised panel."""
        for k, btn in self._buttons.items():
            btn.setStyleSheet(
                "font-weight: bold;" if k == key else ""
            )
