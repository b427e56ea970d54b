"""Custom window title bar: project name, window buttons, drag-to-move
(reference: optiland_gui/widgets/custom_title_bar.py:34-227).

State transitions (project name formatting, maximize-button glyph,
double-click semantics) are small pure helpers so the headless suite can
pin them; the widget wires them to Qt events.
"""

from __future__ import annotations

from optiland_tpu_gui.qt import (
    QHBoxLayout,
    QLabel,
    QPushButton,
    Qt,
    QWidget,
)
from optiland_tpu_gui.widgets.chrome import maximize_glyph, title_text


class TitleBar(QWidget):
    """Slim draggable title bar with min/max/close buttons."""

    HEIGHT = 34

    def __init__(self, window, project_name: str | None = None):
        super().__init__(window)
        self._window = window
        self._drag_offset = None
        self.setFixedHeight(self.HEIGHT)

        layout = QHBoxLayout(self)
        layout.setContentsMargins(12, 0, 6, 0)
        self._label = QLabel(title_text(project_name))
        layout.addWidget(self._label)
        layout.addStretch(1)

        for glyph, slot, tip in (
            ("–", window.showMinimized, "Minimize"),
            (maximize_glyph(False), self._toggle_max, "Maximize"),
            ("✕", window.close, "Close"),
        ):
            btn = QPushButton(glyph)
            btn.setFlat(True)
            btn.setFixedSize(26, 26)
            btn.setToolTip(tip)
            btn.clicked.connect(slot)
            layout.addWidget(btn)
        self._max_btn = self.findChildren(QPushButton)[1]

    # -- state ---------------------------------------------------------
    def set_project_name(self, name: str | None, dirty: bool = False):
        self._label.setText(title_text(name, dirty))

    def _toggle_max(self):
        if self._window.isMaximized():
            self._window.showNormal()
        else:
            self._window.showMaximized()
        self._max_btn.setText(maximize_glyph(self._window.isMaximized()))

    # -- drag to move ----------------------------------------------------
    def mousePressEvent(self, event):
        if event.button() == Qt.LeftButton:
            self._drag_offset = (
                event.globalPosition().toPoint()
                - self._window.frameGeometry().topLeft()
            )
            event.accept()

    def mouseMoveEvent(self, event):
        if self._drag_offset is not None and not self._window.isMaximized():
            self._window.move(
                event.globalPosition().toPoint() - self._drag_offset
            )
            event.accept()

    def mouseReleaseEvent(self, event):
        self._drag_offset = None

    def mouseDoubleClickEvent(self, event):
        self._toggle_max()
        event.accept()
