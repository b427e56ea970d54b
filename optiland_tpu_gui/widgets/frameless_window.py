"""Frameless main window with edge-resize and drag support
(reference: optiland_gui/widgets/frameless_window.py:18-190).

All hit-test/cursor/geometry math lives in Qt-free helpers
(optiland_tpu_gui.plot_utils.resize_hit_area / cursor_for_area /
resized_geometry) so it is exercised by the headless test suite; this
class only translates Qt mouse events into those calls.
"""

from __future__ import annotations

from optiland_tpu_gui.plot_utils import (
    cursor_for_area,
    resize_hit_area,
    resized_geometry,
)
from optiland_tpu_gui.qt import QMainWindow, Qt, QtCore, QtGui

_RESIZE_MARGIN = 6

_QT_CURSORS = {
    "size-ver": Qt.SizeVerCursor,
    "size-hor": Qt.SizeHorCursor,
    "size-fdiag": Qt.SizeFDiagCursor,
    "size-bdiag": Qt.SizeBDiagCursor,
    "arrow": Qt.ArrowCursor,
}


class FramelessWindow(QMainWindow):
    """QMainWindow that supports running without the native frame: call
    ``enable_frameless()`` (or construct with ``frameless=True``) and the
    custom title bar drags it, the outer margin resizes it, F11 toggles
    fullscreen. With the native frame left on, every handler defers to
    QMainWindow — so subclasses can offer both chromes."""

    def __init__(self, parent=None, frameless: bool = False):
        super().__init__(parent)
        self._frameless = False
        self.setMouseTracking(True)
        self._resize_area: str | None = None
        self._press_pos: QtCore.QPoint | None = None
        self._press_geom: tuple | None = None
        if frameless:
            self.enable_frameless()

    def enable_frameless(self):
        self._frameless = True
        self.setWindowFlags(Qt.FramelessWindowHint | Qt.Window)

    # -- resize via the window edge ------------------------------------
    def _area_at(self, pos) -> str | None:
        return resize_hit_area(
            pos.x(), pos.y(), self.width(), self.height(),
            margin=_RESIZE_MARGIN,
        )

    def mousePressEvent(self, event):
        if (self._frameless and event.button() == Qt.LeftButton
                and not self.isMaximized()):
            area = self._area_at(event.position().toPoint())
            if area is not None:
                self._resize_area = area
                self._press_pos = event.globalPosition().toPoint()
                g = self.geometry()
                self._press_geom = (g.x(), g.y(), g.width(), g.height())
                event.accept()
                return
        super().mousePressEvent(event)

    def mouseMoveEvent(self, event):
        if self._resize_area is not None and self._press_pos is not None:
            delta = event.globalPosition().toPoint() - self._press_pos
            x, y, w, h = resized_geometry(
                self._press_geom, self._resize_area,
                delta.x(), delta.y(),
                min_w=self.minimumWidth() or 400,
                min_h=self.minimumHeight() or 300,
            )
            self.setGeometry(int(x), int(y), int(w), int(h))
            event.accept()
            return
        if self._frameless:
            # hover feedback
            area = self._area_at(event.position().toPoint())
            self.setCursor(QtGui.QCursor(_QT_CURSORS[cursor_for_area(area)]))
        super().mouseMoveEvent(event)

    def mouseReleaseEvent(self, event):
        self._resize_area = None
        self._press_pos = None
        self._press_geom = None
        super().mouseReleaseEvent(event)

    # -- keyboard ------------------------------------------------------
    def keyPressEvent(self, event):
        if event.key() == Qt.Key_F11:
            if self.isFullScreen():
                self.showNormal()
            else:
                self.showFullScreen()
            event.accept()
            return
        super().keyPressEvent(event)
