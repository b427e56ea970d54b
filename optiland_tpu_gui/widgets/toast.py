"""Transient toast notifications (reference: optiland_gui/widgets/toast.py)."""

from __future__ import annotations

from optiland_tpu_gui.qt import QLabel, Qt, QTimer


class Toast(QLabel):
    def __init__(self, parent, text: str, msec: int = 2500):
        super().__init__(text, parent)
        self.setAlignment(Qt.AlignmentFlag.AlignCenter)
        self.setStyleSheet(
            "background-color: rgba(40,42,48,220); color: #e8e8ec;"
            "border-radius: 6px; padding: 8px 18px;"
        )
        self.adjustSize()
        if parent is not None:
            geo = parent.geometry()
            self.move(
                (geo.width() - self.width()) // 2,
                geo.height() - self.height() - 40,
            )
        self.show()
        QTimer.singleShot(msec, self.deleteLater)


def show_toast(parent, text: str, msec: int = 2500) -> Toast:
    return Toast(parent, text, msec)
