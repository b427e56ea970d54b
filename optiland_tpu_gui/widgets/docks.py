"""Custom dock widgets with a compact title bar
(reference: optiland_gui/widgets/custom_dock_widget.py:10,
custom_dock_title_bar.py)."""

from __future__ import annotations

from optiland_tpu_gui.qt import (
    QDockWidget,
    QHBoxLayout,
    QLabel,
    QPushButton,
    Qt,
    QWidget,
)


class DockTitleBar(QWidget):
    """Slim title bar: label + float/close buttons
    (reference: custom_dock_title_bar.py)."""

    def __init__(self, dock: QDockWidget, title: str) -> None:
        super().__init__(dock)
        self._dock = dock
        layout = QHBoxLayout(self)
        layout.setContentsMargins(8, 2, 4, 2)
        self._label = QLabel(title)
        layout.addWidget(self._label)
        layout.addStretch(1)

        float_btn = QPushButton("❐")
        float_btn.setFlat(True)
        float_btn.setFixedSize(18, 18)
        float_btn.setToolTip("Float panel")
        float_btn.clicked.connect(
            lambda: dock.setFloating(not dock.isFloating())
        )
        layout.addWidget(float_btn)

        close_btn = QPushButton("✕")
        close_btn.setFlat(True)
        close_btn.setFixedSize(18, 18)
        close_btn.setToolTip("Hide panel")
        close_btn.clicked.connect(dock.close)
        layout.addWidget(close_btn)

    def set_title(self, title: str) -> None:
        self._label.setText(title)


class CustomDockWidget(QDockWidget):
    """QDockWidget with the compact title bar and sane default features
    (reference: custom_dock_widget.py:10-40)."""

    def __init__(self, title: str, parent: QWidget | None = None) -> None:
        super().__init__(title, parent)
        self.setObjectName(f"dock_{title.lower().replace(' ', '_')}")
        self.setAllowedAreas(Qt.DockWidgetArea.AllDockWidgetAreas)
        self.setFeatures(
            QDockWidget.DockWidgetFeature.DockWidgetMovable
            | QDockWidget.DockWidgetFeature.DockWidgetFloatable
            | QDockWidget.DockWidgetFeature.DockWidgetClosable
        )
        self._title_bar = DockTitleBar(self, title)
        self.setTitleBarWidget(self._title_bar)

    def setWidget(self, widget: QWidget) -> None:  # noqa: N802 (Qt API)
        widget.setMinimumWidth(120)
        super().setWidget(widget)
