"""Viewer panel — embedded 2D/3D system drawings + prescription text
(reference: optiland_gui/viewer_panel.py, 832 LoC).

2D tab embeds optiland_tpu.visualization.OpticViewer on a Qt canvas and
redraws on every optic change; 3D tab uses the matplotlib-3D viewer
(optiland_tpu.visualization.OpticViewer3D); Info tab shows the
LensInfoViewer prescription tables as text.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from optiland_tpu_gui.qt import (
    QPlainTextEdit,
    QTabWidget,
    QVBoxLayout,
    QWidget,
)


class _CanvasTab(QWidget):
    def __init__(self, parent=None):
        super().__init__(parent)
        from matplotlib.backends.backend_qtagg import FigureCanvasQTAgg
        from matplotlib.figure import Figure

        self.figure = Figure(figsize=(7, 4.5), tight_layout=True)
        self.canvas = FigureCanvasQTAgg(self.figure)
        layout = QVBoxLayout(self)
        layout.addWidget(self.canvas)


class ViewerPanel(QWidget):
    def __init__(self, connector, parent=None):
        super().__init__(parent)
        self.connector = connector
        self.tabs = QTabWidget(self)
        self.tab2d = _CanvasTab(self)
        self.tab3d = _CanvasTab(self)
        self.info = QPlainTextEdit(self)
        self.info.setReadOnly(True)
        self.tabs.addTab(self.tab2d, "2D Layout")
        self.tabs.addTab(self.tab3d, "3D Layout")
        self.tabs.addTab(self.info, "Prescription")

        layout = QVBoxLayout(self)
        layout.addWidget(self.tabs)

        connector.opticChanged.connect(self.redraw)
        connector.opticLoaded.connect(self.redraw)
        self.redraw()

    def redraw(self):
        optic = self.connector.get_optic()
        if optic is None:
            return
        self._draw_2d(optic)
        self._draw_3d(optic)
        self._draw_info(optic)

    def _draw_2d(self, optic):
        from optiland_tpu.visualization import OpticViewer

        fig = self.tab2d.figure
        fig.clear()
        try:
            OpticViewer(optic).view(ax=fig.add_subplot(111))
        except Exception as err:
            fig.clear()
            ax = fig.add_subplot(111)
            ax.text(0.5, 0.5, f"2D draw failed: {err}", ha="center")
        self.tab2d.canvas.draw_idle()

    def _draw_3d(self, optic):
        from optiland_tpu.visualization import OpticViewer3D

        fig = self.tab3d.figure
        fig.clear()
        try:
            OpticViewer3D(optic).view(
                ax=fig.add_subplot(111, projection="3d")
            )
        except Exception as err:
            fig.clear()
            ax = fig.add_subplot(111)
            ax.text(0.5, 0.5, f"3D draw failed: {err}", ha="center")
        self.tab3d.canvas.draw_idle()

    def _draw_info(self, optic):
        from optiland_tpu.visualization import LensInfoViewer

        buf = io.StringIO()
        try:
            with redirect_stdout(buf):
                LensInfoViewer(optic).view()
            self.info.setPlainText(buf.getvalue())
        except Exception as err:
            self.info.setPlainText(f"info failed: {err}")
