"""Viewer panel — embedded 2D/3D system drawings with navigation toolbar,
view settings, click-to-inspect, image export, and the interactive WebGL
export (reference: optiland_gui/viewer_panel.py, 832 LoC).

Rendering, the 2D surface hit-test, and every export live in the headless
``optiland_tpu.services.view_models.ViewerPanelModel`` (tested without Qt
in tests/test_view_models.py); this widget binds canvases, the matplotlib
navigation toolbar (pan/zoom/home), and the settings row to it.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from optiland_tpu.services.view_models import ViewerPanelModel

from optiland_tpu_gui.qt import (
    QComboBox,
    QFileDialog,
    QHBoxLayout,
    QLabel,
    QPlainTextEdit,
    QPushButton,
    QSpinBox,
    QTabWidget,
    QVBoxLayout,
    QWidget,
)


class _CanvasTab(QWidget):
    """Figure canvas + the standard matplotlib navigation toolbar
    (pan/zoom/home/save — the reference viewer's camera controls)."""

    def __init__(self, parent=None):
        super().__init__(parent)
        from matplotlib.backends.backend_qtagg import (
            FigureCanvasQTAgg,
            NavigationToolbar2QT,
        )
        from matplotlib.figure import Figure

        self.figure = Figure(figsize=(7, 4.5), tight_layout=True)
        self.canvas = FigureCanvasQTAgg(self.figure)
        self.toolbar = NavigationToolbar2QT(self.canvas, self)
        layout = QVBoxLayout(self)
        layout.addWidget(self.toolbar)
        layout.addWidget(self.canvas)


class ViewerPanel(QWidget):
    def __init__(self, connector, parent=None):
        super().__init__(parent)
        self.connector = connector
        core = getattr(connector, "core", connector)
        self.model = ViewerPanelModel(core)

        # ---- settings row ----
        self.rays_spin = QSpinBox(self)
        self.rays_spin.setRange(1, 256)
        self.rays_spin.setValue(self.model.settings["num_rays"])
        self.rays_spin.valueChanged.connect(self._settings_changed)
        self.wl_combo = QComboBox(self)
        self.wl_combo.addItems(["primary", "all"])
        self.wl_combo.currentTextChanged.connect(self._settings_changed)
        self.export_btn = QPushButton("Export PNG", self)
        self.export_btn.clicked.connect(self._export_png)
        self.web_btn = QPushButton("Interactive 3D…", self)
        self.web_btn.clicked.connect(self._open_interactive)

        top = QHBoxLayout()
        top.addWidget(QLabel("Rays"))
        top.addWidget(self.rays_spin)
        top.addWidget(QLabel("Wavelengths"))
        top.addWidget(self.wl_combo)
        top.addStretch(1)
        top.addWidget(self.export_btn)
        top.addWidget(self.web_btn)

        # ---- tabs ----
        self.tabs = QTabWidget(self)
        self.tab2d = _CanvasTab(self)
        self.tab3d = _CanvasTab(self)
        self.info = QPlainTextEdit(self)
        self.info.setReadOnly(True)
        self.tabs.addTab(self.tab2d, "2D Layout")
        self.tabs.addTab(self.tab3d, "3D Layout")
        self.tabs.addTab(self.info, "Prescription")

        self.status = QLabel("", self)

        layout = QVBoxLayout(self)
        layout.addLayout(top)
        layout.addWidget(self.tabs)
        layout.addWidget(self.status)

        # click-to-inspect on the 2D layout (reference: VTK pick)
        self.tab2d.canvas.mpl_connect("button_press_event", self._pick)

        connector.opticChanged.connect(self.redraw)
        connector.opticLoaded.connect(self.redraw)
        self.redraw()

    # ---------------- settings/redraw ----------------

    def _settings_changed(self, *_):
        self.model.set_num_rays(self.rays_spin.value())
        self.model.set_wavelengths(self.wl_combo.currentText())
        self.redraw()

    def redraw(self):
        optic = self.connector.get_optic()
        if optic is None:
            return
        for tab, drawer in (
            (self.tab2d, self.model.draw_2d),
            (self.tab3d, self._draw3d),
        ):
            fig = tab.figure
            fig.clear()
            try:
                if drawer is self._draw3d:
                    drawer(fig)
                else:
                    drawer(fig.add_subplot(111))
            except Exception as err:
                fig.clear()
                fig.add_subplot(111).text(
                    0.5, 0.5, f"draw failed: {err}", ha="center"
                )
            tab.canvas.draw_idle()
        self._draw_info(optic)

    def _draw3d(self, fig):
        self.model.draw_3d(fig.add_subplot(111, projection="3d"))

    def _draw_info(self, optic):
        from optiland_tpu.visualization import LensInfoViewer

        buf = io.StringIO()
        try:
            with redirect_stdout(buf):
                LensInfoViewer(optic).view()
            self.info.setPlainText(buf.getvalue())
        except Exception as err:
            self.info.setPlainText(f"info failed: {err}")

    # ---------------- interactivity ----------------

    def _pick(self, event):
        if event.inaxes is None or event.xdata is None:
            return
        idx = self.model.pick_2d(float(event.xdata), float(event.ydata))
        info = self.model.picked_info()
        if info is None:
            self.status.setText("")
            return
        self.status.setText(
            f"surface {info['index']} ({info['type']})  "
            f"R={info['radius']:.4g}  t={info['thickness']:.4g}  "
            f"material={info['material']}"
            + ("  [STOP]" if info["is_stop"] else "")
        )

    def _export_png(self):
        path, _ = QFileDialog.getSaveFileName(
            self, "Export layout", "layout.png", "PNG (*.png)"
        )
        if path:
            view = "3d" if self.tabs.currentIndex() == 1 else "2d"
            self.model.export_png(path, view=view)
            self.status.setText(f"saved {path}")

    def _open_interactive(self):
        path = self.model.export_interactive_html()
        import webbrowser

        webbrowser.open("file://" + path)
        self.status.setText(f"interactive viewer: {path}")
