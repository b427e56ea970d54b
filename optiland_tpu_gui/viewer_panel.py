"""Viewer panel — embedded 2D/3D system drawings with navigation toolbar,
wheel-zoom/drag-pan (zoom preserved across system edits), view settings,
click-to-inspect, a surface-sag viewer tab with live cursor readout, image
export, and the interactive WebGL export
(reference: optiland_gui/viewer_panel.py, 832 LoC — MatplotlibViewer mouse
navigation :460-567, SagViewer :57-242).

Rendering, the 2D surface hit-test, navigation state (ViewNavModel), the
sag profiles (SagViewerModel), and every export live in headless
``optiland_tpu.services.view_models`` classes (tested without Qt in
tests/test_view_models*.py); this widget binds canvases and events to
them.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from optiland_tpu.services.view_models import (
    SagViewerModel,
    ViewNavModel,
    ViewerPanelModel,
)

from optiland_tpu_gui.qt import (
    QComboBox,
    QDoubleSpinBox,
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


class SagViewerTab(QWidget):
    """Surface-sag cross sections + 2-D map with a live cursor readout
    (reference: viewer_panel.py:57-242 SagViewer). All data comes from
    SagViewerModel; this widget owns only the canvas and the controls."""

    def __init__(self, connector, parent=None):
        super().__init__(parent)
        core = getattr(connector, "core", connector)
        self.model = SagViewerModel(core)

        from matplotlib.backends.backend_qtagg import FigureCanvasQTAgg
        from matplotlib.figure import Figure

        self.figure = Figure(figsize=(7, 4.5), tight_layout=True)
        self.canvas = FigureCanvasQTAgg(self.figure)

        self.surf_combo = QComboBox(self)
        self.x_spin = QDoubleSpinBox(self)
        self.y_spin = QDoubleSpinBox(self)
        for spin in (self.x_spin, self.y_spin):
            spin.setRange(-1e4, 1e4)
            spin.setDecimals(3)
            spin.valueChanged.connect(self._replot)
        self.export_btn = QPushButton("Export CSV", self)
        self.export_btn.clicked.connect(self._export_csv)
        self.readout = QLabel("", self)

        top = QHBoxLayout()
        top.addWidget(QLabel("Surface"))
        top.addWidget(self.surf_combo)
        top.addWidget(QLabel("x cut"))
        top.addWidget(self.x_spin)
        top.addWidget(QLabel("y cut"))
        top.addWidget(self.y_spin)
        top.addStretch(1)
        top.addWidget(self.export_btn)

        layout = QVBoxLayout(self)
        layout.addLayout(top)
        layout.addWidget(self.canvas)
        layout.addWidget(self.readout)

        self.canvas.mpl_connect("motion_notify_event", self._on_move)
        self.surf_combo.currentIndexChanged.connect(self._on_surface)
        self.refresh()

    def refresh(self):
        self.surf_combo.blockSignals(True)
        self.surf_combo.clear()
        self.surf_combo.addItems(self.model.surface_labels())
        self.surf_combo.blockSignals(False)
        self._replot()

    def _on_surface(self, combo_idx: int):
        self.model.set_surface(combo_idx + 1)  # combo skips OBJ
        self._replot()

    def _replot(self, *_):
        self.model.x_cross = float(self.x_spin.value())
        self.model.y_cross = float(self.y_spin.value())
        fig = self.figure
        fig.clear()
        ax1 = fig.add_subplot(121)
        ax2 = fig.add_subplot(122)
        try:
            r, zx, zy = self.model.profiles()
            ax1.plot(r, zx, label=f"y = {self.model.y_cross:g}")
            ax1.plot(r, zy, "--", label=f"x = {self.model.x_cross:g}")
            ax1.set_xlabel("r (mm)")
            ax1.set_ylabel("sag (mm)")
            ax1.legend(fontsize=7)
            X, Y, Z = self.model.sag_map()
            m = ax2.contourf(X, Y, Z, levels=21)
            fig.colorbar(m, ax=ax2, label="sag (mm)")
            ax2.set_aspect("equal")
        except Exception as err:
            ax1.text(0.5, 0.5, f"sag failed: {err}", ha="center")
        self.canvas.draw_idle()

    def _on_move(self, event):
        if event.inaxes is None or event.xdata is None:
            return
        try:
            self.readout.setText(
                self.model.cursor_readout(
                    float(event.xdata), float(event.ydata)
                )
            )
        except Exception:
            pass

    def _export_csv(self):
        path, _ = QFileDialog.getSaveFileName(
            self, "Export sag profile", "sag.csv", "CSV (*.csv)"
        )
        if path:
            self.model.export_csv(path)


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

        self.reset_btn = QPushButton("Reset view", self)
        self.reset_btn.clicked.connect(self._reset_view)
        top.addWidget(self.reset_btn)

        # ---- tabs ----
        self.tabs = QTabWidget(self)
        self.tab2d = _CanvasTab(self)
        self.tab3d = _CanvasTab(self)
        self.sag_tab = SagViewerTab(connector, self)
        self.info = QPlainTextEdit(self)
        self.info.setReadOnly(True)
        self.tabs.addTab(self.tab2d, "2D Layout")
        self.tabs.addTab(self.tab3d, "3D Layout")
        self.tabs.addTab(self.sag_tab, "Surface Sag")
        self.tabs.addTab(self.info, "Prescription")

        self.status = QLabel("", self)

        layout = QVBoxLayout(self)
        layout.addLayout(top)
        layout.addWidget(self.tabs)
        layout.addWidget(self.status)

        # click-to-inspect on the 2D layout (reference: VTK pick)
        self.tab2d.canvas.mpl_connect("button_press_event", self._pick)
        # wheel zoom + drag pan on the 2D layout, preserved across
        # redraws (reference: MatplotlibViewer :460-567); state lives in
        # the headless ViewNavModel
        self.nav = ViewNavModel()
        c2d = self.tab2d.canvas
        c2d.mpl_connect("scroll_event", self._on_scroll)
        c2d.mpl_connect("button_press_event", self._on_press)
        c2d.mpl_connect("motion_notify_event", self._on_drag)
        c2d.mpl_connect("button_release_event", self._on_release)

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
                    ax = fig.add_subplot(111)
                    drawer(ax)
                    # remember home bounds; re-apply user zoom so an
                    # edit-triggered redraw doesn't yank the camera
                    self.nav.set_home(ax.get_xlim(), ax.get_ylim())
                    if self.nav.is_zoomed:
                        ax.set_xlim(self.nav.xlim)
                        ax.set_ylim(self.nav.ylim)
            except Exception as err:
                fig.clear()
                fig.add_subplot(111).text(
                    0.5, 0.5, f"draw failed: {err}", ha="center"
                )
            tab.canvas.draw_idle()
        self.sag_tab.refresh()
        self._draw_info(optic)

    # ---------------- 2D navigation (ViewNavModel-backed) ----------------

    def _ax2d(self):
        axes = self.tab2d.figure.axes
        return axes[0] if axes else None

    def _apply_nav(self):
        ax = self._ax2d()
        if ax is not None and self.nav.xlim is not None:
            ax.set_xlim(self.nav.xlim)
            ax.set_ylim(self.nav.ylim)
            self.tab2d.canvas.draw_idle()

    def _on_scroll(self, event):
        if event.inaxes is None:
            return
        ax = self._ax2d()
        self.nav.set_home(ax.get_xlim(), ax.get_ylim())
        self.nav.xlim, self.nav.ylim = ax.get_xlim(), ax.get_ylim()
        factor = 0.8 if event.button == "up" else 1.25
        self.nav.zoom_at(factor, float(event.xdata), float(event.ydata))
        self._apply_nav()

    def _on_press(self, event):
        # middle button (or right) starts a pan drag; left is pick
        if event.inaxes is None or event.button not in (2, 3):
            return
        ax = self._ax2d()
        self.nav.set_home(ax.get_xlim(), ax.get_ylim())
        self.nav.xlim, self.nav.ylim = ax.get_xlim(), ax.get_ylim()
        self.nav.begin_drag(float(event.xdata), float(event.ydata))

    def _on_drag(self, event):
        if event.inaxes is None or event.xdata is None:
            return
        if self.nav._drag_anchor is None:
            return
        self.nav.drag_to(float(event.xdata), float(event.ydata))
        self._apply_nav()

    def _on_release(self, event):
        self.nav.end_drag()

    def _reset_view(self):
        self.nav.reset()
        self._apply_nav()

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
