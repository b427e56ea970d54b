"""Analysis panel — analysis picker with an auto-generated settings form,
tabbed result figures with per-tab re-run and PNG/CSV export
(reference: optiland_gui/analysis_panel.py, 1,664 LoC — figure tabs,
toolbars, export; services/analysis_runner.py:15-50).

Settings forms are generated from each analysis class's constructor
signature; tab lifecycle, re-run-against-current-system, and the export
actions live in the headless
``optiland_tpu.services.view_models.AnalysisPanelModel`` (tested without
Qt in tests/test_view_models.py); this widget binds figures to its tabs.
"""

from __future__ import annotations

from optiland_tpu.services.gui_support import coerce_setting
from optiland_tpu.services.view_models import AnalysisPanelModel

from optiland_tpu_gui.qt import (
    QCheckBox,
    QComboBox,
    QFormLayout,
    QHBoxLayout,
    QLabel,
    QLineEdit,
    QFileDialog,
    QPlainTextEdit,
    QPushButton,
    QTabWidget,
    QVBoxLayout,
    QWidget,
)


def make_canvas():
    """Create an embedded matplotlib canvas (Agg-safe)."""
    from matplotlib.backends.backend_qtagg import FigureCanvasQTAgg
    from matplotlib.figure import Figure

    fig = Figure(figsize=(6, 4), tight_layout=True)
    return FigureCanvasQTAgg(fig), fig


class SettingsForm(QWidget):
    """Auto-generated TYPED form for one analysis's constructor settings
    (reference: analysis_panel.py:485-733 — spin boxes for numerics,
    checkboxes for bools, comboboxes for enumerated strings, line edits
    for tuples/lists/free text)."""

    def __init__(self, schema, parent=None):
        super().__init__(parent)
        from optiland_tpu_gui.qt import QDoubleSpinBox, QSpinBox

        self.schema = schema
        self.editors = {}
        form = QFormLayout(self)
        form.setContentsMargins(0, 0, 0, 0)
        for f in schema:
            if f.kind == "bool":
                w = QCheckBox(self)
                w.setChecked(bool(f.default))
            elif f.choices:
                w = QComboBox(self)
                w.addItems([str(c) for c in f.choices])
                if f.default is not None:
                    w.setCurrentText(str(f.default))
            elif f.kind == "int" and f.default is not None:
                w = QSpinBox(self)
                w.setRange(-(2**30), 2**30)
                w.setValue(int(f.default))
            elif f.kind == "float" and f.default is not None:
                w = QDoubleSpinBox(self)
                w.setRange(-1e12, 1e12)
                w.setDecimals(6)
                w.setValue(float(f.default))
            else:
                w = QLineEdit(self)
                if f.default is not None:
                    if f.kind in ("tuple", "list"):
                        w.setText(", ".join(str(v) for v in f.default))
                    else:
                        w.setText(str(f.default))
                w.setPlaceholderText(f.kind)
            self.editors[f.name] = (f, w)
            form.addRow(f.name, w)

    def values(self) -> dict:
        """Settings dict, omitting fields left at their defaults."""
        from optiland_tpu_gui.qt import QDoubleSpinBox, QSpinBox

        out = {}
        for name, (f, w) in self.editors.items():
            if isinstance(w, QCheckBox):
                val = w.isChecked()
                if bool(f.default) != val:
                    out[name] = val
                continue
            if isinstance(w, QSpinBox):
                val = int(w.value())
                if f.default is None or val != int(f.default):
                    out[name] = val
                continue
            if isinstance(w, QDoubleSpinBox):
                val = float(w.value())
                if f.default is None or val != float(f.default):
                    out[name] = val
                continue
            if isinstance(w, QComboBox):
                text = w.currentText()
            else:
                text = w.text()
            if text == "" or text is None:
                continue
            val = coerce_setting(f, text)
            if f.default is not None and val == f.default:
                continue
            if f.default is not None and f.kind in ("tuple", "list"):
                if tuple(val) == tuple(f.default):
                    continue
            out[name] = val
        return out

    def apply_values(self, kwargs: dict):
        """Populate the form from a stored settings dict (reference:
        analysis_panel.py:1061-1082 _apply_loaded_settings_to_ui)."""
        from optiland_tpu_gui.qt import QDoubleSpinBox, QSpinBox

        for name, val in kwargs.items():
            pair = self.editors.get(name)
            if pair is None:
                continue
            _, w = pair
            if isinstance(w, QCheckBox):
                w.setChecked(bool(val))
            elif isinstance(w, QSpinBox):
                w.setValue(int(val))
            elif isinstance(w, QDoubleSpinBox):
                w.setValue(float(val))
            elif isinstance(w, QComboBox):
                w.setCurrentText(str(val))
            elif isinstance(val, (tuple, list)):
                w.setText(", ".join(str(v) for v in val))
            else:
                w.setText(str(val))


class AnalysisPanel(QWidget):
    def __init__(self, connector, parent=None):
        super().__init__(parent)
        self.connector = connector
        core = getattr(connector, "core", connector)
        self.model = AnalysisPanelModel(core)
        self.session = self.model.session

        self.combo = QComboBox(self)
        self.combo.addItems(self.model.available())
        self.combo.currentTextChanged.connect(self._rebuild_form)
        self.run_btn = QPushButton("Run", self)
        self.run_btn.clicked.connect(self.run_current)
        self.rerun_btn = QPushButton("Re-run tab", self)
        self.rerun_btn.clicked.connect(self.rerun_current_tab)
        self.png_btn = QPushButton("Export PNG", self)
        self.png_btn.clicked.connect(self.export_png)
        self.csv_btn = QPushButton("Export CSV", self)
        self.csv_btn.clicked.connect(self.export_csv)
        self.clear_btn = QPushButton("Clear", self)
        self.clear_btn.clicked.connect(self.clear_results)

        top = QHBoxLayout()
        top.addWidget(QLabel("Analysis"))
        top.addWidget(self.combo, 1)
        top.addWidget(self.run_btn)
        top.addWidget(self.rerun_btn)
        top.addWidget(self.png_btn)
        top.addWidget(self.csv_btn)
        top.addWidget(self.clear_btn)

        self._form_host = QVBoxLayout()
        self.form: SettingsForm | None = None

        self.save_settings_btn = QPushButton("Save settings…", self)
        self.save_settings_btn.clicked.connect(self._save_settings)
        self.load_settings_btn = QPushButton("Load settings…", self)
        self.load_settings_btn.clicked.connect(self._load_settings)
        top.addWidget(self.save_settings_btn)
        top.addWidget(self.load_settings_btn)

        self.tabs = QTabWidget(self)
        self.tabs.setTabsClosable(True)
        self.tabs.tabCloseRequested.connect(self._close_tab)
        # clone/re-run/export context menu on the page bar (reference:
        # analysis_panel.py:915-971)
        from optiland_tpu_gui.qt import Qt as _Qt

        self.tabs.tabBar().setContextMenuPolicy(
            _Qt.ContextMenuPolicy.CustomContextMenu
        )
        self.tabs.tabBar().customContextMenuRequested.connect(
            self._tab_context_menu
        )

        self.readout = QLabel("", self)

        self.log = QPlainTextEdit(self)
        self.log.setReadOnly(True)
        self.log.setMaximumHeight(90)

        layout = QVBoxLayout(self)
        layout.addLayout(top)
        layout.addLayout(self._form_host)
        layout.addWidget(self.tabs, 1)
        layout.addWidget(self.readout)
        layout.addWidget(self.log)
        self._rebuild_form(self.combo.currentText())

    # ---------------- settings form ----------------

    def _rebuild_form(self, name):
        if self.form is not None:
            self._form_host.removeWidget(self.form)
            self.form.deleteLater()
            self.form = None
        if not name:
            return
        self.form = SettingsForm(self.session.schema(name), self)
        # repopulate from the last-used settings for this analysis
        recalled = self.model.recall_settings(name)
        if recalled:
            self.form.apply_values(recalled)
        self._form_host.addWidget(self.form)

    def _save_settings(self):
        path, _ = QFileDialog.getSaveFileName(
            self, "Save analysis settings", "analysis_settings.json",
            "JSON (*.json)",
        )
        if path:
            self.model.save_settings(path)
            self.log.appendPlainText(f"settings saved: {path}")

    def _load_settings(self):
        path, _ = QFileDialog.getOpenFileName(
            self, "Load analysis settings", "", "JSON (*.json)"
        )
        if path:
            self.model.load_settings(path)
            self._rebuild_form(self.combo.currentText())
            self.log.appendPlainText(f"settings loaded: {path}")

    # ---------------- page context menu ----------------

    def _tab_context_menu(self, pos):
        from optiland_tpu_gui.qt import QMenu

        idx = self.tabs.tabBar().tabAt(pos)
        if idx < 0:
            return
        menu = QMenu(self)
        menu.addAction("Clone page", lambda: self._clone_tab(idx))
        menu.addAction(
            "Re-run against current system",
            lambda: (self.tabs.setCurrentIndex(idx),
                     self.rerun_current_tab()),
        )
        menu.addAction(
            "Export PNG…",
            lambda: (self.tabs.setCurrentIndex(idx), self.export_png()),
        )
        menu.addAction("Close page", lambda: self._close_tab(idx))
        menu.exec(self.tabs.tabBar().mapToGlobal(pos))

    def _clone_tab(self, idx):
        tab = self.model.clone_tab(idx)
        rec = tab.record
        if rec.error is not None:
            self.model.close_tab(len(self.model.tabs) - 1)
            self.log.appendPlainText(f"clone failed: {rec.error}")
            return
        canvas, figure = make_canvas()
        self._draw(rec.result, figure)
        self._attach_readout(canvas)
        canvas.draw_idle()
        self.tabs.addTab(canvas, tab.title)
        self.tabs.setCurrentIndex(self.tabs.count() - 1)

    # ---------------- plot cursor readout ----------------

    def _attach_readout(self, canvas):
        canvas.mpl_connect("motion_notify_event", self._on_plot_move)
        # scroll-zoom about the cursor on every analysis figure
        # (reference: gui_plot_utils.py:110-150 wired in analysis_panel)
        canvas.mpl_connect("scroll_event", self._on_plot_scroll)

    @staticmethod
    def _on_plot_scroll(event):
        if event.inaxes is None or event.xdata is None:
            return
        from optiland_tpu_gui.plot_utils import zoom_limits

        ax = event.inaxes
        xlim, ylim = zoom_limits(
            ax.get_xlim(), ax.get_ylim(),
            float(event.xdata), float(event.ydata), event.button,
        )
        ax.set_xlim(xlim)
        ax.set_ylim(ylim)
        ax.figure.canvas.draw_idle()

    def _on_plot_move(self, event):
        if event.inaxes is None:
            self.readout.setText("")
            return
        self.readout.setText(
            self.model.cursor_readout(event.xdata, event.ydata)
        )

    # ---------------- running ----------------

    def run_current(self, name=None, **kwargs):
        name = name or self.combo.currentText()
        if not kwargs and self.form is not None:
            try:
                kwargs = self.form.values()
            except (TypeError, ValueError) as err:
                self.log.appendPlainText(f"bad settings: {err}")
                return None
        tab = self.model.run(name, **kwargs)
        rec = tab.record
        if rec.error is not None:
            self.model.close_tab(len(self.model.tabs) - 1)
            self.log.appendPlainText(f"{name}: {rec.error}")
            return None
        canvas, figure = make_canvas()
        self._draw(rec.result, figure)
        self._attach_readout(canvas)
        canvas.draw_idle()
        self.tabs.addTab(canvas, tab.title)
        self.tabs.setCurrentIndex(self.tabs.count() - 1)
        self.log.appendPlainText(
            f"{name}: done"
            + (f"  ({kwargs})" if kwargs else "")
        )
        return rec.result

    def rerun_current_tab(self):
        """Re-run the active tab's analysis against the CURRENT system
        (reference: analysis_panel.py refresh action)."""
        idx = self.tabs.currentIndex()
        if idx < 0:
            return
        tab = self.model.rerun(idx)
        canvas, figure = make_canvas()
        self._draw(tab.record.result, figure)
        self._attach_readout(canvas)
        canvas.draw_idle()
        old = self.tabs.widget(idx)
        self.tabs.removeTab(idx)
        self.tabs.insertTab(idx, canvas, tab.title)
        self.tabs.setCurrentIndex(idx)
        if old is not None:
            old.deleteLater()
        self.log.appendPlainText(f"{tab.name}: re-run")

    def export_png(self):
        idx = self.tabs.currentIndex()
        if idx < 0:
            return
        path, _ = QFileDialog.getSaveFileName(
            self, "Export figure", f"{self.model.tabs[idx].name}.png",
            "PNG (*.png)",
        )
        if path:
            self.model.export_png(idx, path)
            self.log.appendPlainText(f"saved {path}")

    def export_csv(self):
        idx = self.tabs.currentIndex()
        if idx < 0:
            return
        path, _ = QFileDialog.getSaveFileName(
            self, "Export data", f"{self.model.tabs[idx].name}.csv",
            "CSV (*.csv)",
        )
        if not path:
            return
        try:
            self.model.export_csv(idx, path)
        except ValueError as err:
            self.log.appendPlainText(str(err))
            return
        self.log.appendPlainText(f"saved {path}")

    def _close_tab(self, idx):
        self.model.close_tab(idx)
        self.tabs.removeTab(idx)

    def clear_results(self):
        self.session.clear()
        while self.model.tabs:
            self.model.close_tab(0)
        while self.tabs.count():
            self.tabs.removeTab(0)

    @property
    def history(self):
        return self.session.history

    @staticmethod
    def _draw(result, figure):
        """Route the analysis's view() onto the provided figure.

        Most optiland_tpu analyses accept ``ax=``; a few (multi-panel)
        accept ``fig_to_plot_on=``; the rest draw on pyplot state.
        """
        view = getattr(result, "view", None)
        if view is None:
            return
        for kwargs in (
            {"ax": figure.add_subplot(111)},
            {"fig_to_plot_on": figure},
            {},
        ):
            try:
                view(**kwargs)
                return
            except TypeError:
                figure.clear()
                continue
