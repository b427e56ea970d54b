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
    """Auto-generated form for one analysis's constructor settings."""

    def __init__(self, schema, parent=None):
        super().__init__(parent)
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
        out = {}
        for name, (f, w) in self.editors.items():
            if isinstance(w, QCheckBox):
                val = w.isChecked()
                if bool(f.default) != val:
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

        self.tabs = QTabWidget(self)
        self.tabs.setTabsClosable(True)
        self.tabs.tabCloseRequested.connect(self._close_tab)

        self.log = QPlainTextEdit(self)
        self.log.setReadOnly(True)
        self.log.setMaximumHeight(90)

        layout = QVBoxLayout(self)
        layout.addLayout(top)
        layout.addLayout(self._form_host)
        layout.addWidget(self.tabs, 1)
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
        self._form_host.addWidget(self.form)

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
