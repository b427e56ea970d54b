"""Analysis panel — analysis picker with an auto-generated settings form,
tabbed result figures with history, and error reporting
(reference: optiland_gui/analysis_panel.py, 1,664 LoC;
services/analysis_runner.py:15-50).

Settings forms are generated from each analysis class's constructor
signature (optiland_tpu.services.gui_support.analysis_settings_schema);
every run lands in a new figure tab backed by the AnalysisSession history,
so previous results stay inspectable and re-runnable.
"""

from __future__ import annotations

from optiland_tpu.services.gui_support import (
    AnalysisSession,
    coerce_setting,
)

from optiland_tpu_gui.qt import (
    QCheckBox,
    QComboBox,
    QFormLayout,
    QHBoxLayout,
    QLabel,
    QLineEdit,
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
        self.session = AnalysisSession(connector.analysis)

        self.combo = QComboBox(self)
        self.combo.addItems(sorted(self.session.registry()))
        self.combo.currentTextChanged.connect(self._rebuild_form)
        self.run_btn = QPushButton("Run", self)
        self.run_btn.clicked.connect(self.run_current)
        self.clear_btn = QPushButton("Clear", self)
        self.clear_btn.clicked.connect(self.clear_results)

        top = QHBoxLayout()
        top.addWidget(QLabel("Analysis"))
        top.addWidget(self.combo, 1)
        top.addWidget(self.run_btn)
        top.addWidget(self.clear_btn)

        self._form_host = QVBoxLayout()
        self.form: SettingsForm | None = None

        self.tabs = QTabWidget(self)
        self.tabs.setTabsClosable(True)
        self.tabs.tabCloseRequested.connect(self.tabs.removeTab)

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
        rec = self.session.run(name, **kwargs)
        if rec.error is not None:
            self.log.appendPlainText(f"{name}: {rec.error}")
            return None
        canvas, figure = make_canvas()
        self._draw(rec.result, figure)
        canvas.draw_idle()
        label = f"{rec.seq}: {name}"
        self.tabs.addTab(canvas, label)
        self.tabs.setCurrentIndex(self.tabs.count() - 1)
        self.log.appendPlainText(
            f"{name}: done"
            + (f"  ({kwargs})" if kwargs else "")
        )
        return rec.result

    def clear_results(self):
        self.session.clear()
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
