"""Analysis panel — pick an analysis, run it, show the matplotlib figure
(reference: optiland_gui/analysis_panel.py, 1,664 LoC;
services/analysis_runner.py:15-50).

The analysis classes all expose ``view(fig_to_plot_on=...)``-style plotting
through optiland_tpu.visualization; here each run draws onto an embedded
FigureCanvas.
"""

from __future__ import annotations

import traceback

from optiland_tpu_gui.qt import (
    QComboBox,
    QHBoxLayout,
    QLabel,
    QPlainTextEdit,
    QPushButton,
    QVBoxLayout,
    QWidget,
)

# analyses whose constructor wants no extra settings and whose view() can
# draw on a provided figure; everything else gets default kwargs
_DEFAULT_KWARGS: dict = {}


def make_canvas():
    """Create an embedded matplotlib canvas (Agg-safe)."""
    from matplotlib.backends.backend_qtagg import FigureCanvasQTAgg
    from matplotlib.figure import Figure

    fig = Figure(figsize=(6, 4), tight_layout=True)
    return FigureCanvasQTAgg(fig), fig


class AnalysisPanel(QWidget):
    def __init__(self, connector, parent=None):
        super().__init__(parent)
        self.connector = connector
        self.runner = connector.analysis

        self.combo = QComboBox(self)
        self.combo.addItems(sorted(self.runner.get_analysis_registry()))
        self.run_btn = QPushButton("Run", self)
        self.run_btn.clicked.connect(self.run_current)

        top = QHBoxLayout()
        top.addWidget(QLabel("Analysis"))
        top.addWidget(self.combo, 1)
        top.addWidget(self.run_btn)

        self.canvas, self.figure = make_canvas()
        self.log = QPlainTextEdit(self)
        self.log.setReadOnly(True)
        self.log.setMaximumHeight(90)

        layout = QVBoxLayout(self)
        layout.addLayout(top)
        layout.addWidget(self.canvas, 1)
        layout.addWidget(self.log)

    def run_current(self, name=None, **kwargs):
        name = name or self.combo.currentText()
        self.figure.clear()
        try:
            result = self.runner.run(name, **kwargs)
            self._draw(result)
            self.log.appendPlainText(f"{name}: done")
        except Exception as err:  # surface errors in the panel, never crash
            self.log.appendPlainText(
                f"{name}: {type(err).__name__}: {err}\n"
                + traceback.format_exc(limit=3)
            )
        self.canvas.draw_idle()
        return self.runner.get_result()

    def _draw(self, result):
        """Route the analysis's view() onto the embedded figure.

        Most optiland_tpu analyses accept ``ax=``; a few (multi-panel)
        accept ``fig_to_plot_on=``; the rest draw on pyplot state.
        """
        view = getattr(result, "view", None)
        if view is None:
            return
        for kwargs in (
            {"ax": self.figure.add_subplot(111)},
            {"fig_to_plot_on": self.figure},
            {},
        ):
            try:
                view(**kwargs)
                return
            except TypeError:
                self.figure.clear()
                continue
