"""Embedded Python console
(reference: optiland_gui/widgets/python_terminal.py).

The REPL semantics — persistent namespace with the live optic/connector,
expression reprs, traceback capture, and shell-style history recall —
live in the headless ``services.view_models.TerminalModel`` (tested in
tests/test_view_models_r5.py). This widget binds a line edit and an
output pane to it: Enter runs, Up/Down recall history.
"""

from __future__ import annotations

from optiland_tpu.services.view_models import TerminalModel

from optiland_tpu_gui.qt import (
    QLineEdit,
    QPlainTextEdit,
    Qt,
    QVBoxLayout,
    QWidget,
)


class _HistoryLineEdit(QLineEdit):
    """Line edit whose Up/Down arrows recall the TerminalModel history."""

    def __init__(self, model: TerminalModel, parent=None):
        super().__init__(parent)
        self.model = model

    def keyPressEvent(self, event):  # noqa: N802 (Qt naming)
        key = event.key()
        if key == Qt.Key.Key_Up:
            self.setText(self.model.recall(-1))
            return
        if key == Qt.Key.Key_Down:
            self.setText(self.model.recall(+1))
            return
        super().keyPressEvent(event)


class PythonTerminal(QWidget):
    def __init__(self, connector, parent=None):
        super().__init__(parent)
        core = getattr(connector, "core", connector)
        self.model = TerminalModel(core)

        self.output = QPlainTextEdit(self)
        self.output.setReadOnly(True)
        self.output.setPlainText(
            "optiland_tpu console — `optic`, `connector`, `np` are in "
            "scope\n"
        )
        self.input = _HistoryLineEdit(self.model, self)
        self.input.setPlaceholderText(">>> ")
        self.input.returnPressed.connect(self._run)

        layout = QVBoxLayout(self)
        layout.addWidget(self.output, 1)
        layout.addWidget(self.input)

    def _run(self):
        src = self.input.text()
        self.input.clear()
        if not src.strip():
            return
        self.output.appendPlainText(f">>> {src}")
        text = self.model.run(src)
        if text:
            self.output.appendPlainText(text.rstrip())
