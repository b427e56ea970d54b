"""Embedded Python console
(reference: optiland_gui/widgets/python_terminal.py).

A QPlainTextEdit REPL exposing ``optic``/``connector`` in its namespace via
code.InteractiveConsole, with stdout/stderr captured into the widget.
"""

from __future__ import annotations

import code
import io
from contextlib import redirect_stderr, redirect_stdout

from optiland_tpu_gui.qt import QLineEdit, QPlainTextEdit, QVBoxLayout, QWidget


class PythonTerminal(QWidget):
    def __init__(self, connector, parent=None):
        super().__init__(parent)
        self.connector = connector
        namespace = {
            "connector": connector,
            "optic": connector.get_optic(),
        }
        self.console = code.InteractiveConsole(namespace)
        connector.opticLoaded.connect(
            lambda: namespace.update(optic=connector.get_optic())
        )

        self.output = QPlainTextEdit(self)
        self.output.setReadOnly(True)
        self.output.setPlainText(
            "optiland_tpu console — `optic` and `connector` are in scope\n"
        )
        self.input = QLineEdit(self)
        self.input.setPlaceholderText(">>> ")
        self.input.returnPressed.connect(self._run)
        self._history: list[str] = []
        self._hist_pos = 0

        layout = QVBoxLayout(self)
        layout.addWidget(self.output, 1)
        layout.addWidget(self.input)

    def _run(self):
        src = self.input.text()
        self.input.clear()
        if not src.strip():
            return
        self._history.append(src)
        self.output.appendPlainText(f">>> {src}")
        buf = io.StringIO()
        with redirect_stdout(buf), redirect_stderr(buf):
            self.console.push(src)
        text = buf.getvalue()
        if text:
            self.output.appendPlainText(text.rstrip())
