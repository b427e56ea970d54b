"""Ctrl+Shift+P style command palette
(reference: optiland_gui/widgets/command_palette.py).

A frameless popup with a filter line-edit over the registered command
list; Enter runs the highlighted command.
"""

from __future__ import annotations

from optiland_tpu_gui.qt import (
    QLineEdit,
    Qt,
    QtWidgets,
    QVBoxLayout,
    QWidget,
)


class CommandPalette(QWidget):
    def __init__(self, parent=None):
        super().__init__(parent)
        self.setWindowFlags(
            Qt.WindowType.Popup | Qt.WindowType.FramelessWindowHint
        )
        self._commands: list[tuple[str, object]] = []

        self.search = QLineEdit(self)
        self.search.setPlaceholderText("Type a command...")
        self.search.textChanged.connect(self._filter)
        self.listbox = QtWidgets.QListWidget(self)
        self.listbox.itemActivated.connect(self._run_item)
        self.search.returnPressed.connect(self._run_current)

        layout = QVBoxLayout(self)
        layout.setContentsMargins(6, 6, 6, 6)
        layout.addWidget(self.search)
        layout.addWidget(self.listbox)
        self.resize(420, 320)

    def register(self, name: str, callback):
        self._commands.append((name, callback))

    def open(self):
        self.search.clear()
        self._filter("")
        self.show()
        self.search.setFocus()

    def _filter(self, text):
        text = text.lower()
        self.listbox.clear()
        for name, _ in self._commands:
            if text in name.lower():
                self.listbox.addItem(name)
        if self.listbox.count():
            self.listbox.setCurrentRow(0)

    def _run_current(self):
        item = self.listbox.currentItem()
        if item is not None:
            self._run_item(item)

    def _run_item(self, item):
        name = item.text()
        self.hide()
        for cmd, cb in self._commands:
            if cmd == name:
                cb()
                return
