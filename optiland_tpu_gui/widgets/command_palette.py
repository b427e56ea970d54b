"""Ctrl+Shift+P style command palette
(reference: optiland_gui/widgets/command_palette.py).

Registry, fuzzy subsequence matching with word-start bonuses, ranking,
and error-capturing execution live in the headless
``services.view_models.CommandPaletteModel`` (tested in
tests/test_view_models_r5.py). This widget is a frameless popup binding
a filter line-edit + list view to it; Enter runs the highlighted
command, execution errors surface as a toast instead of raising into
the event loop.
"""

from __future__ import annotations

from optiland_tpu.services.view_models import CommandPaletteModel

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
        self.model = CommandPaletteModel()
        self._filtered = []

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

    def register(self, name: str, callback, shortcut: str = "",
                 category: str = ""):
        self.model.register(name, callback, shortcut, category)

    def open(self):
        self.search.clear()
        self._filter("")
        self.show()
        self.search.setFocus()

    def _filter(self, text):
        self._filtered = self.model.filter(text)
        self.listbox.clear()
        for cmd in self._filtered:
            label = cmd.label
            if cmd.category:
                label = f"{cmd.category}: {label}"
            if cmd.shortcut:
                label = f"{label}\t{cmd.shortcut}"
            self.listbox.addItem(label)
        if self.listbox.count():
            self.listbox.setCurrentRow(0)

    def _run_current(self):
        item = self.listbox.currentItem()
        if item is not None:
            self._run_item(item)

    def _run_item(self, item):
        row = self.listbox.row(item)
        self.hide()
        if 0 <= row < len(self._filtered):
            err = self.model.execute(self._filtered[row])
            if err:
                from optiland_tpu_gui.widgets.toast import show_toast

                show_toast(self.parent() or self, err)
