"""Lens Data Editor — spreadsheet of surfaces with per-type dynamic
columns, typed cell delegates, clipboard copy/paste, and row reordering
(reference: optiland_gui/lens_editor.py ~2.1k LoC — per-type delegates and
full editing UX; services/surface_service.py:27).

All editing logic lives in the headless
``optiland_tpu.services.view_models.LensEditorModel`` (tested without Qt
in tests/test_view_models.py); this widget is a thin binding: the table
mirrors the model's dynamic column set, cell specs choose the editor
(combo for choices, line-edit for floats/text), and the clipboard actions
move TSV blocks through the model.
"""

from __future__ import annotations

from optiland_tpu.services.view_models import LensEditorModel

from optiland_tpu_gui.qt import (
    QApplication,
    QComboBox,
    QFormLayout,
    QGroupBox,
    QHBoxLayout,
    QHeaderView,
    QKeySequence,
    QLabel,
    QLineEdit,
    QMenu,
    QPushButton,
    Qt,
    QTableWidget,
    QTableWidgetItem,
    QShortcut,
    QVBoxLayout,
    QWidget,
)


class SurfacePropertiesWidget(QGroupBox):
    """Expandable per-type parameter form for one surface (reference:
    lens_editor.py:38-117 SurfacePropertiesWidget): asphere coefficient
    lists, normalization radii, grating parameters — everything the
    spreadsheet's dynamic columns don't show. Field specs and the
    parse/validate/apply path live in LensEditorModel.properties_form /
    apply_properties (tested headless)."""

    def __init__(self, model: LensEditorModel, parent=None):
        super().__init__("Surface properties", parent)
        self.model = model
        self.row = -1
        self._edits: dict = {}
        self.form = QFormLayout(self)
        self.status = QLabel("", self)
        self.apply_btn = QPushButton("Apply", self)
        self.apply_btn.clicked.connect(self._apply)

    def show_row(self, row: int):
        self.row = row
        while self.form.rowCount():
            self.form.removeRow(0)
        self._edits.clear()
        fields = self.model.properties_form(row) if row >= 0 else []
        self.setVisible(bool(fields))
        if not fields:
            return
        for key, kind, value in fields:
            if kind.startswith("choice:"):
                w = QComboBox(self)
                w.addItems(kind.split(":")[1:])
                idx = w.findText(str(value))
                if idx >= 0:
                    w.setCurrentIndex(idx)
            else:
                w = QLineEdit(str(value), self)
            self._edits[key] = w
            self.form.addRow(key.replace("_", " "), w)
        self.form.addRow(self.status, self.apply_btn)

    def _apply(self):
        values = {}
        for key, w in self._edits.items():
            values[key] = (
                w.currentText() if isinstance(w, QComboBox) else w.text()
            )
        err = self.model.apply_properties(self.row, values)
        self.status.setText(err or "applied")


class LensEditor(QWidget):
    def __init__(self, connector, parent=None):
        super().__init__(parent)
        self.connector = connector
        # the model runs on the headless core (it needs snapshot/notify);
        # Qt signals stay on this connector
        self.model = LensEditorModel(getattr(connector, "core", connector))
        self._building = False

        self.table = QTableWidget(self)
        self.table.itemChanged.connect(self._on_item_changed)
        self.table.setContextMenuPolicy(
            Qt.ContextMenuPolicy.CustomContextMenu
        )
        self.table.customContextMenuRequested.connect(self._context_menu)
        self.table.horizontalHeader().setSectionResizeMode(
            QHeaderView.ResizeMode.ResizeToContents
        )

        btns = QHBoxLayout()
        self.btn_add = QPushButton("Insert", self)
        self.btn_remove = QPushButton("Remove", self)
        self.btn_stop = QPushButton("Make Stop", self)
        self.btn_up = QPushButton("Move Up", self)
        self.btn_down = QPushButton("Move Down", self)
        self.btn_add.clicked.connect(self._add_surface)
        self.btn_remove.clicked.connect(self._remove_surface)
        self.btn_stop.clicked.connect(self._make_stop)
        self.btn_up.clicked.connect(lambda: self._move(-1))
        self.btn_down.clicked.connect(lambda: self._move(+1))
        for b in (self.btn_add, self.btn_remove, self.btn_stop,
                  self.btn_up, self.btn_down):
            btns.addWidget(b)
        btns.addStretch(1)

        self.props = SurfacePropertiesWidget(self.model, self)
        self.props.setVisible(False)
        self.table.currentCellChanged.connect(self._on_current_cell)

        layout = QVBoxLayout(self)
        layout.addLayout(btns)
        layout.addWidget(self.table)
        layout.addWidget(self.props)

        QShortcut(QKeySequence.StandardKey.Copy, self.table,
                  activated=self._copy)
        QShortcut(QKeySequence.StandardKey.Paste, self.table,
                  activated=self._paste)
        QShortcut(QKeySequence.StandardKey.Undo, self.table,
                  activated=connector.undo)
        QShortcut(QKeySequence.StandardKey.Redo, self.table,
                  activated=connector.redo)

        connector.opticLoaded.connect(self.rebuild)
        connector.surfaceCountChanged.connect(self.rebuild)
        self.rebuild()

    # -------------- model -> view --------------

    def rebuild(self):
        self._building = True
        try:
            m = self.model
            n = m.row_count()
            headers = m.column_headers()
            self.table.setColumnCount(len(headers))
            self.table.setHorizontalHeaderLabels(headers)
            self.table.setRowCount(n)
            self.table.setVerticalHeaderLabels(
                [m.row_label(r) for r in range(n)]
            )
            for row in range(n):
                for col in range(len(headers)):
                    spec = m.cell_spec(row, col)
                    val = m.get_cell(row, col)
                    if spec.kind == "choice" and spec.editable:
                        self._set_combo(row, col, spec, val)
                        continue
                    if self.table.cellWidget(row, col) is not None:
                        self.table.removeCellWidget(row, col)
                    text = "" if val is None else self._fmt(val)
                    item = QTableWidgetItem(text)
                    if not spec.editable:
                        item.setFlags(
                            item.flags() & ~Qt.ItemFlag.ItemIsEditable
                        )
                    self.table.setItem(row, col, item)
        finally:
            self._building = False

    def _set_combo(self, row, col, spec, current):
        combo = QComboBox(self.table)
        combo.addItems([str(c) for c in spec.choices])
        idx = combo.findText(str(current))
        if idx >= 0:
            combo.setCurrentIndex(idx)
        combo.currentTextChanged.connect(
            lambda text, r=row, c=col: self._on_combo_changed(r, c, text)
        )
        self.table.setCellWidget(row, col, combo)

    @staticmethod
    def _fmt(val):
        if isinstance(val, float):
            return f"{val:.6g}"
        return str(val)

    # -------------- view -> model --------------

    def _on_item_changed(self, item):
        if self._building:
            return
        row, col = item.row(), item.column()
        spec = self.model.cell_spec(row, col)
        text = item.text()
        try:
            value = float(text) if spec.kind == "float" else text
        except ValueError:
            self.rebuild()  # revert invalid input
            return
        if not self.model.set_cell(row, col, value):
            self.rebuild()
            return
        self.connector.surfaceDataChanged.emit(row, col)

    def _on_combo_changed(self, row, col, text):
        if self._building:
            return
        self.model.set_cell(row, col, text)
        self.connector.surfaceDataChanged.emit(row, col)
        self.rebuild()  # type changes alter the column set

    # -------------- structure --------------

    def _current_row(self):
        r = self.table.currentRow()
        return r if r >= 0 else self.model.row_count() - 1

    def _add_surface(self):
        self.model.insert_row(max(1, self._current_row()))
        self.rebuild()
        self.connector.surfaceCountChanged.emit()

    def _remove_surface(self):
        try:
            self.model.remove_row(self._current_row())
        except ValueError:
            return
        self.rebuild()
        self.connector.surfaceCountChanged.emit()

    def _make_stop(self):
        row = self._current_row()
        if 0 < row < self.model.row_count() - 1:
            self.model.set_stop(row)
            self.rebuild()

    def _move(self, delta):
        try:
            self.model.move_row(self._current_row(), delta)
        except ValueError:
            return
        self.rebuild()
        self.connector.surfaceDataChanged.emit(self._current_row(), -1)

    # -------------- clipboard --------------

    def _selected_rows(self):
        rows = sorted({i.row() for i in self.table.selectedIndexes()})
        return rows or [self._current_row()]

    def _copy(self):
        tsv = self.model.copy_rows(self._selected_rows())
        QApplication.clipboard().setText(tsv)

    def _paste(self):
        tsv = QApplication.clipboard().text()
        if not tsv:
            return
        row = max(0, self.table.currentRow())
        col = max(0, self.table.currentColumn())
        if self.model.paste_block(row, col, tsv):
            self.rebuild()
            self.connector.surfaceDataChanged.emit(row, col)

    # -------------- properties expansion --------------

    def _on_current_cell(self, row, col, *_):
        if not self._building and row >= 0:
            self.props.show_row(row)

    # -------------- optimization-variable request --------------

    def _add_variable(self):
        """Send the selected cell to the optimization panel as a variable
        (reference: lens_editor.py:332-348)."""
        row = self.table.currentRow()
        col = self.table.currentColumn()
        vk = self.model.variable_kwargs(row, col)
        if vk is None:
            return
        var_type, kwargs = vk
        self.connector.variableRequested.emit(var_type, kwargs)

    # -------------- context menu --------------

    def _context_menu(self, pos):
        menu = QMenu(self)
        menu.addAction("Copy rows", self._copy)
        menu.addAction("Paste", self._paste)
        menu.addSeparator()
        menu.addAction("Insert surface", self._add_surface)
        menu.addAction("Remove surface", self._remove_surface)
        menu.addAction("Make stop", self._make_stop)
        menu.addSeparator()
        menu.addAction("Move up", lambda: self._move(-1))
        menu.addAction("Move down", lambda: self._move(+1))
        vk = self.model.variable_kwargs(
            self.table.currentRow(), self.table.currentColumn()
        )
        if vk is not None:
            menu.addSeparator()
            menu.addAction(
                f"Add '{vk[0]}' as optimization variable",
                self._add_variable,
            )
        menu.exec(self.table.viewport().mapToGlobal(pos))
