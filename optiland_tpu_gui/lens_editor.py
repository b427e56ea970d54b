"""Lens Data Editor — spreadsheet of surfaces (reference:
optiland_gui/lens_editor.py, services/surface_service.py:27).

A QTableWidget bound to SurfaceService: one row per surface, columns from
``SurfaceService.COLUMNS``. Edits commit through the service (which
snapshots for undo and notifies); structural changes (add/remove/stop)
ride the toolbar buttons.
"""

from __future__ import annotations

from optiland_tpu_gui.qt import (
    QComboBox,
    QHBoxLayout,
    QHeaderView,
    QMenu,
    QPushButton,
    Qt,
    QTableWidget,
    QTableWidgetItem,
    QVBoxLayout,
    QWidget,
)


class LensEditor(QWidget):
    def __init__(self, connector, parent=None):
        super().__init__(parent)
        self.connector = connector
        self.svc = connector.surfaces
        self._building = False

        self.table = QTableWidget(self)
        headers = self.svc.get_column_headers()
        self.table.setColumnCount(len(headers))
        self.table.setHorizontalHeaderLabels(headers)
        self.table.horizontalHeader().setSectionResizeMode(
            QHeaderView.ResizeMode.Stretch
        )
        self.table.itemChanged.connect(self._on_item_changed)
        self.table.setContextMenuPolicy(
            Qt.ContextMenuPolicy.CustomContextMenu
        )
        self.table.customContextMenuRequested.connect(self._context_menu)

        btns = QHBoxLayout()
        self.btn_add = QPushButton("Add Surface", self)
        self.btn_remove = QPushButton("Remove Surface", self)
        self.btn_stop = QPushButton("Make Stop", self)
        self.btn_add.clicked.connect(self._add_surface)
        self.btn_remove.clicked.connect(self._remove_surface)
        self.btn_stop.clicked.connect(self._make_stop)
        for b in (self.btn_add, self.btn_remove, self.btn_stop):
            btns.addWidget(b)
        btns.addStretch(1)

        layout = QVBoxLayout(self)
        layout.addLayout(btns)
        layout.addWidget(self.table)

        connector.opticLoaded.connect(self.rebuild)
        connector.surfaceCountChanged.connect(self.rebuild)
        self.rebuild()

    # -------------- model -> view --------------

    def rebuild(self):
        self._building = True
        try:
            n = self.svc.get_surface_count()
            cols = self.svc.get_column_headers()
            self.table.setRowCount(n)
            optic = self.connector.get_optic()
            stop_row = next(
                (
                    i
                    for i, s in enumerate(optic.surfaces.surfaces)
                    if getattr(s, "is_stop", False)
                ),
                None,
            )
            labels = []
            for row in range(n):
                if row == 0:
                    labels.append("OBJ")
                elif row == n - 1:
                    labels.append("IMG")
                elif row == stop_row:
                    labels.append(f"STO {row}")
                else:
                    labels.append(str(row))
                for col in range(len(cols)):
                    if cols[col] == "Type":
                        self._set_type_combo(row)
                        continue
                    val = self.svc.get_surface_data(row, col)
                    text = "" if val is None else self._fmt(val)
                    item = QTableWidgetItem(text)
                    self.table.setItem(row, col, item)
            self.table.setVerticalHeaderLabels(labels)
        finally:
            self._building = False

    def _set_type_combo(self, row):
        combo = QComboBox(self.table)
        types = self.svc.get_available_surface_types()
        combo.addItems(types)
        current = self.svc.get_surface_data(row, 0)
        idx = combo.findText(str(current))
        if idx >= 0:
            combo.setCurrentIndex(idx)
        combo.currentTextChanged.connect(
            lambda text, r=row: self._on_type_changed(r, text)
        )
        self.table.setCellWidget(row, 0, combo)

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
        text = item.text().strip()
        cols = self.svc.get_column_headers()
        try:
            if cols[col] in ("Radius", "Thickness", "Conic", "Semi-Diameter"):
                value = float("inf") if text.lower() in (
                    "inf", "infinity", ""
                ) else float(text)
            else:
                value = text
            self.svc.set_surface_data(row, col, value)
        except (ValueError, IndexError):
            self.rebuild()  # revert bad input

    def _on_type_changed(self, row, text):
        if self._building:
            return
        self.svc.set_surface_data(row, 0, text)

    def _current_row(self):
        return self.table.currentRow()

    def _add_surface(self):
        row = self._current_row()
        self.svc.add_surface(row + 1 if row >= 0 else -1)

    def _remove_surface(self):
        row = self._current_row()
        if row > 0:
            try:
                self.svc.remove_surface(row)
            except ValueError:
                pass

    def _make_stop(self):
        row = self._current_row()
        if row > 0:
            self.svc.set_stop_surface(row)

    def _context_menu(self, pos):
        menu = QMenu(self)
        menu.addAction("Insert surface after", self._add_surface)
        menu.addAction("Remove surface", self._remove_surface)
        menu.addAction("Make stop", self._make_stop)
        menu.addAction("Edit type parameters...", self._edit_type_params)
        menu.exec(self.table.viewport().mapToGlobal(pos))

    def _edit_type_params(self):
        """Per-surface-type extended parameter editor (reference:
        lens_editor.py surface-type delegates). The form is generated from
        SurfaceService.get_type_params and written back through
        set_type_params (undoable)."""
        row = self._current_row()
        if row < 0:
            return
        params = self.svc.get_type_params(row)
        if not params:
            return
        from optiland_tpu_gui.qt import (
            QFormLayout,
            QLineEdit,
            QPushButton,
            QVBoxLayout,
            QWidget,
        )

        dlg = QWidget(self, Qt.WindowType.Window)
        dlg.setWindowTitle(f"Surface {row} type parameters")
        form = QFormLayout()
        editors = {}
        for key, val in params.items():
            w = QLineEdit(dlg)
            if isinstance(val, (list, tuple)):
                w.setText(", ".join(f"{v:g}" for v in val))
            else:
                w.setText(str(val))
            editors[key] = w
            form.addRow(key, w)
        apply_btn = QPushButton("Apply", dlg)

        def _apply():
            out = {}
            try:
                for key, w in editors.items():
                    text = w.text().strip()
                    if isinstance(params[key], (list, tuple)):
                        out[key] = [
                            float(p) for p in text.split(",") if p.strip()
                        ]
                    elif isinstance(params[key], str):
                        out[key] = text
                    elif isinstance(params[key], int):
                        out[key] = int(float(text))
                    else:
                        out[key] = float(text)
                self.svc.set_type_params(row, **out)
                dlg.close()
            except (ValueError, KeyError):
                pass  # leave the dialog open on bad input

        apply_btn.clicked.connect(_apply)
        lay = QVBoxLayout(dlg)
        lay.addLayout(form)
        lay.addWidget(apply_btn)
        dlg.show()
