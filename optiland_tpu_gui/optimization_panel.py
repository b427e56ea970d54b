"""Optimization panel — operand/variable tables + optimizer run
(reference: optiland_gui/optimization_panel.py, 1,257 LoC;
services/optimization_service.py).
"""

from __future__ import annotations

import traceback

from optiland_tpu_gui.qt import (
    QComboBox,
    QHBoxLayout,
    QLabel,
    QPlainTextEdit,
    QPushButton,
    QTableWidget,
    QTableWidgetItem,
    QVBoxLayout,
    QWidget,
)

OPERAND_COLS = ("Type", "Target", "Weight", "Extra (k=v,...)")
VARIABLE_COLS = ("Type", "Surface", "Min", "Max")


def _table(cols, parent):
    t = QTableWidget(0, len(cols), parent)
    t.setHorizontalHeaderLabels(list(cols))
    return t


class OptimizationPanel(QWidget):
    def __init__(self, connector, parent=None):
        super().__init__(parent)
        self.connector = connector
        self.svc = connector.optimization

        self.operand_table = _table(OPERAND_COLS, self)
        self.variable_table = _table(VARIABLE_COLS, self)

        btn_add_op = QPushButton("Add Operand", self)
        btn_add_var = QPushButton("Add Variable", self)
        btn_add_op.clicked.connect(lambda: self._add_row(self.operand_table))
        btn_add_var.clicked.connect(lambda: self._add_row(self.variable_table))

        self.optimizer_combo = QComboBox(self)
        self.optimizer_combo.addItems(
            ["generic", "least_squares", "orthogonal_descent",
             "dual_annealing", "differential_evolution", "glass_expert"]
        )
        self.run_btn = QPushButton("Optimize", self)
        self.run_btn.clicked.connect(self.run)
        self.undo_btn = QPushButton("Undo Optimization", self)
        self.undo_btn.clicked.connect(connector.undo)

        self.log = QPlainTextEdit(self)
        self.log.setReadOnly(True)

        layout = QVBoxLayout(self)
        layout.addWidget(QLabel("Merit function operands"))
        layout.addWidget(self.operand_table)
        layout.addWidget(btn_add_op)
        layout.addWidget(QLabel("Variables"))
        layout.addWidget(self.variable_table)
        layout.addWidget(btn_add_var)
        row = QHBoxLayout()
        row.addWidget(QLabel("Optimizer"))
        row.addWidget(self.optimizer_combo, 1)
        row.addWidget(self.run_btn)
        row.addWidget(self.undo_btn)
        layout.addLayout(row)
        layout.addWidget(self.log)

    @staticmethod
    def _add_row(table):
        r = table.rowCount()
        table.insertRow(r)
        for c in range(table.columnCount()):
            table.setItem(r, c, QTableWidgetItem(""))

    @staticmethod
    def _cell(table, r, c, default=""):
        item = table.item(r, c)
        return item.text().strip() if item else default

    def _operand_specs(self):
        specs = []
        for r in range(self.operand_table.rowCount()):
            typ = self._cell(self.operand_table, r, 0)
            if not typ:
                continue
            spec = {"type": typ}
            tgt = self._cell(self.operand_table, r, 1)
            if tgt:
                spec["target"] = float(tgt)
            wt = self._cell(self.operand_table, r, 2)
            if wt:
                spec["weight"] = float(wt)
            extra = self._cell(self.operand_table, r, 3)
            for kv in filter(None, (p.strip() for p in extra.split(","))):
                k, _, v = kv.partition("=")
                try:
                    spec[k.strip()] = float(v)
                except ValueError:
                    spec[k.strip()] = v.strip()
            specs.append(spec)
        return specs

    def _variable_specs(self):
        specs = []
        for r in range(self.variable_table.rowCount()):
            typ = self._cell(self.variable_table, r, 0)
            if not typ:
                continue
            spec = {"type": typ}
            surf = self._cell(self.variable_table, r, 1)
            if surf:
                spec["surface_number"] = int(surf)
            lo = self._cell(self.variable_table, r, 2)
            hi = self._cell(self.variable_table, r, 3)
            if lo:
                spec["min_val"] = float(lo)
            if hi:
                spec["max_val"] = float(hi)
            specs.append(spec)
        return specs

    def run(self):
        try:
            self.svc.build_problem(
                self._operand_specs(), self._variable_specs()
            )
            before = float(self.svc.problem.sum_squared())
            result = self.svc.run(self.optimizer_combo.currentText())
            after = float(self.svc.problem.sum_squared())
            self.log.appendPlainText(
                f"merit: {before:.6g} -> {after:.6g}\n{result}"
            )
        except Exception as err:
            self.log.appendPlainText(
                f"{type(err).__name__}: {err}\n"
                + traceback.format_exc(limit=3)
            )
