"""Optimization panel — operand/variable tables, async optimizer run with
live merit curve, progress and cancel
(reference: optiland_gui/optimization_panel.py, 1,257 LoC, which threads
its optimizer and emits per-iteration signals;
services/optimization_service.py).

The optimization itself runs on a worker thread
(optiland_tpu.services.gui_support.OptimizationWorker); per-iteration
progress crosses into the UI thread through queued Qt signals, so the
window stays responsive and the run can be cancelled.
"""

from __future__ import annotations

import traceback

from optiland_tpu.services.gui_support import OptimizationWorker
from optiland_tpu.services.view_models import OptimizationPanelModel

from optiland_tpu_gui.qt import (
    QFileDialog,
    QComboBox,
    QHBoxLayout,
    QLabel,
    QPlainTextEdit,
    QPushButton,
    QTableWidget,
    QTableWidgetItem,
    QVBoxLayout,
    QWidget,
    Signal,
)

OPERAND_COLS = ("Type", "Target", "Weight", "Extra (k=v,...)")
VARIABLE_COLS = ("Type", "Surface", "Min", "Max")

OPTIMIZERS = (
    "generic", "least_squares", "orthogonal_descent", "dual_annealing",
    "differential_evolution", "optax", "glass_expert",
)


def _table(cols, parent):
    t = QTableWidget(0, len(cols), parent)
    t.setHorizontalHeaderLabels(list(cols))
    return t


class OptimizationPanel(QWidget):
    # emitted from the worker thread; queued delivery lands on the UI thread
    progressed = Signal(int, float, float)  # iteration, merit, elapsed_s
    finished = Signal(object, object)  # result, error

    def __init__(self, connector, parent=None):
        super().__init__(parent)
        self.connector = connector
        self.svc = connector.optimization
        core = getattr(connector, "core", connector)
        self.model = OptimizationPanelModel(core)
        self.worker: OptimizationWorker | None = None
        self._merits: list[float] = []

        self.operand_table = _table(OPERAND_COLS, self)
        self.variable_table = _table(VARIABLE_COLS, self)

        btn_add_op = QPushButton("Add Operand", self)
        btn_add_var = QPushButton("Add Variable", self)
        btn_add_op.clicked.connect(
            lambda: self._add_row(
                self.operand_table, self.model.operand_types()
            )
        )
        btn_add_var.clicked.connect(
            lambda: self._add_row(
                self.variable_table, self.model.variable_types()
            )
        )
        self.save_btn = QPushButton("Save Merit", self)
        self.save_btn.clicked.connect(self._save_merit)
        self.load_btn = QPushButton("Load Merit", self)
        self.load_btn.clicked.connect(self._load_merit)
        self.report_btn = QPushButton("Tables", self)
        self.report_btn.clicked.connect(self._show_tables)

        self.optimizer_combo = QComboBox(self)
        self.optimizer_combo.addItems(list(OPTIMIZERS))
        self.run_btn = QPushButton("Optimize", self)
        self.run_btn.clicked.connect(self.run)
        self.cancel_btn = QPushButton("Cancel", self)
        self.cancel_btn.clicked.connect(self.cancel)
        self.cancel_btn.setEnabled(False)
        self.undo_btn = QPushButton("Undo Optimization", self)
        self.undo_btn.clicked.connect(connector.undo)
        self.status = QLabel("idle", self)

        from optiland_tpu_gui.analysis_panel import make_canvas

        self.canvas, self.figure = make_canvas()
        self.canvas.setMaximumHeight(220)

        self.log = QPlainTextEdit(self)
        self.log.setReadOnly(True)
        self.log.setMaximumHeight(110)

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
        row.addWidget(self.cancel_btn)
        row.addWidget(self.undo_btn)
        row.addWidget(self.save_btn)
        row.addWidget(self.load_btn)
        row.addWidget(self.report_btn)
        row.addWidget(self.status)
        layout.addLayout(row)
        layout.addWidget(self.canvas)
        layout.addWidget(self.log)

        self.progressed.connect(self._on_progress_ui)
        self.finished.connect(self._on_done_ui)

    # ---------------- table helpers ----------------

    def _add_row(self, table, type_choices=None):
        r = table.rowCount()
        table.insertRow(r)
        for c in range(table.columnCount()):
            table.setItem(r, c, QTableWidgetItem(""))
        if type_choices:
            combo = QComboBox(table)
            combo.setEditable(True)
            combo.addItems(list(type_choices))
            table.setCellWidget(r, 0, combo)

    def add_variable_row(self, var_type: str, kwargs: dict):
        """Append a pre-filled variable row (the lens editor's
        'add as optimization variable' action lands here via the
        connector's variableRequested signal)."""
        from optiland_tpu.services.view_models import OptimizationPanelModel

        self._add_row(
            self.variable_table,
            type_choices=OptimizationPanelModel.variable_types(),
        )
        r = self.variable_table.rowCount() - 1
        combo = self.variable_table.cellWidget(r, 0)
        if combo is not None:
            combo.setCurrentText(var_type)
        surf = kwargs.get("surface_number")
        if surf is not None:
            self.variable_table.item(r, 1).setText(str(int(surf)))

    def _type_at(self, table, r):
        w = table.cellWidget(r, 0)
        if w is not None:
            return w.currentText().strip()
        return self._cell(table, r, 0)

    @staticmethod
    def _cell(table, r, c, default=""):
        item = table.item(r, c)
        return item.text().strip() if item else default

    def _operand_specs(self):
        specs = []
        for r in range(self.operand_table.rowCount()):
            typ = self._type_at(self.operand_table, r)
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
            typ = self._type_at(self.variable_table, r)
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

    # ---------------- async run ----------------

    def run(self):
        if self.worker is not None and self.worker.running:
            return
        try:
            self.svc.build_problem(
                self._operand_specs(), self._variable_specs()
            )
            self._before = float(self.svc.problem.sum_squared())
        except Exception as err:
            self.log.appendPlainText(
                f"{type(err).__name__}: {err}\n"
                + traceback.format_exc(limit=3)
            )
            return
        self._merits = [self._before]
        self._draw_curve()
        self.worker = OptimizationWorker(
            self.svc,
            on_progress=lambda p: self.progressed.emit(
                p.iteration, p.merit, p.elapsed_s
            ),
            on_done=lambda r, e: self.finished.emit(r, e),
        )
        self.run_btn.setEnabled(False)
        self.cancel_btn.setEnabled(True)
        self.status.setText("running...")
        self.worker.start(self.optimizer_combo.currentText())

    def cancel(self):
        if self.worker is not None:
            self.worker.cancel()
            self.status.setText("cancelling...")

    # ---------------- UI-thread slots ----------------

    def _on_progress_ui(self, iteration, merit, elapsed):
        self._merits.append(merit)
        self.status.setText(
            f"iter {iteration}  merit {merit:.6g}  ({elapsed:.1f}s)"
        )
        self._draw_curve()

    def _on_done_ui(self, result, error):
        self.run_btn.setEnabled(True)
        self.cancel_btn.setEnabled(False)
        if error:
            self.status.setText("error")
            self.log.appendPlainText(str(error))
        elif self.worker is not None and self.worker.cancelled:
            self.status.setText("cancelled")
            self.log.appendPlainText("optimization cancelled")
        else:
            try:
                after = float(self.svc.problem.sum_squared())
                self.status.setText("done")
                self.log.appendPlainText(
                    f"merit: {self._before:.6g} -> {after:.6g}\n{result}"
                )
            except Exception as err:
                self.log.appendPlainText(f"{type(err).__name__}: {err}")
        self.connector.opticChanged.emit()

    # ---------------- merit persistence / reports ----------------

    def _sync_model(self):
        self.model.operands = self._operand_specs()
        self.model.variables = self._variable_specs()

    def _save_merit(self):
        path, _ = QFileDialog.getSaveFileName(
            self, "Save merit definition", "merit.json", "JSON (*.json)"
        )
        if path:
            self._sync_model()
            self.model.save(path)
            self.log.appendPlainText(f"saved {path}")

    def _load_merit(self):
        path, _ = QFileDialog.getOpenFileName(
            self, "Load merit definition", "", "JSON (*.json)"
        )
        if not path:
            return
        self.model.load(path)
        self.operand_table.setRowCount(0)
        self.variable_table.setRowCount(0)
        for o in self.model.operands:
            self._add_row(self.operand_table, self.model.operand_types())
            r = self.operand_table.rowCount() - 1
            self.operand_table.cellWidget(r, 0).setCurrentText(o["type"])
            if o.get("target") is not None:
                self.operand_table.item(r, 1).setText(str(o["target"]))
            self.operand_table.item(r, 2).setText(str(o.get("weight", 1.0)))
            extra = ",".join(
                f"{k}={v}" for k, v in o.items()
                if k not in ("type", "target", "weight", "min_val",
                             "max_val")
            )
            self.operand_table.item(r, 3).setText(extra)
        for v in self.model.variables:
            self._add_row(self.variable_table, self.model.variable_types())
            r = self.variable_table.rowCount() - 1
            self.variable_table.cellWidget(r, 0).setCurrentText(v["type"])
            if "surface_number" in v:
                self.variable_table.item(r, 1).setText(
                    str(v["surface_number"])
                )
        self.log.appendPlainText(f"loaded {path}")

    def _show_tables(self):
        try:
            self.svc.build_problem(
                self._operand_specs(), self._variable_specs()
            )
            self.log.appendPlainText(self.model.operand_info_text())
            self.log.appendPlainText(self.model.variable_info_text())
            self.log.appendPlainText(self.model.merit_info_text())
        except Exception as err:
            self.log.appendPlainText(f"{type(err).__name__}: {err}")

    def _draw_curve(self):
        self.figure.clear()
        ax = self.figure.add_subplot(111)
        ax.plot(range(len(self._merits)), self._merits, "-o", ms=3)
        ax.set_xlabel("iteration")
        ax.set_ylabel("merit")
        if len(self._merits) > 1 and min(self._merits) > 0:
            ax.set_yscale("log")
        self.canvas.draw_idle()
