"""System properties panel — paged editor for aperture, fields,
wavelengths, polarization, environment, and notes with staged
Apply/Revert semantics
(reference: optiland_gui/system_properties_panel.py, 756 LoC;
services/system_service.py:16).

All state logic lives in the headless
``optiland_tpu.services.view_models.SystemPropertiesModel`` (tested
without Qt): edits stage into the model and ``Apply`` commits every page
in ONE undo step; ``Revert`` reloads from the optic.
"""

from __future__ import annotations

from optiland_tpu.services.view_models import SystemPropertiesModel

from optiland_tpu_gui.qt import (
    QComboBox,
    QDoubleSpinBox,
    QFormLayout,
    QHBoxLayout,
    QLabel,
    QLineEdit,
    QPlainTextEdit,
    QPushButton,
    QTableWidget,
    QTableWidgetItem,
    QTabWidget,
    QVBoxLayout,
    QWidget,
)

_AP_TYPES = ("EPD", "imageFNO", "objectNA", "float_by_stop_size")
_FIELD_TYPES = ("angle", "object_height", "paraxial_image_height",
                "real_image_height")
_POL_STATES = ("ignore", "H", "V", "L+45", "L-45", "RCP", "LCP")


class AperturePage(QWidget):
    def __init__(self, model, parent=None):
        super().__init__(parent)
        self.model = model
        self.type_combo = QComboBox(self)
        self.type_combo.addItems(_AP_TYPES)
        self.value_spin = QDoubleSpinBox(self)
        self.value_spin.setRange(0.0, 1e9)
        self.value_spin.setDecimals(6)
        self.type_combo.currentTextChanged.connect(self._stage)
        self.value_spin.valueChanged.connect(self._stage)
        form = QFormLayout(self)
        form.addRow("Aperture type", self.type_combo)
        form.addRow("Value", self.value_spin)
        self.refresh()

    def refresh(self):
        ap = self.model.staged["aperture"]
        self.type_combo.blockSignals(True)
        self.value_spin.blockSignals(True)
        idx = self.type_combo.findText(ap["type"])
        if idx >= 0:
            self.type_combo.setCurrentIndex(idx)
        self.value_spin.setValue(float(ap["value"]))
        self.type_combo.blockSignals(False)
        self.value_spin.blockSignals(False)

    def _stage(self, *_):
        self.model.set_aperture(
            self.type_combo.currentText(), self.value_spin.value()
        )


class FieldsPage(QWidget):
    COLS = ("x", "y", "vx", "vy", "weight")

    def __init__(self, model, parent=None):
        super().__init__(parent)
        self.model = model
        self._building = False
        self.type_combo = QComboBox(self)
        self.type_combo.addItems(_FIELD_TYPES)
        self.type_combo.currentTextChanged.connect(self._set_type)

        self.table = QTableWidget(0, len(self.COLS), self)
        self.table.setHorizontalHeaderLabels(
            ["X", "Y", "Vig X", "Vig Y", "Weight"]
        )
        self.table.itemChanged.connect(self._edited)
        add_btn = QPushButton("Add Field", self)
        add_btn.clicked.connect(self._add)
        rm_btn = QPushButton("Remove Selected", self)
        rm_btn.clicked.connect(self._remove)

        layout = QVBoxLayout(self)
        row = QHBoxLayout()
        row.addWidget(QLabel("Field type"))
        row.addWidget(self.type_combo, 1)
        layout.addLayout(row)
        layout.addWidget(self.table)
        btns = QHBoxLayout()
        btns.addWidget(add_btn)
        btns.addWidget(rm_btn)
        btns.addStretch(1)
        layout.addLayout(btns)
        self.refresh()

    def refresh(self):
        self._building = True
        try:
            st = self.model.staged["fields"]
            idx = self.type_combo.findText(st["type"])
            if idx >= 0:
                self.type_combo.setCurrentIndex(idx)
            pts = st["points"]
            self.table.setRowCount(len(pts))
            for i, p in enumerate(pts):
                for j, key in enumerate(self.COLS):
                    self.table.setItem(
                        i, j, QTableWidgetItem(f"{p[key]:g}")
                    )
        finally:
            self._building = False

    def _set_type(self, text):
        if not self._building:
            self.model.set_field_type(text)

    def _edited(self, item):
        if self._building:
            return
        try:
            val = float(item.text())
        except ValueError:
            self.refresh()
            return
        self.model.staged["fields"]["points"][item.row()][
            self.COLS[item.column()]
        ] = val

    def _add(self):
        self.model.add_field(y=0.0)
        self.refresh()

    def _remove(self):
        r = self.table.currentRow()
        if r >= 0:
            self.model.remove_field(r)
            self.refresh()


class WavelengthsPage(QWidget):
    def __init__(self, model, parent=None):
        super().__init__(parent)
        self.model = model
        self._building = False
        self.table = QTableWidget(0, 3, self)
        self.table.setHorizontalHeaderLabels(
            ["Value (um)", "Primary", "Weight"]
        )
        self.table.itemChanged.connect(self._edited)
        self.spin = QDoubleSpinBox(self)
        self.spin.setRange(0.01, 100.0)
        self.spin.setDecimals(4)
        self.spin.setValue(0.55)
        add_btn = QPushButton("Add", self)
        add_btn.clicked.connect(self._add)
        rm_btn = QPushButton("Remove Selected", self)
        rm_btn.clicked.connect(self._remove)
        pri_btn = QPushButton("Set Primary", self)
        pri_btn.clicked.connect(self._set_primary)

        layout = QVBoxLayout(self)
        layout.addWidget(self.table)
        row = QHBoxLayout()
        row.addWidget(self.spin, 1)
        for b in (add_btn, rm_btn, pri_btn):
            row.addWidget(b)
        layout.addLayout(row)
        self.refresh()

    def refresh(self):
        self._building = True
        try:
            wl = self.model.staged["wavelengths"]
            self.table.setRowCount(len(wl))
            for i, w in enumerate(wl):
                self.table.setItem(
                    i, 0, QTableWidgetItem(f"{w['value']:g}")
                )
                self.table.setItem(
                    i, 1, QTableWidgetItem("yes" if w["primary"] else "")
                )
                self.table.setItem(
                    i, 2, QTableWidgetItem(f"{w['weight']:g}")
                )
        finally:
            self._building = False

    def _edited(self, item):
        if self._building or item.column() == 1:
            return
        try:
            val = float(item.text())
        except ValueError:
            self.refresh()
            return
        key = "value" if item.column() == 0 else "weight"
        self.model.staged["wavelengths"][item.row()][key] = val

    def _add(self):
        self.model.add_wavelength(self.spin.value())
        self.refresh()

    def _remove(self):
        r = self.table.currentRow()
        if r >= 0:
            self.model.remove_wavelength(r)
            self.refresh()

    def _set_primary(self):
        r = self.table.currentRow()
        if r >= 0:
            self.model.set_primary_wavelength(r)
            self.refresh()


class PolarizationPage(QWidget):
    def __init__(self, model, parent=None):
        super().__init__(parent)
        self.model = model
        self.combo = QComboBox(self)
        self.combo.addItems(_POL_STATES)
        self.combo.currentTextChanged.connect(self._stage)
        form = QFormLayout(self)
        form.addRow("Polarization", self.combo)
        self.refresh()

    def refresh(self):
        state = self.model.staged["polarization"]
        idx = self.combo.findText(
            state if isinstance(state, str) else "ignore"
        )
        if idx >= 0:
            self.combo.setCurrentIndex(idx)

    def _stage(self, text):
        self.model.set_polarization(text)


class EnvironmentPage(QWidget):
    def __init__(self, model, parent=None):
        super().__init__(parent)
        self.model = model
        self.temp = QLineEdit(self)
        self.pres = QLineEdit(self)
        self.temp.editingFinished.connect(self._stage)
        self.pres.editingFinished.connect(self._stage)
        form = QFormLayout(self)
        form.addRow("Temperature (C)", self.temp)
        form.addRow("Pressure (Pa)", self.pres)
        self.refresh()

    def refresh(self):
        env = self.model.staged["environment"]
        self.temp.setText(f"{env['temperature']:g}")
        self.pres.setText(f"{env['pressure']:g}")

    def _stage(self):
        try:
            self.model.staged["environment"] = {
                "temperature": float(self.temp.text()),
                "pressure": float(self.pres.text()),
            }
        except ValueError:
            self.refresh()


class NotesPage(QWidget):
    def __init__(self, model, parent=None):
        super().__init__(parent)
        self.model = model
        self.edit = QPlainTextEdit(self)
        self.edit.textChanged.connect(self._stage)
        layout = QVBoxLayout(self)
        layout.addWidget(self.edit)
        self.refresh()

    def refresh(self):
        if self.edit.toPlainText() != self.model.staged["notes"]:
            self.edit.setPlainText(self.model.staged["notes"])

    def _stage(self):
        self.model.set_notes(self.edit.toPlainText())


class SystemPropertiesPanel(QWidget):
    def __init__(self, connector, parent=None):
        super().__init__(parent)
        self.connector = connector
        core = getattr(connector, "core", connector)
        self.model = SystemPropertiesModel(core)
        self.tabs = QTabWidget(self)
        self.pages = {
            "Aperture": AperturePage(self.model, self),
            "Fields": FieldsPage(self.model, self),
            "Wavelengths": WavelengthsPage(self.model, self),
            "Polarization": PolarizationPage(self.model, self),
            "Environment": EnvironmentPage(self.model, self),
            "Notes": NotesPage(self.model, self),
        }
        for name, page in self.pages.items():
            self.tabs.addTab(page, name)

        self.apply_btn = QPushButton("Apply", self)
        self.apply_btn.clicked.connect(self.apply)
        self.revert_btn = QPushButton("Revert", self)
        self.revert_btn.clicked.connect(self.revert)

        layout = QVBoxLayout(self)
        layout.addWidget(self.tabs)
        btns = QHBoxLayout()
        btns.addStretch(1)
        btns.addWidget(self.revert_btn)
        btns.addWidget(self.apply_btn)
        layout.addLayout(btns)

        connector.opticLoaded.connect(self.revert)
        connector.systemPropertiesChanged.connect(self.revert)

    def refresh(self):
        for page in self.pages.values():
            page.refresh()

    def apply(self):
        self.model.apply()
        self.connector.systemPropertiesChanged.emit()
        self.refresh()

    def revert(self):
        self.model.revert()
        self.refresh()
