"""System properties panel — aperture, fields, wavelengths, polarization
(reference: optiland_gui/system_properties_panel.py, 756 LoC;
services/system_service.py:16).
"""

from __future__ import annotations

from optiland_tpu_gui.qt import (
    QComboBox,
    QDoubleSpinBox,
    QFormLayout,
    QHBoxLayout,
    QLabel,
    QPushButton,
    QTableWidget,
    QTableWidgetItem,
    QTabWidget,
    QVBoxLayout,
    QWidget,
)


class AperturePage(QWidget):
    def __init__(self, connector, parent=None):
        super().__init__(parent)
        self.connector = connector
        self.type_combo = QComboBox(self)
        self.type_combo.addItems(connector.system.get_aperture_types())
        self.value_spin = QDoubleSpinBox(self)
        self.value_spin.setRange(0.0, 1e9)
        self.value_spin.setDecimals(6)
        apply_btn = QPushButton("Apply", self)
        apply_btn.clicked.connect(self._apply)

        form = QFormLayout(self)
        form.addRow("Aperture type", self.type_combo)
        form.addRow("Value", self.value_spin)
        form.addRow(apply_btn)
        self.refresh()

    def refresh(self):
        ap = self.connector.get_optic().aperture
        if ap is not None:
            idx = self.type_combo.findText(ap.ap_type)
            if idx >= 0:
                self.type_combo.setCurrentIndex(idx)
            self.value_spin.setValue(float(ap.value))

    def _apply(self):
        self.connector.system.set_aperture(
            self.type_combo.currentText(), self.value_spin.value()
        )


class FieldsPage(QWidget):
    def __init__(self, connector, parent=None):
        super().__init__(parent)
        self.connector = connector
        self.type_combo = QComboBox(self)
        for key, label in connector.system.get_field_types():
            self.type_combo.addItem(label, key)
        self.type_combo.currentIndexChanged.connect(self._set_type)

        self.table = QTableWidget(0, 2, self)
        self.table.setHorizontalHeaderLabels(["X", "Y"])
        add_btn = QPushButton("Add Field", self)
        add_btn.clicked.connect(self._add)

        layout = QVBoxLayout(self)
        row = QHBoxLayout()
        row.addWidget(QLabel("Field type"))
        row.addWidget(self.type_combo, 1)
        layout.addLayout(row)
        layout.addWidget(self.table)
        layout.addWidget(add_btn)
        self.refresh()

    def refresh(self):
        fields = self.connector.get_optic().fields
        pts = getattr(fields, "fields", [])
        self.table.setRowCount(len(pts))
        for i, f in enumerate(pts):
            self.table.setItem(i, 0, QTableWidgetItem(f"{f.x:g}"))
            self.table.setItem(i, 1, QTableWidgetItem(f"{f.y:g}"))

    def _set_type(self):
        key = self.type_combo.currentData()
        if key:
            self.connector.system.set_field_type(key)

    def _add(self):
        self.connector.system.add_field(y=0.0)
        self.refresh()


class WavelengthsPage(QWidget):
    def __init__(self, connector, parent=None):
        super().__init__(parent)
        self.connector = connector
        self.table = QTableWidget(0, 2, self)
        self.table.setHorizontalHeaderLabels(["Value (um)", "Primary"])
        self.spin = QDoubleSpinBox(self)
        self.spin.setRange(0.01, 100.0)
        self.spin.setDecimals(4)
        self.spin.setValue(0.55)
        add_btn = QPushButton("Add Wavelength", self)
        add_btn.clicked.connect(self._add)

        layout = QVBoxLayout(self)
        layout.addWidget(self.table)
        row = QHBoxLayout()
        row.addWidget(self.spin, 1)
        row.addWidget(add_btn)
        layout.addLayout(row)
        self.refresh()

    def refresh(self):
        wg = self.connector.get_optic().wavelengths
        vals = getattr(wg, "wavelengths", [])
        self.table.setRowCount(len(vals))
        for i, w in enumerate(vals):
            self.table.setItem(i, 0, QTableWidgetItem(f"{w.value:g}"))
            primary = "yes" if getattr(w, "is_primary", False) else ""
            self.table.setItem(i, 1, QTableWidgetItem(primary))

    def _add(self):
        self.connector.system.add_wavelength(self.spin.value())
        self.refresh()


class SystemPropertiesPanel(QWidget):
    def __init__(self, connector, parent=None):
        super().__init__(parent)
        self.connector = connector
        self.tabs = QTabWidget(self)
        self.aperture_page = AperturePage(connector, self)
        self.fields_page = FieldsPage(connector, self)
        self.wavelengths_page = WavelengthsPage(connector, self)
        self.tabs.addTab(self.aperture_page, "Aperture")
        self.tabs.addTab(self.fields_page, "Fields")
        self.tabs.addTab(self.wavelengths_page, "Wavelengths")

        layout = QVBoxLayout(self)
        layout.addWidget(self.tabs)

        connector.opticLoaded.connect(self.refresh)
        connector.systemPropertiesChanged.connect(self.refresh)

    def refresh(self):
        self.aperture_page.refresh()
        self.fields_page.refresh()
        self.wavelengths_page.refresh()
