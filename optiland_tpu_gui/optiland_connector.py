"""Qt signal bridge over the headless services connector.

The reference's ``OptilandConnector`` is a QObject facade owning the optic
and services and emitting change signals (reference:
optiland_gui/optiland_connector.py:34-77,229-268). Here the state and
services live in :class:`optiland_tpu.services.OptilandConnector`; this
class wraps it, forwards every service, and converts the headless
callback events into Qt signals for widgets to bind to.
"""

from __future__ import annotations

from optiland_tpu.services import OptilandConnector as HeadlessConnector

from optiland_tpu_gui.qt import QObject, Signal


class OptilandConnector(QObject):
    opticLoaded = Signal()
    opticChanged = Signal()
    surfaceDataChanged = Signal(int, int)  # row, col
    surfaceCountChanged = Signal()
    systemPropertiesChanged = Signal()
    undoStackChanged = Signal()
    # lens editor -> optimization panel: "add this cell as a variable"
    # (reference: lens_editor.py:332-348)
    variableRequested = Signal(str, object)  # var_type, kwargs dict

    def __init__(self, optic=None, parent=None):
        super().__init__(parent)
        self.core = HeadlessConnector(optic)
        c = self.core
        c.subscribe("optic_loaded", lambda **k: self._loaded())
        c.subscribe("surface_changed", lambda **k: self._surface_changed(**k))
        c.subscribe("surface_added", lambda **k: self._count_changed())
        c.subscribe("surface_removed", lambda **k: self._count_changed())
        c.subscribe("stop_changed", lambda **k: self._count_changed())
        c.subscribe("system_changed", lambda **k: self._system_changed())

    # -------------- event fan-out --------------

    def _loaded(self):
        self.opticLoaded.emit()
        self.opticChanged.emit()
        self.undoStackChanged.emit()

    def _surface_changed(self, row=0, col=0, **_):
        self.surfaceDataChanged.emit(int(row), int(col))
        self.opticChanged.emit()
        self.undoStackChanged.emit()

    def _count_changed(self, **_):
        self.surfaceCountChanged.emit()
        self.opticChanged.emit()
        self.undoStackChanged.emit()

    def _system_changed(self, **_):
        self.systemPropertiesChanged.emit()
        self.opticChanged.emit()
        self.undoStackChanged.emit()

    # -------------- facade --------------

    def get_optic(self):
        return self.core.get_optic()

    def set_optic(self, optic):
        self.core.set_optic(optic)

    @property
    def file(self):
        return self.core.file

    @property
    def surfaces(self):
        return self.core.surfaces

    @property
    def system(self):
        return self.core.system

    @property
    def optimization(self):
        return self.core.optimization

    @property
    def analysis(self):
        return self.core.analysis

    def can_undo(self):
        return self.core.undo_manager.can_undo()

    def can_redo(self):
        return self.core.undo_manager.can_redo()

    def undo(self):
        self.core.undo()
        self.opticChanged.emit()
        self.undoStackChanged.emit()

    def redo(self):
        self.core.redo()
        self.opticChanged.emit()
        self.undoStackChanged.emit()
