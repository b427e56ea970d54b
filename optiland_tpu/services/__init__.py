"""Headless application-services layer.

The reference ships a PySide6 GUI whose logic lives in a connector facade
plus services (reference: optiland_gui/optiland_connector.py:34-726,
services/{file,surface,system,optimization}_service.py,
services/analysis_runner.py, undo_redo_manager.py:21-134). This package
provides the same services without any Qt dependency: change notification
is via plain callback lists, so a GUI, notebook, or web frontend can drive
the full system-editing workflow headlessly.
"""

from __future__ import annotations

import copy
from typing import Any, Callable

import numpy as np


class UndoRedoManager:
    """Snapshot-stack undo/redo (reference: undo_redo_manager.py:21)."""

    def __init__(self, limit: int = 100):
        self._undo: list = []
        self._redo: list = []
        self.limit = limit

    def add_state(self, state):
        self._undo.append(copy.deepcopy(state))
        if len(self._undo) > self.limit:
            self._undo.pop(0)
        self._redo.clear()

    def undo(self, current_state):
        if not self._undo:
            return None
        self._redo.append(copy.deepcopy(current_state))
        return self._undo.pop()

    def redo(self, current_state):
        if not self._redo:
            return None
        self._undo.append(copy.deepcopy(current_state))
        return self._redo.pop()

    def can_undo(self) -> bool:
        return bool(self._undo)

    def can_redo(self) -> bool:
        return bool(self._redo)

    def clear_stacks(self):
        self._undo.clear()
        self._redo.clear()


class FileService:
    """New/load/save plus Zemax and CODE V import/export
    (reference: services/file_service.py:98)."""

    def __init__(self, connector: "OptilandConnector"):
        self.c = connector

    def new_system(self):
        from optiland_tpu.optic import Optic

        optic = Optic("New System")
        optic.surfaces.add(index=0, radius=np.inf, thickness=np.inf)
        optic.surfaces.add(index=1, radius=np.inf, thickness=5.0,
                           is_stop=True)
        optic.surfaces.add(index=2)
        optic.set_aperture("EPD", 10.0)
        optic.fields.set_type("angle")
        optic.fields.add(y=0)
        optic.wavelengths.add(0.55, is_primary=True)
        self.c.set_optic(optic)

    def load(self, filepath: str):
        from optiland_tpu.fileio import load_optiland_file

        self.c.set_optic(load_optiland_file(filepath))

    def save(self, filepath: str):
        from optiland_tpu.fileio import save_optiland_file

        save_optiland_file(self.c.get_optic(), filepath)

    def load_from_object(self, optic):
        self.c.set_optic(optic)

    def import_zemax(self, filepath: str):
        from optiland_tpu.fileio import load_zemax_file

        self.c.set_optic(load_zemax_file(filepath))

    def import_codev(self, filepath: str):
        from optiland_tpu.fileio import load_codev_file

        self.c.set_optic(load_codev_file(filepath))

    def export_zemax(self, filepath: str):
        from optiland_tpu.fileio import save_zemax_file

        save_zemax_file(self.c.get_optic(), filepath)

    def export_codev(self, filepath: str):
        from optiland_tpu.fileio import save_codev_file

        save_codev_file(self.c.get_optic(), filepath)


class SurfaceService:
    """Spreadsheet-style (LDE) surface editing
    (reference: services/surface_service.py:27)."""

    COLUMNS = ("Type", "Comment", "Radius", "Thickness", "Material",
               "Conic", "Semi-Diameter")

    def __init__(self, connector: "OptilandConnector"):
        self.c = connector

    def get_column_headers(self, row: int = -1):
        return list(self.COLUMNS)

    def get_surface_count(self) -> int:
        return len(self.c.get_optic().surfaces.surfaces)

    def get_available_surface_types(self):
        from optiland_tpu.optic.optic import _GEOM_CODES

        return sorted({*(_GEOM_CODES.keys()), "grating"})

    def get_surface_data(self, row: int, col_idx: int):
        s = self.c.get_optic().surfaces.surfaces[row]
        col = self.COLUMNS[col_idx]
        if col == "Type":
            return s.surface_type or "standard"
        if col == "Comment":
            return s.comment
        if col == "Radius":
            return float(s.radius)
        if col == "Thickness":
            return float(s.thickness)
        if col == "Material":
            m = s.material
            return m if isinstance(m, str) else getattr(m, "name", str(m))
        if col == "Conic":
            return float(s.conic)
        if col == "Semi-Diameter":
            ap = s.aperture
            return float(ap) / 2 if isinstance(ap, (int, float)) else None
        raise IndexError(col_idx)

    def set_surface_data(self, row: int, col_idx: int, value):
        self.c.snapshot()
        optic = self.c.get_optic()
        s = optic.surfaces.surfaces[row]
        col = self.COLUMNS[col_idx]
        if col == "Comment":
            s.comment = str(value)
        elif col == "Radius":
            s.radius = float(value)
        elif col == "Thickness":
            s.thickness = float(value)
        elif col == "Material":
            s.material = value
            s._material_obj = None
        elif col == "Conic":
            s.conic = float(value)
        elif col == "Semi-Diameter":
            s.aperture = 2 * float(value)
        elif col == "Type":
            s.surface_type = str(value)
        else:
            raise IndexError(col_idx)
        optic._invalidate()
        self.c.notify("surface_changed", row=row, col=col_idx)

    def add_surface(self, index: int = -1):
        self.c.snapshot()
        optic = self.c.get_optic()
        n = len(optic.surfaces.surfaces)
        if index < 0:
            index = n - 1  # insert before the image surface
        optic.surfaces.add(index=index, radius=np.inf, thickness=0.0)
        optic._invalidate()
        self.c.notify("surface_added", index=index)

    def remove_surface(self, row: int):
        optic = self.c.get_optic()
        n = len(optic.surfaces.surfaces)
        if row <= 0 or row >= n - 1:
            raise ValueError("Cannot remove the object or image surface.")
        self.c.snapshot()
        optic.surfaces.surfaces.pop(row)
        optic._invalidate()
        self.c.notify("surface_removed", index=row)

    def set_stop_surface(self, row: int):
        self.c.snapshot()
        optic = self.c.get_optic()
        for i, s in enumerate(optic.surfaces.surfaces):
            s.is_stop = i == row
        optic._invalidate()
        self.c.notify("stop_changed", index=row)

    # ---- per-surface-type extended parameters ----
    # (reference: lens_editor.py surface-type delegates expose the extra
    # columns of each surface type; here they map onto the SurfaceDef's
    # generic geo_p1/geo_p2/geo_aux/coefficients storage)

    def get_type_params(self, row: int) -> dict:
        """Editable extended parameters for the surface's current type."""
        s = self.c.get_optic().surfaces.surfaces[row]
        t = s.surface_type or "standard"
        coeffs = list(np.ravel(np.asarray(s.coefficients, float))) if (
            np.size(s.coefficients)
        ) else []
        if t in ("even_asphere", "odd_asphere", "polynomial"):
            return {"coefficients": coeffs}
        if t == "chebyshev":
            return {"norm_x": float(s.geo_p1), "norm_y": float(s.geo_p2),
                    "coefficients": coeffs}
        if t == "zernike":
            return {"norm_radius": float(s.geo_p1),
                    "zernike_type": s.geo_aux[0] if s.geo_aux else "fringe",
                    "coefficients": coeffs}
        if t == "biconic":
            return {"radius_y": float(s.geo_p1), "conic_y": float(s.geo_p2)}
        if t == "toroidal":
            return {"radius_y": float(s.geo_p1), "coefficients": coeffs}
        if t == "paraxial":
            return {"focal_length": float(s.geo_p1)}
        if t == "grating":
            order = s.geo_aux[1] if s.geo_aux else 0
            return {"grating_period": float(s.geo_p1),
                    "groove_orientation_angle": float(s.geo_p2),
                    "grating_order": int(order)}
        if t in ("forbes_qbfs", "forbes_q2d"):
            return {"norm_radius": float(s.geo_p1), "coefficients": coeffs}
        return {}

    def set_type_params(self, row: int, **params):
        """Write extended parameters back (undoable, notifies)."""
        self.c.snapshot()
        optic = self.c.get_optic()
        s = optic.surfaces.surfaces[row]
        t = s.surface_type or "standard"
        for key, value in params.items():
            if key == "coefficients":
                s.coefficients = tuple(float(v) for v in value)
            elif key in ("norm_x", "radius_y", "norm_radius",
                         "focal_length", "grating_period"):
                s.geo_p1 = float(value)
            elif key in ("norm_y", "conic_y",
                         "groove_orientation_angle"):
                s.geo_p2 = float(value)
            elif key == "zernike_type":
                s.geo_aux = (str(value),)
            elif key == "grating_order":
                s.geo_aux = ("grating", int(value))
            else:
                raise KeyError(
                    f"{key!r} is not an editable parameter of "
                    f"surface type {t!r}"
                )
        optic._invalidate()
        self.c.notify("surface_changed", row=row, col=0)


class SystemService:
    """Aperture / field / wavelength configuration
    (reference: services/system_service.py:16)."""

    def __init__(self, connector: "OptilandConnector"):
        self.c = connector

    def get_aperture_types(self):
        return ["EPD", "imageFNO", "objectNA", "float_by_stop_size"]

    def get_field_types(self):
        return [("angle", "Angle (deg)"),
                ("object_height", "Object Height (mm)")]

    def set_aperture(self, ap_type: str, value: float):
        self.c.snapshot()
        self.c.get_optic().set_aperture(ap_type, float(value))
        self.c.notify("system_changed")

    def set_field_type(self, field_type: str):
        self.c.snapshot()
        self.c.get_optic().set_field_type(field_type)
        self.c.notify("system_changed")

    def add_field(self, y: float, x: float = 0.0):
        self.c.snapshot()
        self.c.get_optic().fields.add(x=x, y=y)
        self.c.get_optic()._invalidate()
        self.c.notify("system_changed")

    def add_wavelength(self, value_um: float, is_primary: bool = False):
        self.c.snapshot()
        self.c.get_optic().wavelengths.add(value_um, is_primary=is_primary)
        self.c.get_optic()._invalidate()
        self.c.notify("system_changed")

    def set_polarization_state(self, state):
        self.c.snapshot()
        self.c.get_optic().set_polarization(state)
        self.c.notify("system_changed")


class OptimizationService:
    """Build and run optimization problems from plain specs
    (reference: services/optimization_service.py:1-882)."""

    def __init__(self, connector: "OptilandConnector"):
        self.c = connector
        self.problem = None
        self.result = None

    def build_problem(self, operands: list[dict], variables: list[dict]):
        from optiland_tpu.optimization import OptimizationProblem

        optic = self.c.get_optic()
        p = OptimizationProblem(optic)
        for spec in operands:
            spec = dict(spec)
            p.add_operand(
                spec.pop("type"),
                target=spec.pop("target", None),
                min_val=spec.pop("min_val", None),
                max_val=spec.pop("max_val", None),
                weight=spec.pop("weight", 1.0),
                input_data={"optic": optic, **spec},
            )
        for spec in variables:
            spec = dict(spec)
            p.add_variable(optic, spec.pop("type"), **spec)
        self.problem = p
        return p

    def run(self, optimizer: str = "generic", **kwargs):
        from optiland_tpu import optimization as opt

        if self.problem is None:
            raise RuntimeError("Call build_problem first.")
        self.c.snapshot()
        cls = {
            "generic": opt.OptimizerGeneric,
            "least_squares": opt.LeastSquares,
            "orthogonal_descent": opt.OrthogonalDescent,
            "dual_annealing": opt.DualAnnealing,
            "differential_evolution": opt.DifferentialEvolution,
            "glass_expert": opt.GlassExpert,
        }[optimizer]
        runner = cls(self.problem)
        self.result = (
            runner.run(**kwargs) if optimizer == "glass_expert"
            else runner.optimize(**kwargs)
        )
        self.c.notify("system_changed")
        return self.result


class AnalysisRunner:
    """Name -> analysis class registry and runner
    (reference: services/analysis_runner.py:15)."""

    def __init__(self, connector: "OptilandConnector"):
        self.c = connector
        self.result = None

    def get_analysis_registry(self):
        import optiland_tpu.analysis as analysis
        from optiland_tpu.mtf import FFTMTF, GeometricMTF
        from optiland_tpu.psf import FFTPSF, HuygensPSF, MMDFTPSF

        registry = {}
        for name in analysis.__all__:
            obj = getattr(analysis, name)
            if isinstance(obj, type):
                registry[name] = obj
        registry.update({
            "FFTPSF": FFTPSF, "HuygensPSF": HuygensPSF, "MMDFTPSF": MMDFTPSF,
            "FFTMTF": FFTMTF, "GeometricMTF": GeometricMTF,
        })
        return registry

    def run(self, name: str, **kwargs):
        cls = self.get_analysis_registry()[name]
        self.result = cls(self.c.get_optic(), **kwargs)
        return self.result

    def get_result(self):
        return self.result


class OptilandConnector:
    """Headless facade tying the services together around one Optic
    (reference: optiland_connector.py:34)."""

    def __init__(self, optic=None):
        self._optic = optic
        self._listeners: dict[str, list[Callable[..., Any]]] = {}
        self.undo_manager = UndoRedoManager()
        self.file = FileService(self)
        self.surfaces = SurfaceService(self)
        self.system = SystemService(self)
        self.optimization = OptimizationService(self)
        self.analysis = AnalysisRunner(self)
        if optic is None:
            self.file.new_system()

    # ---------------- optic + change notification ----------------

    def get_optic(self):
        return self._optic

    def set_optic(self, optic):
        self._optic = optic
        self.undo_manager.clear_stacks()
        self.notify("optic_loaded")

    def subscribe(self, event: str, callback):
        self._listeners.setdefault(event, []).append(callback)

    def notify(self, event: str, **kwargs):
        for cb in self._listeners.get(event, []):
            cb(**kwargs)

    # ---------------- undo/redo via dict snapshots ----------------

    def _state(self) -> dict:
        from optiland_tpu.fileio import optic_to_dict

        return optic_to_dict(self._optic)

    def snapshot(self):
        self.undo_manager.add_state(self._state())

    def undo(self):
        from optiland_tpu.fileio import optic_from_dict

        state = self.undo_manager.undo(self._state())
        if state is not None:
            self._optic = optic_from_dict(state)
            self.notify("optic_loaded")

    def redo(self):
        from optiland_tpu.fileio import optic_from_dict

        state = self.undo_manager.redo(self._state())
        if state is not None:
            self._optic = optic_from_dict(state)
            self.notify("optic_loaded")


__all__ = [
    "AnalysisRunner",
    "FileService",
    "OptilandConnector",
    "OptimizationService",
    "SurfaceService",
    "SystemService",
    "UndoRedoManager",
]
