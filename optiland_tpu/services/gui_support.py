"""Headless GUI logic: settings schemas, result history, async optimization,
session persistence, lens-editor field specs.

The reference implements these inside Qt widget classes
(reference: optiland_gui/analysis_panel.py:1-1664 settings forms + result
tabs, optimization_panel.py:1-1257 threaded optimizer with progress/cancel,
main_window.py:1-1022 QSettings layout + recent files,
lens_editor.py delegates). Here the logic lives Qt-free so it is fully
testable headlessly; the Qt panels in ``optiland_tpu_gui`` are thin views
over these classes.
"""

from __future__ import annotations

import inspect
import json
import os
import threading
import time
from dataclasses import dataclass, field
from typing import Any, Callable

# ---------------------------------------------------------------------------
# Analysis settings schemas (drives auto-generated settings forms)
# ---------------------------------------------------------------------------


@dataclass
class SettingField:
    """One form field derived from an analysis constructor parameter."""

    name: str
    kind: str  # int | float | str | bool | tuple | list | any
    default: Any
    choices: tuple | None = None


# constructor parameters that are never user-facing settings
_HIDDEN_PARAMS = {"self", "optic", "lens", "args", "kwargs"}

# known enumerated string settings (matches the distributions /
# wavelength conventions used across the analysis suite)
_CHOICES = {
    "distribution": (
        "hexapolar", "grid", "random", "uniform", "line_x", "line_y",
        "ring", "gaussian_quad",
    ),
    "wavelength": None,  # free-form: float or "primary"/"all"
    "zernike_type": ("standard", "fringe", "noll"),
    "coordinates": ("local", "global"),
}


def _kind_of(value) -> str:
    if isinstance(value, bool):
        return "bool"
    if isinstance(value, int):
        return "int"
    if isinstance(value, float):
        return "float"
    if isinstance(value, str):
        return "str"
    if isinstance(value, tuple):
        return "tuple"
    if isinstance(value, list):
        return "list"
    return "any"


def analysis_settings_schema(cls) -> list[SettingField]:
    """Form schema from an analysis class's constructor signature.

    Every keyword parameter with a default becomes a typed form field;
    required non-optic parameters become 'any' fields with default None.
    """
    try:
        sig = inspect.signature(cls.__init__)
    except (TypeError, ValueError):
        return []
    fields: list[SettingField] = []
    for name, p in sig.parameters.items():
        if name in _HIDDEN_PARAMS or p.kind in (
            inspect.Parameter.VAR_POSITIONAL, inspect.Parameter.VAR_KEYWORD
        ):
            continue
        default = None if p.default is inspect.Parameter.empty else p.default
        fields.append(
            SettingField(
                name=name,
                kind=_kind_of(default),
                default=default,
                choices=_CHOICES.get(name),
            )
        )
    return fields


def coerce_setting(f: SettingField, text):
    """Parse a user-entered string back to the field's type (form round
    trip). Non-string inputs pass through unchanged."""
    if not isinstance(text, str):
        return text
    s = text.strip()
    if f.kind == "bool":
        return s.lower() in ("1", "true", "yes", "on")
    if f.kind == "int":
        return int(float(s))
    if f.kind == "float":
        try:
            return float(s)
        except ValueError:
            return s  # e.g. wavelength="primary"
    if f.kind in ("tuple", "list"):
        parts = [p for p in s.replace("(", "").replace(")", "")
                 .replace("[", "").replace("]", "").split(",") if p.strip()]
        vals = []
        for p in parts:
            try:
                vals.append(float(p))
            except ValueError:
                vals.append(p.strip())
        return tuple(vals) if f.kind == "tuple" else list(vals)
    return s


# ---------------------------------------------------------------------------
# Analysis result history
# ---------------------------------------------------------------------------


@dataclass
class AnalysisRecord:
    seq: int
    name: str
    kwargs: dict
    result: Any
    timestamp: float
    error: str | None = None


class AnalysisSession:
    """Run analyses with settings and keep a bounded result history
    (reference: analysis_panel.py result tabs + per-analysis settings)."""

    def __init__(self, runner, limit: int = 25):
        self.runner = runner
        self.limit = limit
        self._history: list[AnalysisRecord] = []
        self._seq = 0

    def registry(self):
        return self.runner.get_analysis_registry()

    def schema(self, name: str) -> list[SettingField]:
        return analysis_settings_schema(self.registry()[name])

    def run(self, name: str, **kwargs) -> AnalysisRecord:
        self._seq += 1
        try:
            result = self.runner.run(name, **kwargs)
            rec = AnalysisRecord(
                self._seq, name, dict(kwargs), result, time.time()
            )
        except Exception as err:
            rec = AnalysisRecord(
                self._seq, name, dict(kwargs), None, time.time(),
                error=f"{type(err).__name__}: {err}",
            )
        self._history.append(rec)
        del self._history[: -self.limit]
        return rec

    def rerun(self, seq: int) -> AnalysisRecord:
        for rec in self._history:
            if rec.seq == seq:
                return self.run(rec.name, **rec.kwargs)
        raise KeyError(seq)

    @property
    def history(self) -> list[AnalysisRecord]:
        return list(self._history)

    def clear(self):
        self._history.clear()


# ---------------------------------------------------------------------------
# Asynchronous optimization with progress + cancel
# ---------------------------------------------------------------------------


@dataclass
class OptimizationProgress:
    iteration: int
    merit: float
    elapsed_s: float


class OptimizationWorker:
    """Run an optimization off the UI thread with live progress and
    cooperative cancel (reference: optimization_panel.py threads its
    optimizer and emits per-iteration signals).

    ``on_progress(OptimizationProgress)`` fires per iteration (from the
    worker thread); ``on_done(result, error)`` fires once at the end.
    ``cancel()`` stops SciPy optimizers at the next iteration boundary via
    the callback's StopIteration and optax loops via the step callback.
    """

    def __init__(self, opt_service, on_progress: Callable | None = None,
                 on_done: Callable | None = None):
        self.service = opt_service
        self.on_progress = on_progress
        self.on_done = on_done
        self._thread: threading.Thread | None = None
        self._cancel = threading.Event()
        self._iter = 0
        self._t0 = 0.0
        self.result = None
        self.error: str | None = None
        self.progress_log: list[OptimizationProgress] = []

    # ---- state ----

    @property
    def running(self) -> bool:
        return self._thread is not None and self._thread.is_alive()

    @property
    def cancelled(self) -> bool:
        return self._cancel.is_set()

    def cancel(self):
        self._cancel.set()

    def join(self, timeout=None):
        if self._thread is not None:
            self._thread.join(timeout)

    # ---- driving ----

    def _emit(self, merit: float):
        self._iter += 1
        p = OptimizationProgress(
            self._iter, float(merit), time.time() - self._t0
        )
        self.progress_log.append(p)
        if self.on_progress is not None:
            self.on_progress(p)

    def _scipy_callback(self, x, *a, **k):
        merit = float(self.service.problem.sum_squared(x))
        self._emit(merit)
        if self._cancel.is_set():
            raise StopIteration

    def _optax_callback(self, i, v):
        self._emit(v)
        if self._cancel.is_set():
            raise _Cancelled

    def start(self, optimizer: str = "generic", **kwargs):
        if self.running:
            raise RuntimeError("optimization already running")
        self._cancel.clear()
        self._iter = 0
        self.result = None
        self.error = None
        self.progress_log.clear()
        self._t0 = time.time()

        def work():
            try:
                if optimizer == "optax":
                    from optiland_tpu.optimization import OptaxOptimizer

                    self.service.c.snapshot()
                    runner = OptaxOptimizer(self.service.problem)
                    try:
                        self.result = runner.optimize(
                            callback=self._optax_callback, **kwargs
                        )
                    except _Cancelled:
                        self.result = None
                    self.service.c.notify("system_changed")
                else:
                    self.result = self.service.run(
                        optimizer, callback=self._scipy_callback, **kwargs
                    )
            except StopIteration:
                self.result = None
            except Exception as err:
                self.error = f"{type(err).__name__}: {err}"
            finally:
                if self.on_done is not None:
                    self.on_done(self.result, self.error)

        self._thread = threading.Thread(target=work, daemon=True)
        self._thread.start()
        return self._thread


class _Cancelled(Exception):
    pass


# ---------------------------------------------------------------------------
# Session persistence (recent files, panel settings, layout blobs)
# ---------------------------------------------------------------------------


class SessionStore:
    """JSON-backed GUI session state (reference: main_window.py QSettings
    layout/session persistence + recent-files menu). The Qt layer stores
    window-geometry byte blobs as hex strings through the same store, so
    the whole session round-trips through one file."""

    MAX_RECENT = 10

    def __init__(self, path: str | None = None):
        self.path = path or os.path.join(
            os.path.expanduser("~"), ".optiland_tpu_gui.json"
        )
        self._data: dict = {"recent_files": [], "settings": {}, "layout": {}}
        self._load()

    def _load(self):
        try:
            with open(self.path) as fh:
                loaded = json.load(fh)
            if isinstance(loaded, dict):
                self._data.update(loaded)
        except (OSError, ValueError):
            pass

    def save(self):
        tmp = self.path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(self._data, fh, indent=1)
        os.replace(tmp, self.path)

    # ---- recent files ----

    @property
    def recent_files(self) -> list[str]:
        return list(self._data["recent_files"])

    def add_recent_file(self, path: str):
        files = [p for p in self._data["recent_files"] if p != path]
        files.insert(0, path)
        self._data["recent_files"] = files[: self.MAX_RECENT]
        self.save()

    def remove_recent_file(self, path: str):
        self._data["recent_files"] = [
            p for p in self._data["recent_files"] if p != path
        ]
        self.save()

    # ---- typed settings ----

    def get(self, key: str, default=None):
        return self._data["settings"].get(key, default)

    def set(self, key: str, value):
        self._data["settings"][key] = value
        self.save()

    # ---- layout blobs (hex-encoded bytes from Qt saveState/geometry) ----

    def get_layout(self, name: str) -> bytes | None:
        blob = self._data["layout"].get(name)
        return bytes.fromhex(blob) if blob else None

    def set_layout(self, name: str, blob: bytes):
        self._data["layout"][name] = bytes(blob).hex()
        self.save()


# ---------------------------------------------------------------------------
# Lens-editor field specs (per-surface-type editable columns)
# ---------------------------------------------------------------------------

#: extra editable parameters per surface type beyond the standard columns
#: (reference: lens_editor.py surface-type delegates)
SURFACE_TYPE_FIELDS: dict[str, tuple[str, ...]] = {
    "standard": (),
    "plane": (),
    "even_asphere": ("coefficients",),
    "odd_asphere": ("coefficients",),
    "polynomial": ("coefficients",),
    "chebyshev": ("coefficients", "norm_x", "norm_y"),
    "zernike": ("coefficients", "norm_radius"),
    "biconic": ("radius_y", "conic_y"),
    "toroidal": ("radius_y", "coefficients"),
    "paraxial": ("focal_length",),
    "grating": ("grating_period", "grating_order",
                "groove_orientation_angle"),
    "forbes_qbfs": ("radial_terms", "norm_radius"),
    "forbes_q2d": ("freeform_coeffs", "norm_radius"),
    "nurbs": (),
    "grid_sag": (),
}


def surface_editor_spec(surface_type: str) -> dict:
    """Editable-field spec for one surface type: the standard spreadsheet
    columns plus the type's extra parameters."""
    return {
        "standard_columns": (
            "type", "comment", "radius", "thickness", "material",
            "conic", "semi-aperture",
        ),
        "extra_fields": SURFACE_TYPE_FIELDS.get(surface_type, ()),
        "material_choices": ("air", "mirror", "N-BK7", "N-SF11", "F2",
                             "N-SK16", "SF5", "N-LAK22"),
    }


__all__ = [
    "AnalysisRecord",
    "AnalysisSession",
    "OptimizationProgress",
    "OptimizationWorker",
    "SURFACE_TYPE_FIELDS",
    "SessionStore",
    "SettingField",
    "analysis_settings_schema",
    "coerce_setting",
    "surface_editor_spec",
]
