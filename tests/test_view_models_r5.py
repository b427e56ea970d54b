"""Round-5 view-model tests (no Qt): sag viewer tab, 2-D navigation
state, command palette, embedded terminal, toast queue.

(reference feature sets: optiland_gui/viewer_panel.py:57-242 SagViewer +
:460-567 mouse navigation, widgets/python_terminal.py, command palette)
"""

from __future__ import annotations

import numpy as np
import pytest

from optiland_tpu.services import OptilandConnector
from optiland_tpu.services.view_models import (
    CommandPaletteModel,
    SagViewerModel,
    TerminalModel,
    ToastModel,
    ViewNavModel,
)


@pytest.fixture()
def conn():
    from optiland_tpu.samples import CookeTriplet

    return OptilandConnector(CookeTriplet())


class TestSagViewerModel:
    def test_surface_labels_exclude_object_image(self, conn):
        m = SagViewerModel(conn)
        labels = m.surface_labels()
        assert len(labels) == 6  # Cooke: 6 optical surfaces
        assert labels[0].startswith("S1")

    def test_set_surface_clamps(self, conn):
        m = SagViewerModel(conn)
        m.set_surface(99)
        assert m.surface_index == m.surface_range()[1]
        m.set_surface(-3)
        assert m.surface_index == 1

    def test_profiles_match_direct_sag(self, conn):
        m = SagViewerModel(conn)
        m.set_surface(1)
        r, zx, zy = m.profiles()
        assert len(r) == len(zx) == len(zy) == m.num_points
        # S1 is spherical R=22.01: sag at r is r^2/(R(1+sqrt(1-r^2/R^2)))
        R = 22.01359
        k = int(np.argmin(np.abs(r - 3.0)))
        rr = r[k]
        expect = rr**2 / (R * (1 + np.sqrt(1 - rr**2 / R**2)))
        np.testing.assert_allclose(zx[k], expect, rtol=1e-6)
        # rotationally symmetric: both cuts identical
        np.testing.assert_allclose(zx, zy, atol=1e-12)

    def test_sag_map_shape_and_center(self, conn):
        m = SagViewerModel(conn)
        X, Y, Z = m.sag_map(n=21)
        assert X.shape == Y.shape == Z.shape == (21, 21)
        np.testing.assert_allclose(Z[10, 10], 0.0, atol=1e-9)

    def test_cursor_readout_format(self, conn):
        m = SagViewerModel(conn)
        txt = m.cursor_readout(1.0, -2.0)
        assert "x=+1.000" in txt and "y=-2.000" in txt and "sag=" in txt

    def test_export_csv(self, conn, tmp_path):
        m = SagViewerModel(conn)
        p = m.export_csv(str(tmp_path / "sag.csv"))
        rows = np.loadtxt(p, delimiter=",", skiprows=1)
        assert rows.shape == (m.num_points, 3)


class TestViewNavModel:
    def test_zoom_keeps_anchor_fixed(self):
        nav = ViewNavModel()
        nav.set_home((0.0, 100.0), (-20.0, 20.0))
        x, y = 25.0, 5.0
        (x0, x1), (y0, y1) = nav.zoom_at(0.5, x, y)
        # anchor's relative position is preserved
        assert (x - x0) / (x1 - x0) == pytest.approx(0.25)
        assert (y - y0) / (y1 - y0) == pytest.approx(0.625)
        assert x1 - x0 == pytest.approx(50.0)
        assert nav.is_zoomed

    def test_drag_pan_translates(self):
        nav = ViewNavModel()
        nav.set_home((0.0, 10.0), (0.0, 10.0))
        nav.begin_drag(5.0, 5.0)
        (x0, x1), (y0, y1) = nav.drag_to(3.0, 4.0)
        assert (x0, x1) == (2.0, 12.0)
        assert (y0, y1) == (1.0, 11.0)
        nav.end_drag()
        # drag after release is a no-op
        assert nav.drag_to(0.0, 0.0) == ((2.0, 12.0), (1.0, 11.0))

    def test_reset_restores_home(self):
        nav = ViewNavModel()
        nav.set_home((0.0, 10.0), (0.0, 10.0))
        nav.zoom_at(0.25, 5.0, 5.0)
        xlim, ylim = nav.reset()
        assert xlim == (0.0, 10.0) and ylim == (0.0, 10.0)
        assert not nav.is_zoomed


class TestCommandPaletteModel:
    def _palette(self):
        pal = CommandPaletteModel()
        self.hits = []
        pal.register("New system", lambda: self.hits.append("new"),
                     shortcut="Ctrl+N", category="File")
        pal.register("Open lens file", lambda: self.hits.append("open"),
                     category="File")
        pal.register("Run optimization", lambda: self.hits.append("opt"),
                     category="Optimize")
        pal.register("Boom", lambda: 1 / 0, category="Debug")
        return pal

    def test_empty_query_returns_all(self):
        pal = self._palette()
        assert len(pal.filter("")) == 4

    def test_subsequence_match_and_ranking(self):
        pal = self._palette()
        got = [c.label for c in pal.filter("open")]
        assert got and got[0] == "Open lens file"
        assert pal.filter("zzz") == []

    def test_word_start_bonus(self):
        pal = self._palette()
        got = [c.label for c in pal.filter("ro")]
        assert got[0] == "Run optimization"

    def test_execute_captures_errors(self):
        pal = self._palette()
        ok = pal.execute(pal.filter("new")[0])
        assert ok is None and self.hits == ["new"]
        err = pal.execute(pal.filter("boom")[0])
        assert err is not None and "ZeroDivisionError" in err


class TestTerminalModel:
    def test_expression_reprs(self, conn):
        t = TerminalModel(conn)
        assert t.run("1 + 1").strip() == "2"

    def test_statements_and_namespace_persistence(self, conn):
        t = TerminalModel(conn)
        assert t.run("a = 21") == ""
        assert t.run("a * 2").strip() == "42"

    def test_live_optic_access(self, conn):
        t = TerminalModel(conn)
        out = t.run("float(optic.paraxial.f2())")
        assert abs(float(out) - 50.0) < 0.1

    def test_error_shows_traceback_tail_not_crash(self, conn):
        t = TerminalModel(conn)
        out = t.run("1 / 0")
        assert "ZeroDivisionError" in out

    def test_history_recall(self, conn):
        t = TerminalModel(conn)
        t.run("1")
        t.run("2")
        assert t.recall(-1) == "2"
        assert t.recall(-1) == "1"
        assert t.recall(+1) == "2"
        assert t.recall(+1) == ""


class TestLensEditorProperties:
    """Per-surface properties form + variable-request mapping
    (reference: lens_editor.py:38-117 SurfacePropertiesWidget,
    :332-348 add-variable)."""

    @pytest.fixture()
    def asph(self):
        from optiland_tpu.optic import Optic
        from optiland_tpu.services import OptilandConnector
        from optiland_tpu.services.view_models import LensEditorModel

        o = Optic()
        o.surfaces.add(index=0, radius=np.inf, thickness=np.inf)
        o.surfaces.add(index=1, surface_type="even_asphere", radius=30.0,
                       thickness=5.0, material="N-BK7", is_stop=True,
                       coefficients=[1e-5, -2e-7])
        o.surfaces.add(index=2, radius=-100.0, thickness=40.0)
        o.surfaces.add(index=3)
        o.set_aperture("EPD", 10.0)
        o.fields.set_type("angle")
        o.fields.add(y=0)
        o.wavelengths.add(0.55, is_primary=True)
        return LensEditorModel(OptilandConnector(o))

    def test_form_lists_coefficients(self, asph):
        fields = asph.properties_form(1)
        keys = [k for k, _, _ in fields]
        assert "coefficients" in keys
        (k, kind, val) = [f for f in fields if f[0] == "coefficients"][0]
        assert kind == "floats"
        assert "1e-05" in val or "1e-05" in val.replace(" ", "")

    def test_standard_surface_has_empty_form(self, asph):
        assert asph.properties_form(2) == []

    def test_apply_parses_float_list(self, asph):
        err = asph.apply_properties(1, {"coefficients": "2e-5, -3e-7"})
        assert err is None
        fields = dict(
            (k, v) for k, _, v in asph.properties_form(1)
        )
        assert "2e-05" in fields["coefficients"]

    def test_apply_reports_bad_input(self, asph):
        err = asph.apply_properties(1, {"coefficients": "not a number"})
        assert err is not None and "invalid" in err

    def test_variable_kwargs_maps_columns(self, asph):
        headers = asph.column_headers()
        r_col = headers.index("Radius")
        vt, kw = asph.variable_kwargs(1, r_col)
        assert vt == "radius" and kw["surface_number"] == 1
        # object/image rows and non-variable columns return None
        assert asph.variable_kwargs(0, r_col) is None
        assert asph.variable_kwargs(1, headers.index("Comment")) is None


class TestAnalysisPanelPages:
    """Round-5 page management + settings persistence (reference:
    analysis_panel.py:915-971 clone/remove, :1050-1103 settings)."""

    @pytest.fixture()
    def panel(self, conn):
        from optiland_tpu.services.view_models import AnalysisPanelModel

        return AnalysisPanelModel(conn)

    def test_clone_tab_reruns_same_settings(self, panel):
        panel.run("SpotDiagram", num_rings=3)
        tab2 = panel.clone_tab(0)
        assert len(panel.tabs) == 2
        assert tab2.name == "SpotDiagram"
        assert tab2.record.kwargs == {"num_rings": 3}
        assert tab2.record.error is None

    def test_run_remembers_and_recalls_settings(self, panel):
        panel.run("SpotDiagram", num_rings=4)
        assert panel.recall_settings("SpotDiagram") == {"num_rings": 4}
        assert panel.recall_settings("RayFan") == {}

    def test_settings_roundtrip_json(self, panel, tmp_path):
        panel.remember_settings("SpotDiagram", {"num_rings": 5})
        panel.remember_settings("RayFan", {"num_points": 11})
        p = panel.save_settings(str(tmp_path / "s.json"))
        fresh_settings = panel.load_settings(p)
        assert fresh_settings["SpotDiagram"] == {"num_rings": 5}
        assert fresh_settings["RayFan"] == {"num_points": 11}

    def test_cursor_readout(self, panel):
        assert panel.cursor_readout(None, 1.0) == ""
        txt = panel.cursor_readout(0.25, -3.0)
        assert "x=+0.25" in txt and "y=-3" in txt


class TestToastModel:
    def test_push_drain_and_limit(self):
        toasts = ToastModel(limit=3)
        for i in range(5):
            toasts.push(f"m{i}", "success")
        got = toasts.drain()
        assert [m for m, _ in got] == ["m2", "m3", "m4"]
        assert toasts.drain() == []

    def test_unknown_level_maps_to_info(self):
        toasts = ToastModel()
        toasts.push("x", "bogus")
        assert toasts.drain() == [("x", "info")]
