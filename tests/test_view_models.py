"""Headless panel view-model tests (no Qt): lens-editor spreadsheet model,
tabbed analysis panel, paged system properties.

(reference feature sets: optiland_gui/lens_editor.py,
analysis_panel.py:1-1664, system_properties_panel.py)
"""

from __future__ import annotations

import numpy as np
import pytest

from optiland_tpu.services import OptilandConnector
from optiland_tpu.services.view_models import (
    AnalysisPanelModel,
    LensEditorModel,
    SystemPropertiesModel,
)


@pytest.fixture()
def conn():
    from optiland_tpu.samples import CookeTriplet

    return OptilandConnector(CookeTriplet())


@pytest.fixture()
def lde(conn):
    return LensEditorModel(conn)


class TestLensEditorModel:
    def test_shape_and_labels(self, lde):
        n = lde.row_count()
        assert n == 8  # OBJ + 6 + IMG
        assert lde.row_label(0) == "OBJ"
        assert lde.row_label(n - 1) == "IMG"
        stop = lde.stop_row()
        assert lde.row_label(stop).startswith("STO")
        assert lde.column_headers()[:7] == [
            "Type", "Comment", "Radius", "Thickness", "Material",
            "Conic", "Semi-Diameter",
        ]

    def test_cell_specs(self, lde):
        assert lde.cell_spec(1, 0).kind == "choice"
        assert "even_asphere" in lde.cell_spec(1, 0).choices
        assert lde.cell_spec(1, 2).kind == "float"
        assert lde.cell_spec(1, 4).kind == "choice"
        assert not lde.cell_spec(0, 0).editable  # object surface type
        assert not lde.cell_spec(lde.row_count() - 1, 0).editable

    def test_edit_radius_traces(self, lde, conn):
        r0 = lde.get_cell(1, 2)
        assert lde.set_cell(1, 2, r0 * 1.01)
        assert lde.get_cell(1, 2) == pytest.approx(r0 * 1.01)
        # the edited system still traces
        res = conn.get_optic().trace(Hy=0.0, wavelength=0.55, num_rays=4)
        assert np.isfinite(np.asarray(res.y)).all()
        # and undo restores it
        conn.undo()
        lde2 = LensEditorModel(conn)
        assert lde2.get_cell(1, 2) == pytest.approx(r0)

    def test_dynamic_columns_for_asphere(self, lde, conn):
        assert lde.extra_columns() == []
        lde.set_cell(1, 0, "even_asphere")
        assert "A4" in lde.column_headers()
        col = lde.column_headers().index("A6")
        assert lde.cell_spec(1, col).editable
        assert not lde.cell_spec(2, col).editable  # standard row: readonly
        assert lde.set_cell(1, col, -2.5e-7)
        assert lde.get_cell(1, col) == pytest.approx(-2.5e-7)
        # the coefficient landed in the optic itself
        coeffs = conn.surfaces.get_type_params(1)["coefficients"]
        assert coeffs[1] == pytest.approx(-2.5e-7)

    def test_move_row_swaps_surfaces(self, lde, conn):
        r1 = lde.get_cell(1, 2)
        r2 = lde.get_cell(2, 2)
        lde.move_row(1, +1)
        assert lde.get_cell(1, 2) == pytest.approx(r2)
        assert lde.get_cell(2, 2) == pytest.approx(r1)
        with pytest.raises(ValueError):
            lde.move_row(0, +1)
        with pytest.raises(ValueError):
            lde.move_row(lde.row_count() - 2, +1)

    def test_copy_paste_roundtrip(self, lde):
        tsv = lde.copy_rows([1, 2])
        lines = tsv.splitlines()
        assert lines[0].startswith("Type\tComment\tRadius")
        assert len(lines) == 3
        # perturb then paste back restores the numbers
        r1 = lde.get_cell(1, 2)
        lde.set_cell(1, 2, 99.0)
        written = lde.paste_block(1, 0, tsv)
        assert written > 0
        assert lde.get_cell(1, 2) == pytest.approx(r1)

    def test_paste_skips_readonly_and_junk(self, lde):
        # a paste with junk text and a readonly target must not raise
        n0 = lde.row_count()
        wrote = lde.paste_block(0, 0, "plane\tnot-a-number\tabc")
        assert lde.row_count() == n0
        assert wrote == 0 or lde.get_cell(0, 1) is not None

    def test_insert_remove(self, lde):
        n0 = lde.row_count()
        lde.insert_row(2)
        assert lde.row_count() == n0 + 1
        lde.remove_row(2)
        assert lde.row_count() == n0
        with pytest.raises(ValueError):
            lde.remove_row(0)


class TestAnalysisPanelModel:
    def test_run_creates_tab(self, conn):
        panel = AnalysisPanelModel(conn)
        assert "SpotDiagram" in panel.available()
        tab = panel.run("SpotDiagram", num_rings=3)
        assert panel.tabs and panel.active == 0
        assert "SpotDiagram" in tab.title
        assert tab.record.error is None

    def test_settings_schema(self, conn):
        panel = AnalysisPanelModel(conn)
        fields = panel.settings_schema("RayFan")
        names = {f.name for f in fields}
        assert "num_points" in names

    def test_rerun_reflects_current_system(self, conn):
        panel = AnalysisPanelModel(conn)
        panel.run("RayFan", num_points=9)
        y0 = np.asarray(
            panel.tabs[0].record.result.data["(0.0, 0.0)"]["0.48"]["y"]
        )
        conn.surfaces.set_surface_data(1, 2, 23.0)  # change a radius
        panel.rerun(0)
        y1 = np.asarray(
            panel.tabs[0].record.result.data["(0.0, 0.0)"]["0.48"]["y"]
        )
        assert not np.allclose(y0, y1)

    def test_close_tab(self, conn):
        panel = AnalysisPanelModel(conn)
        panel.run("RayFan", num_points=9)
        panel.run("SpotDiagram", num_rings=3)
        assert len(panel.tabs) == 2 and panel.active == 1
        panel.close_tab(1)
        assert len(panel.tabs) == 1 and panel.active == 0
        panel.close_tab(0)
        assert panel.tabs == [] and panel.active is None

    def test_export_png_and_csv(self, conn, tmp_path):
        import matplotlib

        matplotlib.use("Agg")
        panel = AnalysisPanelModel(conn)
        panel.run("RayFan", num_points=9)
        png = panel.export_png(0, str(tmp_path / "fan.png"))
        assert (tmp_path / "fan.png").stat().st_size > 1000
        csv = panel.export_csv(0, str(tmp_path / "fan.csv"))
        text = (tmp_path / "fan.csv").read_text()
        assert "Px" in text.splitlines()[0]
        assert len(text.splitlines()) > 5
        assert png.endswith(".png") and csv.endswith(".csv")


class TestSystemPropertiesModel:
    def test_load_pages(self, conn):
        m = SystemPropertiesModel(conn)
        assert m.staged["aperture"]["type"] == "EPD"
        assert m.staged["aperture"]["value"] == pytest.approx(10.0)
        assert m.staged["fields"]["type"] == "angle"
        assert len(m.staged["fields"]["points"]) == 3
        assert len(m.staged["wavelengths"]) == 3
        assert m.staged["polarization"] == "ignore"

    def test_apply_aperture_and_wavelengths(self, conn):
        m = SystemPropertiesModel(conn)
        m.set_aperture("EPD", 12.5)
        m.add_wavelength(0.65)
        m.set_primary_wavelength(3)
        m.apply()
        o = conn.get_optic()
        assert o.aperture.value == pytest.approx(12.5)
        assert len(o.wavelengths.wavelengths) == 4
        assert o.primary_wavelength == pytest.approx(0.65)
        # single undo step reverts the whole page apply
        conn.undo()
        o = conn.get_optic()
        assert o.aperture.value == pytest.approx(10.0)
        assert len(o.wavelengths.wavelengths) == 3

    def test_field_edits(self, conn):
        m = SystemPropertiesModel(conn)
        m.add_field(y=25.0)
        m.remove_field(0)
        m.apply()
        o = conn.get_optic()
        ys = [f.y for f in o.fields.fields]
        assert 25.0 in ys and 0.0 not in ys

    def test_dirty_and_revert(self, conn):
        m = SystemPropertiesModel(conn)
        assert not m.dirty()
        m.set_aperture("EPD", 11.0)
        assert m.dirty()
        m.revert()
        assert not m.dirty()

    def test_notes_roundtrip(self, conn):
        m = SystemPropertiesModel(conn)
        m.set_notes("test prescription")
        m.apply()
        m2 = SystemPropertiesModel(conn)
        assert m2.staged["notes"] == "test prescription"


class TestLensEditorEdgeCases:
    def test_remove_object_and_image_protected(self, lde):
        with pytest.raises(ValueError):
            lde.remove_row(0)
        with pytest.raises(ValueError):
            lde.remove_row(lde.row_count() - 1)

    def test_set_cell_readonly_returns_false(self, lde):
        assert not lde.set_cell(0, 0, "even_asphere")  # OBJ type frozen
        col = len(lde.column_headers()) - 1 if lde.extra_columns() else 5
        # conic on image surface is still a float cell; type is frozen
        assert not lde.set_cell(lde.row_count() - 1, 0, "standard")

    def test_stop_reassignment_updates_labels(self, lde):
        old = lde.stop_row()
        new = old + 1 if old + 1 < lde.row_count() - 1 else old - 1
        lde.set_stop(new)
        assert lde.stop_row() == new
        assert lde.row_label(new).startswith("STO")
        assert not lde.row_label(old).startswith("STO")

    def test_paste_with_header_row_tolerated(self, lde):
        tsv = lde.copy_rows([2])
        r2 = lde.get_cell(2, 2)
        lde.set_cell(2, 2, 55.5)
        assert lde.paste_block(2, 0, tsv) > 0
        assert lde.get_cell(2, 2) == pytest.approx(r2)

    def test_copy_includes_extra_columns(self, lde):
        lde.set_cell(1, 0, "even_asphere")
        col = lde.column_headers().index("A4")
        lde.set_cell(1, col, 3.25e-6)
        tsv = lde.copy_rows([1])
        assert "3.25e-06" in tsv

    def test_biconic_and_grating_extras(self, conn):
        from optiland_tpu.services.view_models import LensEditorModel

        m = LensEditorModel(conn)
        m.set_cell(2, 0, "biconic")
        ry_col = m.column_headers().index("Ry")
        assert m.set_cell(2, ry_col, -77.0)
        assert m.get_cell(2, ry_col) == pytest.approx(-77.0)
        m.set_cell(3, 0, "grating")
        per_col = m.column_headers().index("Period")
        assert m.set_cell(3, per_col, 8.0)
        assert m.get_cell(3, per_col) == pytest.approx(8.0)


class TestAnalysisPanelEdgeCases:
    def test_failed_run_records_error(self, conn):
        panel = AnalysisPanelModel(conn)
        tab = panel.run("RayFan", num_points=9, bogus_kwarg=1)
        assert tab.record.error is not None

    def test_export_csv_without_data_raises(self, conn, tmp_path):
        import matplotlib

        matplotlib.use("Agg")
        panel = AnalysisPanelModel(conn)
        panel.run("YYbar")
        rec = panel.tabs[0].record
        if getattr(rec.result, "data", None) is not None:
            pytest.skip("YYbar grew a data attribute")
        with pytest.raises(ValueError, match="no exportable data"):
            panel.export_csv(0, str(tmp_path / "x.csv"))

    def test_history_bounded(self, conn):
        panel = AnalysisPanelModel(conn, limit=3)
        for _ in range(5):
            panel.run("RayFan", num_points=9)
        assert len(panel.session.history) <= 3


class TestSystemPropertiesEdgeCases:
    def test_apply_without_primary_promotes_first(self, conn):
        m = SystemPropertiesModel(conn)
        for i in range(len(m.staged["wavelengths"])):
            m.staged["wavelengths"][i]["primary"] = False
        m.apply()
        o = conn.get_optic()
        assert o.wavelengths.wavelengths[0].is_primary

    def test_polarization_roundtrip(self, conn):
        m = SystemPropertiesModel(conn)
        m.set_polarization("H")
        m.apply()
        m2 = SystemPropertiesModel(conn)
        assert m2.staged["polarization"] == "H"
        m2.set_polarization("ignore")
        m2.apply()
        assert SystemPropertiesModel(conn).staged["polarization"] == "ignore"

    def test_field_vignetting_staged(self, conn):
        m = SystemPropertiesModel(conn)
        m.staged["fields"]["points"][1]["vy"] = 0.3
        m.apply()
        o = conn.get_optic()
        assert o.fields.fields[1].vy == pytest.approx(0.3)


class TestViewerPanelModel:
    def test_draw_2d_and_3d(self, conn, tmp_path):
        import matplotlib

        matplotlib.use("Agg")
        from matplotlib.figure import Figure

        from optiland_tpu.services.view_models import ViewerPanelModel

        m = ViewerPanelModel(conn)
        fig = Figure()
        m.draw_2d(fig.add_subplot(111))
        fig2 = Figure()
        m.draw_3d(fig2.add_subplot(111, projection="3d"))
        png = m.export_png(str(tmp_path / "layout.png"))
        assert (tmp_path / "layout.png").stat().st_size > 1000

    def test_pick_2d_finds_surfaces(self, conn):
        from optiland_tpu.services.view_models import ViewerPanelModel

        m = ViewerPanelModel(conn)
        # Cooke surface 1 sits at z=0 (vertex); click right next to it
        idx = m.pick_2d(0.05, 2.0)
        assert idx == 1
        info = m.picked_info()
        assert info["index"] == 1 and info["material"] == "SK16"
        # far away from any surface -> None
        assert m.pick_2d(500.0, 0.0) is None
        assert m.picked_info() is None

    def test_pick_2d_resolves_overlap_by_sag(self, conn):
        from optiland_tpu.services.view_models import ViewerPanelModel

        m = ViewerPanelModel(conn)
        # image plane of the Cooke (z ~ 60.15): the nearest surface there
        # must be the last one
        n = conn.get_optic().surfaces.num_surfaces
        from optiland_tpu.core.system import positions

        z_img = float(
            positions(conn.get_optic().system.stack)[n - 1]
        )
        assert m.pick_2d(z_img, 0.5) == n - 1

    def test_interactive_export(self, conn, tmp_path):
        from optiland_tpu.services.view_models import ViewerPanelModel

        m = ViewerPanelModel(conn)
        m.set_num_rays(6)
        path = m.export_interactive_html(str(tmp_path / "sys3d.html"))
        text = (tmp_path / "sys3d.html").read_text()
        assert "webgl" in text and "SCENE" in text

    def test_settings_validation(self, conn):
        from optiland_tpu.services.view_models import ViewerPanelModel

        m = ViewerPanelModel(conn)
        m.set_distribution("random")
        assert m.settings["distribution"] == "random"
        with pytest.raises(ValueError):
            m.set_distribution("spiral")
        m.set_num_rays(0)
        assert m.settings["num_rays"] == 1


class TestOptimizationPanelModel:
    def _model(self, conn):
        from optiland_tpu.services.view_models import OptimizationPanelModel

        return OptimizationPanelModel(conn)

    def test_schemas(self, conn):
        m = self._model(conn)
        assert "rms_spot_size" in m.operand_types()
        assert "f2" in m.operand_types()
        assert "radius" in m.variable_types()
        keys = m.operand_input_keys("rms_spot_size")
        assert "Hx" in keys and "wavelength" in keys

    def test_row_validation(self, conn):
        m = self._model(conn)
        with pytest.raises(ValueError, match="unknown operand"):
            m.add_operand("not_an_operand", target=0.0)
        with pytest.raises(ValueError, match="does not accept"):
            m.add_operand("f2", target=50.0, bogus=1)
        with pytest.raises(ValueError, match="target or min/max"):
            m.add_operand("f2")
        with pytest.raises(ValueError, match="unknown variable"):
            m.add_variable("not_a_var", surface_number=1)

    def test_build_and_merit(self, conn):
        m = self._model(conn)
        m.add_operand("f2", target=50.0, weight=1.0)
        m.add_operand("rms_spot_size", target=0.0, weight=1.0,
                      Hx=0.0, Hy=0.0, num_rays=5, wavelength=0.55,
                      distribution="hexapolar")
        m.add_variable("radius", surface_number=1)
        p = m.build()
        merit0 = m.current_merit()
        assert np.isfinite(merit0) and merit0 >= 0
        assert "f2" in m.operand_info_text()
        assert "radius" in m.variable_info_text()
        assert m.merit_info_text()

    def test_save_load_roundtrip(self, conn, tmp_path):
        m = self._model(conn)
        m.add_operand("f2", target=50.0)
        m.add_variable("radius", surface_number=2)
        path = m.save(str(tmp_path / "merit.json"))
        m2 = self._model(conn)
        m2.load(path)
        assert m2.operands == m.operands
        assert m2.variables == m.variables
        m2.remove_operand(0)
        m2.remove_variable(0)
        assert m2.operands == [] and m2.variables == []

    def test_async_run_with_history(self, conn):
        m = self._model(conn)
        # perturb so there is something to optimize
        conn.surfaces.set_surface_data(1, 2, 24.0)
        m.add_operand("f2", target=50.0, weight=1.0)
        m.add_variable("radius", surface_number=1)
        ticks = []
        w = m.run_async("generic", on_progress=ticks.append,
                        maxiter=10, disp=False)
        w.join(timeout=120)
        assert not w.running
        assert len(m.merit_history) >= 1
        assert m.current_merit() <= m.merit_history[0] + 1e-9
