"""GUI tests (reference: tests/gui/conftest.py:10-50, test_*_service.py).

PySide6 is optional in this environment: the compile/structure tests always
run; widget smoke tests run offscreen only when PySide6 is importable
(matching the reference CI's QT_QPA_PLATFORM=offscreen approach).
"""

import importlib.util
import os
import pathlib
import py_compile

import pytest

GUI_DIR = pathlib.Path(__file__).resolve().parents[1] / "optiland_tpu_gui"
GUI_MODULES = sorted(
    p for p in GUI_DIR.rglob("*.py") if "__pycache__" not in p.parts
)

HAS_QT = importlib.util.find_spec("PySide6") is not None
qt_only = pytest.mark.skipif(not HAS_QT, reason="PySide6 not installed")


@pytest.mark.parametrize("path", GUI_MODULES, ids=lambda p: p.stem)
def test_gui_module_compiles(path):
    """Every GUI module must be valid Python even without Qt installed."""
    py_compile.compile(str(path), doraise=True)


def test_gui_package_imports_without_qt():
    import optiland_tpu_gui

    assert hasattr(optiland_tpu_gui, "main")
    assert isinstance(optiland_tpu_gui.HAS_QT, bool)


def test_registry_categories_cover_services_registry():
    """Category map names must exist in the services analysis registry."""
    from optiland_tpu.services import OptilandConnector
    from optiland_tpu_gui.registry import CATEGORIES

    reg = OptilandConnector().analysis.get_analysis_registry()
    for cat, names in CATEGORIES.items():
        present = [n for n in names if n in reg]
        assert present, f"category {cat} matches nothing in the registry"


def test_qt_shim_error_message_without_qt():
    if HAS_QT:
        pytest.skip("PySide6 present; shim passthrough covered by smoke tests")
    from optiland_tpu_gui import qt

    assert not qt.HAS_QT
    with pytest.raises(ImportError, match="PySide6"):
        qt.QApplication  # noqa: B018


# ---------------------------------------------------------------------------
# Offscreen widget smoke tests (skipped without PySide6)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="session")
def qapp():
    if not HAS_QT:
        pytest.skip("PySide6 not installed")
    os.environ.setdefault("QT_QPA_PLATFORM", "offscreen")
    from optiland_tpu_gui.qt import QApplication

    app = QApplication.instance() or QApplication([])
    yield app


@qt_only
def test_main_window_smoke(qapp):
    from optiland_tpu_gui.main_window import MainWindow

    win = MainWindow()
    assert win.connector.get_optic() is not None
    assert win.lens_editor.table.rowCount() >= 3
    win.close()


@qt_only
def test_lens_editor_edit_roundtrip(qapp):
    from optiland_tpu_gui.main_window import MainWindow

    win = MainWindow()
    svc = win.connector.surfaces
    svc.set_surface_data(1, 2, 123.0)  # Radius column
    assert svc.get_surface_data(1, 2) == pytest.approx(123.0)
    win.connector.undo()
    assert svc.get_surface_data(1, 2) != pytest.approx(123.0)
    win.close()


@qt_only
def test_analysis_panel_runs_spot_diagram(qapp):
    from optiland_tpu.samples import CookeTriplet
    from optiland_tpu_gui.main_window import MainWindow

    win = MainWindow(CookeTriplet())
    result = win.analysis_panel.run_current("SpotDiagram")
    assert result is not None
    win.close()


@qt_only
def test_lens_editor_dynamic_columns_and_clipboard(qapp):
    """Changing a surface type to even_asphere adds its coefficient
    columns; copy then paste restores an edited radius (reference:
    lens_editor.py per-type delegates + clipboard UX)."""
    from optiland_tpu.samples import CookeTriplet
    from optiland_tpu_gui.main_window import MainWindow
    from optiland_tpu_gui.qt import QApplication

    win = MainWindow(CookeTriplet())
    ed = win.lens_editor
    m = ed.model
    tsv = m.copy_rows([1])
    QApplication.clipboard().setText(tsv)
    r0 = m.get_cell(1, 2)
    m.set_cell(1, 2, 77.0)
    ed.table.setCurrentCell(1, 0)
    ed._paste()
    assert m.get_cell(1, 2) == pytest.approx(r0)
    m.set_cell(1, 0, "even_asphere")
    ed.rebuild()
    headers = [ed.table.horizontalHeaderItem(i).text()
               for i in range(ed.table.columnCount())]
    assert "A4" in headers
    win.close()


@qt_only
def test_analysis_panel_export_and_rerun(qapp, tmp_path):
    from optiland_tpu.samples import CookeTriplet
    from optiland_tpu_gui.main_window import MainWindow

    win = MainWindow(CookeTriplet())
    panel = win.analysis_panel
    panel.run_current("RayFan", num_points=9)
    assert panel.tabs.count() == 1
    png = tmp_path / "fan.png"
    panel.model.export_png(0, str(png))
    assert png.stat().st_size > 1000
    win.connector.surfaces.set_surface_data(1, 2, 23.0)
    panel.rerun_current_tab()
    assert panel.tabs.count() == 1
    win.close()


@qt_only
def test_system_properties_staged_apply(qapp):
    from optiland_tpu.samples import CookeTriplet
    from optiland_tpu_gui.main_window import MainWindow

    win = MainWindow(CookeTriplet())
    panel = win.properties_panel
    panel.model.set_aperture("EPD", 12.0)
    panel.apply()
    assert win.connector.get_optic().aperture.value == pytest.approx(12.0)
    win.connector.undo()
    assert win.connector.get_optic().aperture.value == pytest.approx(10.0)
    win.close()
