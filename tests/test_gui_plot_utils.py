"""GUI plot/interaction helpers — headless coverage of the math the Qt
widgets call (reference behaviors: optiland_gui/gui_plot_utils.py,
widgets/frameless_window.py, widgets/custom_title_bar.py)."""

import matplotlib as mpl
import numpy as np
import pytest

from optiland_tpu_gui.plot_utils import (
    analysis_parameters,
    apply_plot_theme,
    cursor_for_area,
    pan_limits,
    resize_hit_area,
    resized_geometry,
    zoom_limits,
)
from optiland_tpu_gui.widgets.chrome import maximize_glyph, title_text


class TestPlotTheme:
    def test_apply_sets_rcparams(self):
        style = apply_plot_theme("dark")
        assert mpl.rcParams["figure.facecolor"] == style["figure.facecolor"]
        light = apply_plot_theme("light")
        assert mpl.rcParams["axes.facecolor"] == light["axes.facecolor"]

    def test_unknown_theme_falls_back_to_light(self):
        assert apply_plot_theme("nope") == apply_plot_theme("light")


class TestAnalysisParameters:
    def test_schema_from_signature(self):
        from optiland_tpu.analysis import RmsSpotSizeVsField

        params = analysis_parameters(RmsSpotSizeVsField)
        assert params["num_fields"]["default"] == 64
        assert params["num_fields"]["kind"] == "int"
        assert params["distribution"]["kind"] == "str"
        # optic/wavelengths are GUI-provided, never form fields
        assert "optic" not in params and "wavelengths" not in params

    def test_handles_classes_without_signature(self):
        assert analysis_parameters(int) == {} or isinstance(
            analysis_parameters(int), dict
        )


class TestZoomPan:
    def test_zoom_in_keeps_cursor_point_fixed(self):
        (x0, x1), (y0, y1) = zoom_limits(
            (0.0, 10.0), (0.0, 10.0), xdata=2.0, ydata=8.0, direction="up"
        )
        # cursor stays at the same relative position
        assert x0 < 2.0 < x1 and y0 < 8.0 < y1
        assert (x1 - x0) == pytest.approx(10 / 1.2)
        assert (2.0 - x0) / (x1 - x0) == pytest.approx(0.2)
        assert (8.0 - y0) / (y1 - y0) == pytest.approx(0.8)

    def test_zoom_out_grows_view(self):
        (x0, x1), _ = zoom_limits(
            (0.0, 10.0), (0.0, 10.0), 5.0, 5.0, direction="down"
        )
        assert (x1 - x0) == pytest.approx(12.0)

    def test_zoom_round_trip(self):
        lims = ((0.0, 10.0), (-3.0, 3.0))
        zin = zoom_limits(*lims, 4.0, 1.0, "up")
        zout = zoom_limits(*zin, 4.0, 1.0, "down")
        np.testing.assert_allclose(np.ravel(zout), np.ravel(lims), atol=1e-12)

    def test_pan_shifts_by_fraction(self):
        (x0, x1), (y0, y1) = pan_limits((0.0, 10.0), (0.0, 4.0), 0.5, -0.25)
        assert (x0, x1) == (5.0, 15.0)
        assert (y0, y1) == (-1.0, 3.0)


class TestResizeGeometry:
    @pytest.mark.parametrize("pt,area", [
        ((3, 3), "top-left"), ((797, 3), "top-right"),
        ((3, 597), "bottom-left"), ((797, 597), "bottom-right"),
        ((400, 2), "top"), ((400, 598), "bottom"),
        ((2, 300), "left"), ((798, 300), "right"),
        ((400, 300), None),
    ])
    def test_hit_areas(self, pt, area):
        assert resize_hit_area(pt[0], pt[1], 800, 600, margin=6) == area

    def test_cursor_mapping(self):
        assert cursor_for_area("top") == "size-ver"
        assert cursor_for_area("bottom-right") == "size-fdiag"
        assert cursor_for_area(None) == "arrow"

    def test_resize_right_edge(self):
        assert resized_geometry((100, 100, 800, 600), "right", 50, 0) == (
            100, 100, 850, 600
        )

    def test_resize_left_edge_moves_origin(self):
        assert resized_geometry((100, 100, 800, 600), "left", 30, 0) == (
            130, 100, 770, 600
        )

    def test_corner_resize_and_min_size(self):
        x, y, w, h = resized_geometry(
            (0, 0, 500, 400), "bottom-right", -5000, -5000,
            min_w=400, min_h=300,
        )
        assert (w, h) == (400, 300)
        # top-left corner drag honors minimums while anchoring the
        # bottom-right corner
        x, y, w, h = resized_geometry(
            (0, 0, 500, 400), "top-left", 5000, 5000, min_w=400, min_h=300
        )
        assert (w, h) == (400, 300)
        assert (x + w, y + h) == (500, 400)


class TestTitleBarState:
    def test_title_text(self):
        assert title_text(None) == "optiland-tpu — untitled"
        assert title_text("cooke.json") == "optiland-tpu — cooke.json"
        assert title_text("cooke.json", dirty=True).endswith("•")

    def test_maximize_glyph(self):
        assert maximize_glyph(True) != maximize_glyph(False)
