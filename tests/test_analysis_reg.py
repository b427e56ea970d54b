"""Analysis-class numerical regression vs the reference on the Cooke
triplet: spots, distortion, field curvature, fans, grid distortion,
Y-Ybar, pupil aberration, RMS-vs-field, through-focus (reference:
optiland/analysis/*; goldens from tools/gen_goldens_r2.py analysis_reg —
previously generated but unconsumed)."""

from __future__ import annotations

import numpy as np
import pytest

from optiland_tpu.samples import CookeTriplet
from tests.conftest import assert_allclose


@pytest.fixture(scope="module")
def cooke():
    return CookeTriplet()


@pytest.fixture(scope="module")
def reg(goldens):
    return goldens("analysis_reg")


def test_spot_rms_and_geo(reg, cooke):
    from optiland_tpu.analysis import SpotDiagram

    spot = SpotDiagram(cooke)
    rms = np.asarray([[float(v) for v in row]
                      for row in spot.rms_spot_radius()])
    geo = np.asarray([[float(v) for v in row]
                      for row in spot.geometric_spot_radius()])
    assert_allclose(rms, reg["spot_rms"], rtol=1e-6, atol=1e-9)
    assert_allclose(geo, reg["spot_geo"], rtol=1e-6, atol=1e-9)


def test_spot_centroids(reg, cooke):
    from optiland_tpu.analysis import SpotDiagram

    spot = SpotDiagram(cooke)
    cents = np.asarray([[cx, cy] for cx, cy in spot.centroid()])
    assert_allclose(cents, reg["spot_centroid"], rtol=1e-6, atol=1e-9)


def test_distortion_curves(reg, cooke):
    from optiland_tpu.analysis import Distortion

    d = Distortion(cooke, num_points=32)
    ours = np.stack([np.ravel(np.asarray(v)) for v in d.data])
    assert_allclose(ours, reg["distortion"], rtol=1e-5, atol=1e-8)


def test_field_curvature_curves(reg, cooke):
    from optiland_tpu.analysis import FieldCurvature

    fc = FieldCurvature(cooke, num_points=32)
    ours = np.stack([
        np.stack([np.ravel(np.asarray(t)) for t in pair]) for pair in fc.data
    ])
    assert_allclose(ours, reg["field_curv"], rtol=1e-5, atol=1e-8)


def test_grid_distortion(reg, cooke):
    from optiland_tpu.analysis import GridDistortion

    gd = GridDistortion(cooke, num_points=8)
    assert_allclose(gd.data["xp"], reg["grid_xp"], rtol=1e-6, atol=1e-9)
    assert_allclose(gd.data["yp"], reg["grid_yp"], rtol=1e-6, atol=1e-9)
    assert_allclose(gd.data["max_distortion"], float(reg["grid_max"]),
                    rtol=1e-5, atol=1e-8)


@pytest.mark.parametrize("fk,fval", [("f0", (0.0, 0.0)), ("f1", (0.0, 1.0))])
@pytest.mark.parametrize("wl", ["0.48", "0.55", "0.65"])
def test_ray_fans(reg, cooke, fk, fval, wl):
    from optiland_tpu.analysis import RayFan

    fan = RayFan(cooke, num_points=32)  # forced odd -> 33, like reference
    assert_allclose(fan.data["Px"], reg["fan_Px"], rtol=1e-12, atol=1e-14)
    d = fan.data[f"{fval}"][wl]
    assert_allclose(d["y"], reg[f"fan_{fk}_{wl}_y"], rtol=1e-6, atol=1e-9)
    assert_allclose(d["x"], reg[f"fan_{fk}_{wl}_x"], rtol=1e-6, atol=1e-9)


def test_yybar(reg, cooke):
    from optiland_tpu.analysis import YYbar

    yy = YYbar(cooke)
    assert_allclose(yy.data["y"], reg["yybar_ya"], rtol=1e-8, atol=1e-11)
    assert_allclose(yy.data["ybar"], reg["yybar_yb"], rtol=1e-8, atol=1e-11)


def test_pupil_aberration_reg(reg, cooke):
    from optiland_tpu.analysis import PupilAberration

    pa = PupilAberration(cooke, num_points=16)  # forced odd -> 17
    assert_allclose(pa.data["Py"], reg["pupil_ab_Py"], rtol=1e-12, atol=1e-14)
    d = pa.data["(0.0, 1.0)"]["0.55"]
    for axis, key in (("x", "pupil_ab_x"), ("y", "pupil_ab_y")):
        ref = np.asarray(reg[key])
        ours = np.asarray(d[axis])
        np.testing.assert_array_equal(np.isnan(ref), np.isnan(ours))
        ok = ~np.isnan(ref)
        np.testing.assert_allclose(ours[ok], ref[ok], rtol=1e-5, atol=1e-7)


def test_rms_vs_field_reg(reg, cooke):
    from optiland_tpu.analysis import (
        RmsSpotSizeVsField, RmsWavefrontErrorVsField,
    )

    rs = RmsSpotSizeVsField(cooke, num_fields=8)
    assert_allclose(np.asarray(rs.data["rms"]), reg["rms_field_spot"],
                    rtol=1e-6, atol=1e-9)
    rw = RmsWavefrontErrorVsField(cooke, num_fields=8, num_rays=16)
    assert_allclose(np.asarray(rw.data["rms"]), reg["rms_field_wave"],
                    rtol=1e-5, atol=1e-7)


def test_through_focus_spot_rms(reg, cooke):
    from optiland_tpu.analysis import ThroughFocusSpotDiagram

    tf = ThroughFocusSpotDiagram(cooke, delta_focus=0.05, num_steps=3,
                                 num_rings=4)
    assert_allclose(np.asarray(tf.positions), reg["tf_positions"],
                    rtol=1e-12, atol=1e-14)
    rms = []
    for sd in tf.data:
        srow = []
        for row in sd.data:
            wrow = []
            for spot in row:
                x = np.ravel(np.asarray(spot.x))
                y = np.ravel(np.asarray(spot.y))
                m = np.ravel(np.asarray(spot.intensity)) > 0
                cx, cy = x[m].mean(), y[m].mean()
                wrow.append(float(np.sqrt(
                    ((x[m] - cx) ** 2 + (y[m] - cy) ** 2).mean()
                )))
            srow.append(wrow)
        rms.append(srow)
    assert_allclose(np.asarray(rms), reg["tf_rms"], rtol=1e-6, atol=1e-9)
