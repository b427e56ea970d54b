"""File I/O tests: Zemax reader/writer and JSON round-trip."""

import os

import numpy as np
import pytest

from optiland_tpu.fileio import (
    load_optiland_file,
    load_zemax_file,
    optic_from_dict,
    optic_to_dict,
    save_optiland_file,
    save_zemax_file,
)
from optiland_tpu.samples import CookeTriplet
from tests.conftest import assert_allclose

ZDIR = "/root/reference/tests/zemax_files/"

needs_zmx = pytest.mark.skipif(
    not os.path.isdir(ZDIR), reason="golden .zmx files unavailable"
)


@needs_zmx
@pytest.mark.parametrize(
    "fname,f2",
    [
        ("lens1.zmx", 24.990670),
        ("lens2.zmx", 22.499368),
        ("lens_floa.zmx", 20.210667),
        ("lens_thorlabs_iso_8859_1.zmx", 14.995572),
    ],
)
def test_zemax_load_focal_length(fname, f2):
    lens = load_zemax_file(ZDIR + fname)
    assert_allclose(float(np.ravel(lens.paraxial.f2())[0]), f2, rtol=1e-4)


@needs_zmx
def test_zemax_fold_mirror_reflective_path():
    lens = load_zemax_file(ZDIR + "simple_fold_mirror_up.zmx")
    assert any(lens.system.cfg.reflective)
    res = lens.trace(Hy=0.0, num_rays=4)
    assert np.isfinite(np.asarray(res.y)).all()


@needs_zmx
def test_zemax_writer_roundtrip(tmp_path):
    lens = CookeTriplet()
    path = str(tmp_path / "cooke.zmx")
    save_zemax_file(lens, path)
    lens2 = load_zemax_file(path)
    assert_allclose(
        float(np.ravel(lens2.paraxial.f2())[0]),
        float(np.ravel(lens.paraxial.f2())[0]),
        rtol=1e-6,
    )
    r1 = lens.trace(Hy=1.0, num_rays=4)
    r2 = lens2.trace(Hy=1.0, num_rays=4)
    assert_allclose(r2.y, r1.y, rtol=1e-6, atol=1e-8)


def test_json_roundtrip(tmp_path):
    lens = CookeTriplet()
    path = str(tmp_path / "cooke.json")
    save_optiland_file(lens, path)
    lens2 = load_optiland_file(path)
    r1 = lens.trace(Hy=1.0, num_rays=4)
    r2 = lens2.trace(Hy=1.0, num_rays=4)
    assert_allclose(r2.y, r1.y, rtol=1e-12)
    assert_allclose(r2.opd, r1.opd, rtol=1e-12)


def test_dict_roundtrip_aspheric():
    from optiland_tpu.samples import AsphericSinglet

    lens = AsphericSinglet()
    lens2 = optic_from_dict(optic_to_dict(lens))
    r1 = lens.trace(Hy=0.0, num_rays=4)
    r2 = lens2.trace(Hy=0.0, num_rays=4)
    assert_allclose(r2.y, r1.y, rtol=1e-12)
