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


CV_SEQ = """! Test triplet in CODE V sequential format
RDM Y
TITLE 'CV Test Triplet'
EPD 10.0
WL 486.1 587.6 656.3
WTW 1 1 1
REF 2
YAN 0 14 20
SO 0.0 1e11
S 22.01359 3.25896 NSK16_SCHOTT
S -435.76044 6.00755
S -22.21328 0.99997 1.603420:38.0300
STO -25.05 4.75041
S 79.68360 2.95208 NSK16_SCHOTT
  CIR CLR 6.0
S -18.39533 42.20778
  K -0.5
SI 0.0 0.0
"""


def test_codev_load(tmp_path, goldens):
    """Load a .seq file: glass lookup (hyphen insertion), Nd:Vd fictitious
    glass, STO line, CIR aperture, conic modifier
    (reference: fileio/codev/reader/parser.py)."""
    from optiland_tpu.fileio import load_codev_file

    path = str(tmp_path / "test.seq")
    with open(path, "w") as f:
        f.write(CV_SEQ)
    lens = load_codev_file(path)
    assert lens.name == "CV Test Triplet"
    g = goldens("codev")
    assert_allclose(float(np.ravel(lens.paraxial.f2())[0]), g["f2"], rtol=1e-9)
    r = lens.trace(Hy=1.0, wavelength=0.5876, num_rays=5)
    assert_allclose(r.y, g["y"], rtol=1e-9, atol=1e-11)
    assert_allclose(r.i, g["i"], rtol=1e-9, atol=1e-11)


def test_codev_write_roundtrip(tmp_path):
    """Save to .seq and reload: traces match the original."""
    import warnings

    from optiland_tpu.fileio import load_codev_file, save_codev_file

    lens = CookeTriplet()
    path = str(tmp_path / "out.seq")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        save_codev_file(lens, path)
    text = open(path).read()
    assert "RDM Y" in text and "STO" in text and "SK16" in text
    lens2 = load_codev_file(path)
    r1 = lens.trace(Hy=1.0, num_rays=4)
    r2 = lens2.trace(Hy=1.0, num_rays=4)
    assert_allclose(r2.y, r1.y, rtol=1e-6, atol=1e-7)


def test_codev_writer_rejects_unsupported(tmp_path):
    import pytest

    from optiland_tpu.fileio import save_codev_file
    from optiland_tpu.optic import Optic

    o = Optic()
    o.surfaces.add(index=0, radius=np.inf, thickness=np.inf)
    o.surfaces.add(index=1, surface_type="chebyshev", thickness=5.0,
                   is_stop=True, coefficients=[[0.0, 1e-4]], norm_x=10,
                   norm_y=10)
    o.surfaces.add(index=2)
    o.set_aperture("EPD", 4.0)
    o.fields.set_type("angle")
    o.fields.add(y=0)
    o.wavelengths.add(0.55, is_primary=True)
    with pytest.raises(NotImplementedError):
        save_codev_file(o, str(tmp_path / "bad.seq"))
