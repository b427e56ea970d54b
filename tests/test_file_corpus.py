"""Full file-I/O corpus parity: every golden .zmx / .seq file the reference
ships is loaded, traced, and compared against reference-generated goldens
(tests/goldens/file_corpus.npz, from tools/gen_goldens_r2.py), then
round-tripped through our writers.

(reference: tests/test_fileio/test_zemax_reader.py, test_codev_reader.py,
test_zemax_writer.py, test_codev_writer.py)
"""

import os

import numpy as np
import pytest

from optiland_tpu.fileio import (
    load_codev_file,
    load_zemax_file,
    save_codev_file,
    save_zemax_file,
)
from tests.conftest import assert_allclose

ZDIR = "/root/reference/tests/zemax_files"
CDIR = "/root/reference/tests/test_fileio/codev_files"

ZMX_FILES = [
    "circular_aperture_example_with_aperture",
    "circular_aperture_example_without_aperture",
    "complicated_fold_mirrors_setup_v2",
    "lens1",
    "lens2",
    "lens_floa",
    "lens_thorlabs_iso_8859_1",
    "one_mirror_up_45deg",
    "simple_fold_mirror_up",
    "thorlabs_lj1598l1",
]
SEQ_FILES = [
    "asphere",
    "cooke_triplet",
    "fno_fields",
    "mirror",
    "telescope_objective",
]

pytestmark = pytest.mark.skipif(
    not os.path.isdir(ZDIR), reason="reference golden files unavailable"
)


def _load(tag):
    if tag.startswith("zmx_"):
        return load_zemax_file(os.path.join(ZDIR, tag[4:] + ".zmx"))
    return load_codev_file(os.path.join(CDIR, tag[4:] + ".seq"))


def _trace_onaxis(lens):
    return lens.trace(Hx=0.0, Hy=0.0, wavelength=lens.primary_wavelength,
                      num_rays=4, distribution="hexapolar")


@pytest.fixture(scope="module")
def corpus(goldens):
    return goldens("file_corpus")


@pytest.mark.parametrize("name", ZMX_FILES)
def test_zmx_focal_length(name, corpus):
    tag = f"zmx_{name}"
    lens = _load(tag)
    if f"{tag}_f2" in corpus.files:
        assert_allclose(
            float(np.ravel(lens.paraxial.f2())[0]), corpus[f"{tag}_f2"],
            rtol=1e-5,
        )


@pytest.mark.parametrize("name", ZMX_FILES)
def test_zmx_surface_count(name, corpus):
    tag = f"zmx_{name}"
    lens = _load(tag)
    assert lens.system.cfg.num_surfaces == int(corpus[f"{tag}_nsurf"])


@pytest.mark.parametrize("name", ZMX_FILES)
def test_zmx_trace_parity(name, corpus):
    tag = f"zmx_{name}"
    if f"{tag}_x" not in corpus.files:
        pytest.skip("reference could not trace this file")
    lens = _load(tag)
    res = _trace_onaxis(lens)
    for c in ("x", "y", "z", "L", "M", "N"):
        assert_allclose(
            getattr(res, c), corpus[f"{tag}_{c}"], rtol=1e-6, atol=1e-8
        )


@pytest.mark.parametrize("name", ZMX_FILES)
def test_zmx_opd_parity(name, corpus):
    tag = f"zmx_{name}"
    if f"{tag}_opd" not in corpus.files:
        pytest.skip("reference could not trace this file")
    lens = _load(tag)
    res = _trace_onaxis(lens)
    assert_allclose(res.opd, corpus[f"{tag}_opd"], rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("name", SEQ_FILES)
def test_seq_focal_length(name, corpus):
    tag = f"seq_{name}"
    lens = _load(tag)
    assert_allclose(
        float(np.ravel(lens.paraxial.f2())[0]), corpus[f"{tag}_f2"],
        rtol=1e-5,
    )


@pytest.mark.parametrize("name", SEQ_FILES)
def test_seq_trace_parity(name, corpus):
    tag = f"seq_{name}"
    lens = _load(tag)
    res = _trace_onaxis(lens)
    for c in ("x", "y", "z", "L", "M", "N"):
        assert_allclose(
            getattr(res, c), corpus[f"{tag}_{c}"], rtol=1e-6, atol=1e-8
        )


@pytest.mark.parametrize("name", ZMX_FILES)
def test_zmx_writer_roundtrip(name, tmp_path, corpus):
    tag = f"zmx_{name}"
    lens = _load(tag)
    path = str(tmp_path / "rt.zmx")
    save_zemax_file(lens, path)
    lens2 = load_zemax_file(path)
    r1 = _trace_onaxis(lens)
    r2 = _trace_onaxis(lens2)
    assert_allclose(r2.y, r1.y, rtol=1e-6, atol=1e-8)
    assert_allclose(r2.opd, r1.opd, rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("name", SEQ_FILES)
def test_seq_writer_roundtrip(name, tmp_path):
    tag = f"seq_{name}"
    lens = _load(tag)
    path = str(tmp_path / "rt.seq")
    save_codev_file(lens, path)
    lens2 = load_codev_file(path)
    r1 = _trace_onaxis(lens)
    r2 = _trace_onaxis(lens2)
    assert_allclose(r2.y, r1.y, rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("name", ZMX_FILES)
def test_zmx_json_roundtrip(name, tmp_path):
    from optiland_tpu.fileio import load_optiland_file, save_optiland_file

    lens = _load(f"zmx_{name}")
    path = str(tmp_path / "rt.json")
    save_optiland_file(lens, path)
    lens2 = load_optiland_file(path)
    r1 = _trace_onaxis(lens)
    r2 = _trace_onaxis(lens2)
    assert_allclose(r2.y, r1.y, rtol=1e-10)


# -- DGRATING files (beyond reference: its reader rejects these) ---------------

GRATING_FILES = ["flat_transmission_grating", "curved_transmission_grating",
                 "curved_reflective_grating"]


@pytest.mark.parametrize("name", GRATING_FILES)
def test_dgrating_zmx_loads_and_traces(name):
    lens = load_zemax_file(os.path.join(ZDIR, f"{name}.zmx"))
    r = lens.trace(Hx=0, Hy=0, wavelength=lens.primary_wavelength,
                   num_rays=4, distribution="hexapolar")
    assert np.isfinite(np.asarray(r.y)).all()
    assert np.isfinite(np.asarray(r.M)).all()


def test_dgrating_flat_obeys_grating_equation():
    """Normal-incidence chief ray: sin(theta) = m lambda / d with
    d = 1 / PARM1 and m = PARM2 from the file (PARM1 = 0.2 lines/um,
    PARM2 = -1)."""
    lens = load_zemax_file(os.path.join(ZDIR, "flat_transmission_grating.zmx"))
    wl = lens.primary_wavelength
    r = lens.trace(Hx=0, Hy=0, wavelength=wl, num_rays=4,
                   distribution="hexapolar")
    M = float(np.asarray(r.M)[0])
    expected = -1 * wl / 5.0  # d = 1/0.2 = 5 um
    assert M == pytest.approx(expected, abs=1e-9)


@pytest.mark.parametrize("name", GRATING_FILES)
def test_dgrating_zmx_writer_round_trip(name, tmp_path):
    """load -> save -> load preserves the grating trace (writer support is
    also beyond the reference, whose writer has no DGRATING)."""
    lens = load_zemax_file(os.path.join(ZDIR, f"{name}.zmx"))
    out = str(tmp_path / "rt.zmx")
    save_zemax_file(lens, out)
    lens2 = load_zemax_file(out)
    wl = lens.primary_wavelength
    r1 = lens.trace(Hx=0, Hy=0, wavelength=wl, num_rays=4,
                    distribution="hexapolar")
    r2 = lens2.trace(Hx=0, Hy=0, wavelength=wl, num_rays=4,
                     distribution="hexapolar")
    assert_allclose(np.asarray(r2.y), np.asarray(r1.y), rtol=1e-9, atol=1e-12)
    assert_allclose(np.asarray(r2.M), np.asarray(r1.M), rtol=1e-9, atol=1e-12)
