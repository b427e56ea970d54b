"""Zemax reader edge-case tests on synthesized .zmx content: aperture
operands, encodings, vignetting, coordinate breaks, weights, and error
paths (reference: tests/test_fileio/test_zemax_reader.py — per-operand
unit tests plus end-to-end edge files)."""

from __future__ import annotations

import numpy as np
import pytest

from optiland_tpu.fileio import load_zemax_file

HEAD = """MODE SEQ
NAME edge case file
"""

TAIL = """FTYP 0 0 2 2 0 0 0 1
XFLN 0.0 0.0
YFLN 0.0 5.0
WAVM 1 0.486 1.0
WAVM 2 0.588 1.0
PWAV 2
SURF 0
  TYPE STANDARD
  CURV 0.0
  DISZ INFINITY
SURF 1
  TYPE STANDARD
  CURV 0.02
  DISZ 5.0
  GLAS N-BK7 0 0 1.5168 64.17
  STOP
SURF 2
  TYPE STANDARD
  CURV -0.02
  DISZ 40.0
SURF 3
  TYPE STANDARD
  CURV 0.0
  DISZ 0.0
"""


def _write(tmp_path, body, encoding="utf-8", name="t.zmx"):
    p = tmp_path / name
    p.write_bytes(body.encode(encoding))
    return str(p)


class TestApertureOperands:
    def test_enpd(self, tmp_path):
        lens = load_zemax_file(_write(tmp_path, HEAD + "ENPD 12.5\n" + TAIL))
        assert lens.aperture.ap_type == "EPD"
        assert float(lens.aperture.value) == 12.5

    def test_fnum(self, tmp_path):
        lens = load_zemax_file(
            _write(tmp_path, HEAD + "FNUM 2.8 0\n" + TAIL)
        )
        assert lens.aperture.ap_type == "imageFNO"
        assert float(lens.aperture.value) == 2.8

    def test_obna(self, tmp_path):
        body = (HEAD + "OBNA 0.25 0\n" + TAIL).replace(
            "DISZ INFINITY", "DISZ 60.0"
        )
        lens = load_zemax_file(_write(tmp_path, body))
        assert lens.aperture.ap_type == "objectNA"
        assert float(lens.aperture.value) == 0.25

    def test_floating_stop_uses_stop_diameter(self, tmp_path):
        body = HEAD + "FLOA\n" + TAIL.replace(
            "  STOP\n", "  STOP\n  DIAM 4.4 1 0 0 1\n"
        )
        lens = load_zemax_file(_write(tmp_path, body))
        assert lens.aperture.ap_type == "float_by_stop_size"
        # both readers adopt the DIAM value verbatim as the stop size
        # (reference: zemax/reader/converter.py:268-278)
        assert float(lens.aperture.value) == pytest.approx(4.4)


class TestEncodings:
    @pytest.mark.parametrize("enc", ["utf-8", "utf-16", "iso-8859-1"])
    def test_roundtrip_encoding(self, tmp_path, enc):
        body = HEAD + "ENPD 10.0\n" + TAIL
        if enc == "iso-8859-1":
            body = body.replace("edge case file", "Objektivpr\xfcfung")
        lens = load_zemax_file(_write(tmp_path, body, encoding=enc))
        assert float(lens.surfaces.surfaces[1].radius) == pytest.approx(50.0)

    def test_utf16_beats_wrong_decode(self, tmp_path):
        """A UTF-16 file must not be half-read as latin-1 garbage."""
        body = HEAD + "ENPD 10.0\n" + TAIL
        lens = load_zemax_file(
            _write(tmp_path, body, encoding="utf-16")
        )
        assert len(lens.surfaces.surfaces) == 4


class TestSurfaceOperands:
    def test_conic_and_radius(self, tmp_path):
        body = (HEAD + "ENPD 10.0\n" + TAIL).replace(
            "  CURV 0.02\n", "  CURV 0.02\n  CONI -1.5\n"
        )
        lens = load_zemax_file(_write(tmp_path, body))
        s1 = lens.surfaces.surfaces[1]
        assert float(s1.conic) == -1.5
        assert float(s1.radius) == pytest.approx(50.0)

    def test_mirror_material(self, tmp_path):
        body = (HEAD + "ENPD 10.0\n" + TAIL).replace(
            "GLAS N-BK7 0 0 1.5168 64.17", "GLAS MIRROR"
        )
        lens = load_zemax_file(_write(tmp_path, body))
        assert lens.surfaces.surfaces[1].material == "mirror"

    def test_glass_by_name(self, tmp_path):
        lens = load_zemax_file(
            _write(tmp_path, HEAD + "ENPD 10.0\n" + TAIL)
        )
        n = lens.surfaces.surfaces[1].material.n(0.55)
        assert float(np.ravel(np.asarray(n))[0]) == pytest.approx(
            1.5185, abs=1e-3
        )

    def test_clear_aperture_from_clap(self, tmp_path):
        """CLAP defines the physical clear aperture: the compiled system
        clips at that semi-diameter."""
        body = (HEAD + "ENPD 10.0\n" + TAIL).replace(
            "  STOP\n", "  STOP\n  CLAP 0 6.25 0\n"
        )
        lens = load_zemax_file(_write(tmp_path, body))
        assert float(
            np.asarray(lens.system.stack.ap_max)[1]
        ) == pytest.approx(6.25)

    def test_even_asphere_params(self, tmp_path):
        body = (HEAD + "ENPD 10.0\n" + TAIL).replace(
            "  TYPE STANDARD\n  CURV 0.02",
            "  TYPE EVENASPH\n  CURV 0.02\n"
            "  PARM 1 1E-05\n  PARM 2 -2E-08",
        )
        lens = load_zemax_file(_write(tmp_path, body))
        s1 = lens.surfaces.surfaces[1]
        assert s1.surface_type == "even_asphere"
        cs = np.ravel(np.asarray(s1.coefficients, float))
        assert cs[0] == pytest.approx(1e-5)
        assert cs[1] == pytest.approx(-2e-8)

    def test_toroidal_surface(self, tmp_path):
        body = (HEAD + "ENPD 10.0\n" + TAIL).replace(
            "  TYPE STANDARD\n  CURV 0.02",
            "  TYPE TOROIDAL\n  CURV 0.02\n  PARM 1 80.0",
        )
        lens = load_zemax_file(_write(tmp_path, body))
        assert lens.surfaces.surfaces[1].surface_type == "toroidal"


class TestFieldsAndWavelengths:
    def test_primary_wavelength_index(self, tmp_path):
        lens = load_zemax_file(
            _write(tmp_path, HEAD + "ENPD 10.0\n" + TAIL)
        )
        assert float(lens.primary_wavelength) == pytest.approx(0.588)
        assert lens.wavelengths.num_wavelengths == 2

    def test_field_weights_parsed(self, tmp_path):
        body = (HEAD + "ENPD 10.0\n" + TAIL).replace(
            "YFLN 0.0 5.0\n", "YFLN 0.0 5.0\nFWGN 1.0 0.5\n"
        )
        lens = load_zemax_file(_write(tmp_path, body))
        ys = [float(f.y) for f in lens.fields.fields]
        assert ys == [0.0, 5.0]

    def test_vignetting_factors_land_on_fields(self, tmp_path):
        body = (HEAD + "ENPD 10.0\n" + TAIL).replace(
            "YFLN 0.0 5.0\n",
            "YFLN 0.0 5.0\nVCXN 0.0 0.1\nVCYN 0.0 0.2\n"
            "VDXN 0.0 0.0\nVDYN 0.0 0.05\n",
        )
        lens = load_zemax_file(_write(tmp_path, body))
        f2 = lens.fields.fields[1]
        assert float(f2.vx) == pytest.approx(0.1)
        assert float(f2.vy) == pytest.approx(0.2)

    def test_object_height_field_type(self, tmp_path):
        body = (HEAD + "ENPD 10.0\n" + TAIL).replace(
            "FTYP 0 0 2 2 0 0 0 1", "FTYP 1 0 2 2 0 0 0 1"
        ).replace("DISZ INFINITY", "DISZ 100.0")
        lens = load_zemax_file(_write(tmp_path, body))
        assert lens.fields.field_type == "object_height"


class TestCoordinateBreak:
    def test_coordbrk_decenters_and_tilts(self, tmp_path):
        body = (HEAD + "ENPD 10.0\n" + TAIL).replace(
            "SURF 2\n  TYPE STANDARD\n  CURV -0.02\n  DISZ 40.0\n",
            "SURF 2\n  TYPE COORDBRK\n  DISZ 0.0\n"
            "  PARM 1 0.4\n  PARM 2 -0.3\n  PARM 3 2.0\n"
            "SURF 3\n  TYPE STANDARD\n  CURV -0.02\n  DISZ 40.0\n",
        ).replace("SURF 3\n  TYPE STANDARD\n  CURV 0.0\n  DISZ 0.0\n",
                  "SURF 4\n  TYPE STANDARD\n  CURV 0.0\n  DISZ 0.0\n")
        lens = load_zemax_file(_write(tmp_path, body))
        # coordinate break folds into the following surface's cs
        s = lens.surfaces.surfaces[2]
        assert float(s.dx) == pytest.approx(0.4)
        assert float(s.dy) == pytest.approx(-0.3)
        assert float(np.degrees(s.rx)) == pytest.approx(2.0)

    def test_trace_through_coordbrk_is_finite(self, tmp_path):
        body = (HEAD + "ENPD 10.0\n" + TAIL).replace(
            "SURF 2\n  TYPE STANDARD\n  CURV -0.02\n  DISZ 40.0\n",
            "SURF 2\n  TYPE COORDBRK\n  DISZ 0.0\n  PARM 3 1.0\n"
            "SURF 3\n  TYPE STANDARD\n  CURV -0.02\n  DISZ 40.0\n",
        ).replace("SURF 3\n  TYPE STANDARD\n  CURV 0.0\n  DISZ 0.0\n",
                  "SURF 4\n  TYPE STANDARD\n  CURV 0.0\n  DISZ 0.0\n")
        lens = load_zemax_file(_write(tmp_path, body))
        res = lens.trace(Hy=0.0, num_rays=6)
        assert np.isfinite(np.asarray(res.y)).all()


class TestErrorPaths:
    def test_nonseq_mode_rejected(self, tmp_path):
        body = (HEAD + "ENPD 10.0\n" + TAIL).replace(
            "MODE SEQ", "MODE NONSEQ"
        )
        with pytest.raises(ValueError):
            load_zemax_file(_write(tmp_path, body))

    def test_file_without_aperture_rejected(self, tmp_path):
        with pytest.raises(ValueError, match="Failed to read"):
            load_zemax_file(_write(tmp_path, HEAD + TAIL.split("SURF")[0]))

    def test_missing_file_raises(self, tmp_path):
        with pytest.raises((FileNotFoundError, OSError, ValueError)):
            load_zemax_file(str(tmp_path / "nope.zmx"))


class TestWriterRoundTrip:
    def test_asphere_roundtrip_preserves_coefficients(self, tmp_path):
        from optiland_tpu.fileio import save_zemax_file

        body = (HEAD + "ENPD 10.0\n" + TAIL).replace(
            "  TYPE STANDARD\n  CURV 0.02",
            "  TYPE EVENASPH\n  CURV 0.02\n  PARM 1 1E-05\n  PARM 2 -2E-08",
        )
        lens = load_zemax_file(_write(tmp_path, body))
        out = str(tmp_path / "out.zmx")
        save_zemax_file(lens, out)
        again = load_zemax_file(out)
        c0 = np.ravel(np.asarray(again.surfaces.surfaces[1].coefficients))
        assert c0[0] == pytest.approx(1e-5)

    def test_vignetting_roundtrip(self, tmp_path):
        from optiland_tpu.fileio import save_zemax_file

        body = (HEAD + "ENPD 10.0\n" + TAIL).replace(
            "YFLN 0.0 5.0\n", "YFLN 0.0 5.0\nVCXN 0.0 0.15\nVCYN 0.0 0.3\n"
        )
        lens = load_zemax_file(_write(tmp_path, body))
        out = str(tmp_path / "out.zmx")
        save_zemax_file(lens, out)
        again = load_zemax_file(out)
        assert float(again.fields.fields[1].vx) == pytest.approx(0.15)
        assert float(again.fields.fields[1].vy) == pytest.approx(0.3)
