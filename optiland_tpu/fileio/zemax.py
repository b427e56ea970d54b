"""Zemax .zmx file reader and writer.

Parses sequential-mode OpticStudio files into an Optic builder, following
the reference's operand handling and conversion semantics
(reference: optiland/fileio/zemax/reader/parser.py:19-345,
converter.py:22-290, writer/*.py). Tries UTF-16, UTF-8, and ISO-8859-1
encodings; supports standard/even-odd asphere/toroidal surfaces,
coordinate breaks (accumulated into per-surface position/tilt),
EPD/FNO/NA/floating-stop apertures, field types with vignetting factors,
wavelengths, glass resolution against the catalog with Abbe-model
fallback, and circular physical apertures.
"""

from __future__ import annotations

import numpy as np

from optiland_tpu.materials import AbbeMaterial, BaseMaterial, Material
from optiland_tpu.optic import Optic

_SURF_TYPES = {
    "STANDARD": "standard",
    "EVENASPH": "even_asphere",
    "ODDASPHE": "odd_asphere",
    "COORDBRK": "coordinate_break",
    "TOROIDAL": "toroidal",
    # Diffraction grating: PARM 1 = line density (lines/um), PARM 2 =
    # diffraction order. Beyond reference parity — the reference's reader
    # rejects DGRATING (its own tests/zemax_files/*grating*.zmx are
    # unreadable by it).
    "DGRATING": "grating",
}

_FIELD_TYPES = {
    0: "angle",
    1: "object_height",
    2: "paraxial_image_height",
    3: "real_image_height",
    4: "theodolite_angle",
}


class ZemaxParser:
    """Tokenized .zmx parsing into a plain data model
    (reference: zemax/reader/parser.py:19)."""

    def __init__(self, filename: str):
        self.filename = filename
        self.model = {
            "name": None,
            "aperture": {},
            "fields": {"num_fields": 0},
            "wavelengths": {"num_wavelengths": 0, "data": [], "weights": [],
                            "primary_index": 0},
            "surfaces": {},
            "glass_catalogs": [],
        }
        self._surf = -1
        self._surf_data = None

    def parse(self) -> dict:
        handlers = {
            "NAME": self._name, "FNUM": self._fno, "ENPD": self._epd,
            "OBNA": self._obna, "FLOA": self._floa, "FTYP": self._ftyp,
            "XFLN": self._xfln, "YFLN": self._yfln, "WAVM": self._wavm,
            "PWAV": self._pwav, "SURF": self._surf_op, "TYPE": self._type,
            "PARM": self._parm, "CURV": self._curv, "DISZ": self._disz,
            "CONI": self._coni, "GLAS": self._glas, "STOP": self._stop,
            "DIAM": self._diam, "MODE": self._mode, "GCAT": self._gcat,
            "FWGN": self._fwgn, "VDXN": self._vfield("vignette_decenter_x"),
            "VDYN": self._vfield("vignette_decenter_y"),
            "VCXN": self._vfield("vignette_compress_x"),
            "VCYN": self._vfield("vignette_compress_y"),
            "VANN": self._vfield("vignette_tangent_angle"),
            "CLAP": self._clap,
        }
        success = False
        for encoding in ("utf-16", "utf-8", "iso-8859-1"):
            try:
                with open(self.filename, encoding=encoding) as fh:
                    for line in fh:
                        tokens = line.split()
                        if not tokens:
                            continue
                        fn = handlers.get(tokens[0])
                        if fn:
                            fn(tokens)
            except (UnicodeError, UnicodeDecodeError):
                continue
            if self.model["aperture"]:
                success = True
                break
        if not success:
            raise ValueError("Failed to read Zemax file.")
        if self._surf >= 0:
            self.model["surfaces"][self._surf] = self._surf_data
        self._finalize_fields()
        return self.model

    # -- handlers --------------------------------------------------------
    def _name(self, d):
        self.model["name"] = " ".join(d[1:])

    def _fno(self, d):
        key = "imageFNO" if int(d[2]) == 0 else "paraxialImageFNO"
        self.model["aperture"][key] = float(d[1])

    def _epd(self, d):
        self.model["aperture"]["EPD"] = float(d[1])

    def _obna(self, d):
        key = "objectNA" if int(d[2]) == 0 else "object_cone_angle"
        self.model["aperture"][key] = float(d[1])

    def _floa(self, d):
        self.model["aperture"]["floating_stop"] = True

    def _ftyp(self, d):
        f = self.model["fields"]
        f["num_fields"] = int(d[3])
        f["type"] = _FIELD_TYPES.get(int(d[1]), "unsupported")
        f["object_space_telecentric"] = int(d[2]) == 1
        f["afocal_image_space"] = int(d[7]) == 1
        self.model["wavelengths"]["num_wavelengths"] = int(d[4])

    def _xfln(self, d):
        n = self.model["fields"]["num_fields"]
        self.model["fields"]["x"] = [float(v) for v in d[1 : n + 1]]

    def _yfln(self, d):
        n = self.model["fields"]["num_fields"]
        self.model["fields"]["y"] = [float(v) for v in d[1 : n + 1]]

    def _fwgn(self, d):
        n = self.model["fields"]["num_fields"]
        self.model["fields"]["weights"] = [float(v) for v in d[1 : n + 1]]

    def _vfield(self, key):
        def fn(d):
            n = self.model["fields"]["num_fields"]
            self.model["fields"][key] = [float(v) for v in d[1 : n + 1]]

        return fn

    def _wavm(self, d):
        w = self.model["wavelengths"]
        if len(w["data"]) < w["num_wavelengths"]:
            w["data"].append(float(d[2]))
            w["weights"].append(float(d[3]) if len(d) > 3 else 1.0)

    def _pwav(self, d):
        self.model["wavelengths"]["primary_index"] = int(d[1]) - 1

    def _surf_op(self, d):
        if self._surf >= 0:
            self.model["surfaces"][self._surf] = self._surf_data
        self._surf += 1
        self._surf_data = {
            "type": "standard", "is_stop": False, "conic": 0.0,
            "material": "air", "aperture": None, "radius": np.inf,
        }

    def _type(self, d):
        self._surf_data["type"] = _SURF_TYPES.get(d[1], d[1].lower())

    def _parm(self, d):
        self._surf_data[f"param_{int(d[1]) - 1}"] = float(d[2])

    def _curv(self, d):
        c = float(d[1])
        self._surf_data["radius"] = np.inf if c == 0 else 1.0 / c

    def _disz(self, d):
        self._surf_data["thickness"] = (
            np.inf if d[1] == "INFINITY" else float(d[1])
        )

    def _coni(self, d):
        self._surf_data["conic"] = float(d[1])

    def _glas(self, d):
        name = d[1]
        if name.upper() == "MIRROR":
            self._surf_data["material"] = "mirror"
            return
        self._surf_data["material"] = name
        try:
            self._surf_data["index"] = float(d[4].replace(",", "."))
            self._surf_data["abbe"] = float(d[5].replace(",", "."))
        except (IndexError, ValueError):
            self._surf_data["index"] = None
            self._surf_data["abbe"] = None
        try:
            self._surf_data["material"] = Material(name)
        except ValueError:
            for mfg in self.model["glass_catalogs"]:
                try:
                    self._surf_data["material"] = Material(name, mfg.lower())
                    break
                except ValueError:
                    continue
        if not isinstance(self._surf_data["material"], BaseMaterial):
            if self._surf_data.get("index") is None:
                raise ValueError(f"Cannot resolve Zemax glass {name!r}")
            self._surf_data["material"] = AbbeMaterial(
                self._surf_data["index"], self._surf_data["abbe"]
            )

    def _stop(self, d):
        self._surf_data["is_stop"] = True

    def _diam(self, d):
        self._surf_data["diameter"] = float(d[1])

    def _mode(self, d):
        if d[1] != "SEQ":
            raise ValueError("Only sequential mode is supported.")

    def _gcat(self, d):
        self.model["glass_catalogs"] = d[1:]

    def _clap(self, d):
        self._surf_data["aperture"] = 2 * float(d[2])  # diameter

    def _finalize_fields(self):
        """Deduplicate and sort fields by y (reference: parser.py:289-330)."""
        f = self.model["fields"]
        if "x" not in f or "y" not in f:
            return
        keys = ["x", "y"] + [
            k
            for k in (
                "weights", "vignette_decenter_x", "vignette_decenter_y",
                "vignette_compress_x", "vignette_compress_y",
                "vignette_tangent_angle",
            )
            if k in f
        ]
        zipped = list(zip(*(f[k] for k in keys)))
        seen, unique = set(), []
        for item in zipped:
            if item[:2] not in seen:
                seen.add(item[:2])
                unique.append(item)
        unique.sort(key=lambda it: it[1])
        for i, k in enumerate(keys):
            f[k] = [it[i] for it in unique]


def _euler_from_matrix(R):
    """XYZ-intrinsic Euler angles matching the reference rotation order."""
    sy = np.sqrt(R[0, 0] ** 2 + R[1, 0] ** 2)
    if sy > 1e-10:
        rx = np.arctan2(R[2, 1], R[2, 2])
        ry = np.arctan2(-R[2, 0], sy)
        rz = np.arctan2(R[1, 0], R[0, 0])
    else:
        rx = np.arctan2(-R[1, 2], R[1, 1])
        ry = np.arctan2(-R[2, 0], sy)
        rz = 0.0
    return rx, ry, rz


def _rot_matrix(rx, ry, rz):
    """Zemax coordinate-break tilt composition (about x, then y, then z)."""
    cx, sx = np.cos(rx), np.sin(rx)
    cy, sy = np.cos(ry), np.sin(ry)
    cz, sz = np.cos(rz), np.sin(rz)
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return Rx @ Ry @ Rz


def _rot_matrix_zyx(rx, ry, rz):
    """Trace-core surface-frame composition: Rz @ Ry @ Rx (the matrix whose
    transpose core.trace applies as rotate_z(-rz), rotate_y(-ry),
    rotate_x(-rx)); inverse of _euler_from_matrix."""
    cx, sx = np.cos(rx), np.sin(rx)
    cy, sy = np.cos(ry), np.sin(ry)
    cz, sz = np.cos(rz), np.sin(rz)
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return Rz @ Ry @ Rx


def _euler_xyz_from_matrix(R):
    """Angles (rx, ry, rz) with Rx@Ry@Rz == R (Zemax CB tilt order);
    inverse of _rot_matrix."""
    sy = np.clip(R[0, 2], -1.0, 1.0)
    ry = np.arcsin(sy)
    if abs(sy) < 1.0 - 1e-10:
        rx = np.arctan2(-R[1, 2], R[2, 2])
        rz = np.arctan2(-R[0, 1], R[0, 0])
    else:
        rx = np.arctan2(R[2, 1], R[1, 1])
        rz = 0.0
    return rx, ry, rz


class ZemaxToOpticConverter:
    """Builds an Optic from parsed Zemax data
    (reference: zemax/reader/converter.py:22)."""

    def __init__(self, data: dict):
        self.data = data

    def convert(self) -> Optic:
        optic = Optic(self.data.get("name"))
        self._surfaces(optic)
        self._aperture(optic)
        self._fields(optic)
        self._wavelengths(optic)
        return optic

    def _coeffs(self, surf):
        t = surf["type"]
        if t in ("standard", "coordinate_break", "grating"):
            return ()
        if t in ("even_asphere", "odd_asphere", "toroidal"):
            start = 2 if t == "toroidal" else 0
            return [surf.get(f"param_{k}", 0.0) for k in range(start, start + 8)]
        raise ValueError(f"Unsupported Zemax surface type: {t}")

    def _surfaces(self, optic):
        surfs = self.data["surfaces"]
        order = sorted(surfs.keys(), key=int)
        has_cb = any(surfs[i]["type"] == "coordinate_break" for i in order)

        # Cumulative frame (identity when no coordinate breaks)
        origin = np.zeros(3)
        R = np.eye(3)
        pending = []  # (params, z_global)
        z_cursor = 0.0
        idx_out = 0

        for i in order:
            surf = surfs[i]
            t = surf["type"]
            if t == "coordinate_break":
                dx = surf.get("param_0", 0.0)
                dy = surf.get("param_1", 0.0)
                dz = surf.get("thickness", 0.0)
                rx = np.deg2rad(surf.get("param_2", 0.0))
                ry = np.deg2rad(surf.get("param_3", 0.0))
                rz = np.deg2rad(surf.get("param_4", 0.0))
                origin = origin + R @ np.array([dx, dy, 0.0])
                R = R @ _rot_matrix(rx, ry, rz)
                origin = origin + R @ np.array([0.0, 0.0, dz])
                continue

            coeffs = self._coeffs(surf)
            params = {
                "index": idx_out,
                "surface_type": t if t != "standard" else "standard",
                "conic": surf.get("conic", 0.0),
                "is_stop": surf.get("is_stop", False),
                "material": surf.get("material", "air"),
            }
            if coeffs:
                if t == "toroidal":
                    params["toroidal_coeffs_poly_y"] = coeffs
                else:
                    params["coefficients"] = coeffs
            if surf.get("aperture") is not None:
                params["aperture"] = surf["aperture"]
            if t == "toroidal":
                radius_x = surf.get("param_1", 0.0)
                params["radius_x"] = np.inf if radius_x == 0.0 else radius_x
                params["radius_y"] = surf["radius"]
            else:
                params["radius"] = surf["radius"]
            if t == "grating":
                density = surf.get("param_0", 0.0)  # lines per um
                params["grating_period"] = (
                    np.inf if density == 0.0 else 1.0 / density
                )
                params["grating_order"] = int(surf.get("param_1", 0.0))
                params.pop("coefficients", None)

            thickness = surf.get("thickness", 0.0)
            if has_cb and idx_out > 0 and not np.isinf(float(thickness)):
                rx_, ry_, rz_ = _euler_from_matrix(R)
                params.update(
                    dx=float(origin[0]), dy=float(origin[1]),
                    rx=float(rx_), ry=float(ry_), rz=float(rz_),
                )
                pending.append((params, float(origin[2])))
                origin = origin + R @ np.array([0.0, 0.0, thickness])
            else:
                params["thickness"] = thickness
                pending.append((params, None))
                if not np.isinf(float(thickness)):
                    origin = origin + R @ np.array([0.0, 0.0, thickness])
            idx_out += 1

        # Convert absolute z positions into thickness increments
        for k, (params, z_abs) in enumerate(pending):
            if z_abs is not None:
                next_z = None
                for k2 in range(k + 1, len(pending)):
                    if pending[k2][1] is not None:
                        next_z = pending[k2][1]
                        break
                params["thickness"] = (next_z - z_abs) if next_z is not None else 0.0
            optic.surfaces.add(**params)

    def _aperture(self, optic):
        ap = self.data["aperture"]
        if ap.get("floating_stop"):
            stop_d = None
            for s in self.data["surfaces"].values():
                if s.get("is_stop") and "diameter" in s:
                    stop_d = s["diameter"]
                    break
            if stop_d is None:
                raise ValueError(
                    "Floating stop aperture specified but no stop diameter found"
                )
            optic.set_aperture("float_by_stop_size", stop_d)
            return
        for key, value in ap.items():
            if key != "floating_stop":
                try:
                    optic.set_aperture(key, value)
                    return
                except ValueError:
                    continue
        raise ValueError("No valid aperture type found.")

    def _fields(self, optic):
        f = self.data["fields"]
        ftype = f.get("type", "angle")
        optic.fields.set_type(ftype)
        optic.obj_space_telecentric = f.get("object_space_telecentric", False)
        xs = f.get("x", [0.0])
        ys = f.get("y", [0.0])
        vx = f.get("vignette_compress_x", [0.0] * len(xs))
        vy = f.get("vignette_compress_y", [0.0] * len(xs))
        for x, y, vxi, vyi in zip(xs, ys, vx, vy):
            optic.fields.add(x=x, y=y, vx=vxi, vy=vyi)

    def _wavelengths(self, optic):
        w = self.data["wavelengths"]
        primary = w.get("primary_index", 0)
        for i, val in enumerate(w["data"]):
            optic.wavelengths.add(value=val, is_primary=(i == primary))


def load_zemax_file(source: str) -> Optic:
    """Read a .zmx file into an Optic (reference: fileio/__init__.py)."""
    data = ZemaxParser(source).parse()
    return ZemaxToOpticConverter(data).convert()


def save_zemax_file(optic: Optic, filename: str) -> None:
    """Write an Optic to a minimal sequential-mode .zmx file
    (reference: zemax/writer/*.py:46-90)."""
    lines = ["VERS 181119 693 105780 L105780", "MODE SEQ"]
    if optic.name:
        lines.append(f"NAME {optic.name}")
    lines.append("UNIT MM X W X CM MR CPMM")
    ap = optic.aperture
    if ap.ap_type == "EPD":
        lines.append(f"ENPD {ap.value}")
    elif ap.ap_type == "imageFNO":
        lines.append(f"FNUM {ap.value} 0")
    elif ap.ap_type == "objectNA":
        lines.append(f"OBNA {ap.value} 0")
    elif ap.ap_type == "float_by_stop_size":
        lines.append("FLOA")
    ftype_code = {v: k for k, v in _FIELD_TYPES.items()}.get(
        optic.fields.field_type, 0
    )
    nf = len(optic.fields.fields)
    nw = len(optic.wavelengths.wavelengths)
    lines.append(f"FTYP {ftype_code} 0 {nf} {nw} 0 0 0 1")
    lines.append("XFLN " + " ".join(str(f.x) for f in optic.fields.fields))
    lines.append("YFLN " + " ".join(str(f.y) for f in optic.fields.fields))
    lines.append("VCXN " + " ".join(str(f.vx) for f in optic.fields.fields))
    lines.append("VCYN " + " ".join(str(f.vy) for f in optic.fields.fields))
    for i, wl in enumerate(optic.wavelengths.wavelengths):
        lines.append(f"WAVM {i + 1} {wl.value} 1")
    lines.append(f"PWAV {optic.wavelengths.primary_index + 1}")
    type_names = {
        "standard": "STANDARD", "plane": "STANDARD",
        "even_asphere": "EVENASPH", "odd_asphere": "ODDASPHE",
        "toroidal": "TOROIDAL", "grating": "DGRATING",
    }
    def _r(v):
        # plain-float repr: numpy scalars repr as "np.float64(...)"
        return repr(float(v))

    surfaces = optic.surfaces.surfaces
    n = len(surfaces)
    # global vertex z per surface (surface 1 at z=0, object at -t0)
    z_abs = [0.0] * n
    if n:
        z_abs[0] = -float(surfaces[0].thickness)
    for k in range(2, n):
        z_abs[k] = z_abs[k - 1] + float(surfaces[k - 1].thickness)

    tilted = any(
        s.dx or s.dy or s.dz or s.rx or s.ry or s.rz for s in surfaces
    )
    # reader-frame simulation: emit a COORDBRK whenever the accumulated
    # frame does not already coincide with the surface's global frame
    # (inverse of ZemaxToOpticConverter._surfaces' accumulation)
    origin = np.zeros(3)
    R = np.eye(3)
    idx = 0

    def _surf_header(type_name):
        nonlocal idx
        lines.append(f"SURF {idx}")
        lines.append(f"  TYPE {type_name}")
        idx += 1

    for i, s in enumerate(surfaces):
        if tilted and i > 0:
            o_i = np.array([float(s.dx), float(s.dy),
                            z_abs[i] + float(s.dz)])
            R_i = _rot_matrix_zyx(float(s.rx), float(s.ry), float(s.rz))
            if not (
                np.allclose(R, R_i, atol=1e-12)
                and np.allclose(origin, o_i, atol=1e-10)
            ):
                # two breaks: pure translation in the current frame
                # (rotation-free CB translates by the full 3-vector), then
                # pure rotation — exact for any fold, including 90 degrees
                delta = R.T @ (o_i - origin)
                if not np.allclose(delta, 0.0, atol=1e-10):
                    _surf_header("COORDBRK")
                    lines.append("  CURV 0.0 0 0 0 0")
                    lines.append(f"  DISZ {_r(delta[2])}")
                    lines.append(f"  PARM 1 {_r(delta[0])}")
                    lines.append(f"  PARM 2 {_r(delta[1])}")
                    lines.append("  PARM 3 0.0")
                    lines.append("  PARM 4 0.0")
                    lines.append("  PARM 5 0.0")
                    lines.append("  PARM 6 0.0")
                R_rel = R.T @ R_i
                if not np.allclose(R_rel, np.eye(3), atol=1e-12):
                    rx_r, ry_r, rz_r = _euler_xyz_from_matrix(R_rel)
                    _surf_header("COORDBRK")
                    lines.append("  CURV 0.0 0 0 0 0")
                    lines.append("  DISZ 0.0")
                    lines.append("  PARM 1 0.0")
                    lines.append("  PARM 2 0.0")
                    lines.append(f"  PARM 3 {_r(np.rad2deg(rx_r))}")
                    lines.append(f"  PARM 4 {_r(np.rad2deg(ry_r))}")
                    lines.append(f"  PARM 5 {_r(np.rad2deg(rz_r))}")
                    lines.append("  PARM 6 0.0")
                origin, R = o_i.copy(), R_i

        _surf_header(type_names.get(s.surface_type, "STANDARD"))
        if s.surface_type == "toroidal":
            # CURV row carries the Y-Z curve radius; rotation radius in PARM 2
            # (mirrors ZemaxToOpticConverter._surfaces' toroidal mapping)
            r_yz = float(s.geo_p1)
            curv = 0.0 if np.isinf(r_yz) else 1.0 / r_yz
        else:
            curv = 0.0 if np.isinf(s.radius) else 1.0 / s.radius
        lines.append(f"  CURV {_r(curv)} 0 0 0 0")
        if s.conic:
            lines.append(f"  CONI {_r(s.conic)}")
        t = "INFINITY" if np.isinf(s.thickness) else repr(float(s.thickness))
        lines.append(f"  DISZ {t}")
        if s.is_stop and i != 0:
            lines.append("  STOP")
        mat = s.material
        if isinstance(mat, str) and mat.lower() == "mirror":
            lines.append("  GLAS MIRROR 0 0")
        elif isinstance(mat, tuple):
            lines.append(f"  GLAS {mat[0]} 0 0")
        elif isinstance(mat, str) and mat.lower() != "air":
            lines.append(f"  GLAS {mat} 0 0")
        elif isinstance(mat, Material):
            lines.append(f"  GLAS {mat.name} 0 0")
        if s.surface_type == "toroidal":
            r_rot = float(s.radius)
            lines.append(
                f"  PARM 2 {_r(0.0 if np.isinf(r_rot) else r_rot)}"
            )
            for k, c in enumerate(s.coefficients):
                lines.append(f"  PARM {k + 3} {_r(c)}")
        elif s.surface_type == "grating":
            # PARM 1 = line density (lines/um), PARM 2 = diffraction order
            period = float(s.geo_p1)
            density = 0.0 if np.isinf(period) else 1.0 / period
            order = int(s.geo_aux[1]) if s.geo_aux else 0
            lines.append(f"  PARM 1 {_r(density)}")
            lines.append(f"  PARM 2 {_r(order)}")
        else:
            for k, c in enumerate(s.coefficients):
                lines.append(f"  PARM {k + 1} {_r(c)}")
        if s.aperture is not None:
            lines.append(f"  CLAP 0 {_r(s.aperture / 2)} 0")
        if (
            s.is_stop
            and ap.ap_type == "float_by_stop_size"
        ):
            lines.append(f"  DIAM {_r(ap.value)} 1 0 0 1 \"\"")
        if not np.isinf(s.thickness):
            origin = origin + R @ np.array([0.0, 0.0, float(s.thickness)])
    with open(filename, "w") as fh:
        fh.write("\n".join(lines) + "\n")
