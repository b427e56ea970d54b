"""CODE V Sequential (.seq) reader and writer.

Mirrors the reference's parser/converter/formatter/encoder pipeline
(reference: optiland/fileio/codev/reader/parser.py:1-420,
reader/converter.py:1-230, writer/formatter.py:29-352,
writer/encoder.py:36-240, surfaces.py:127-258) over this package's Optic.
"""

from __future__ import annotations

import math
import re
import warnings

import numpy as np

_ASPH_KEYS = ("A", "B", "C", "D", "E", "F", "G", "H", "J")
_SURFACE_STARTERS = frozenset({"SO", "SI", "S", "STO"})
_FIELD_CMD_MAP = {
    "XAN": ("angle", "x"),
    "YAN": ("angle", "y"),
    "XOB": ("object_height", "x"),
    "YOB": ("object_height", "y"),
    "XIM": ("paraxial_image_height", "x"),
    "YIM": ("paraxial_image_height", "y"),
}
_AP_KEY_TO_CMD = {"EPD": "EPD", "FNO": "FNO", "NA": "NA", "NAO": "NAO"}
_FIELD_TYPE_CMDS = {
    "angle": ("XAN", "YAN"),
    "object_height": ("XOB", "YOB"),
    "paraxial_image_height": ("XIM", "YIM"),
}
_APERTURE_KEY_MAP = {
    "EPD": "EPD",
    "FNO": "imageFNO",
    "NA": "imageFNO",
    "NAO": "objectNA",
}
# Fraunhofer F, d, C lines for fictitious-glass Abbe numbers
_WL_F, _WL_d, _WL_C = 0.4861327, 0.5875618, 0.6562725


def _looks_like_float(s: str) -> bool:
    try:
        float(s)
        return True
    except ValueError:
        return False


def _glass_name_candidates(name: str) -> list[str]:
    """CODE V omits hyphens from catalog glass names (e.g. NBK7)
    (reference: reader/parser.py:380-400)."""
    candidates = [name]
    prefixes = frozenset("NSPQEHLMKFGC")
    if len(name) > 2 and name[0].upper() in prefixes and name[1].isalpha():
        candidates.append(f"{name[0]}-{name[1:]}")
    return candidates


class CodeVDataParser:
    """State-machine parser for .seq files (reference: reader/parser.py:40)."""

    def __init__(self, filename: str):
        self.filename = filename
        self.data: dict = {
            "name": None,
            "aperture": {},
            "fields": {},
            "wavelengths": {"data": []},
            "surfaces": {},
            "radius_mode": True,
            "units": "MM",
            "sto_surface_index": None,
        }
        self._surf = -1
        self._surf_data: dict = {}
        self._in_prv = False

    def parse(self) -> dict:
        for tokens in self._load():
            self._dispatch(tokens)
        self._flush_surface()
        fields = self.data["fields"]
        if "y" in fields and "x" not in fields:
            fields["x"] = [0.0] * len(fields["y"])
        elif "x" in fields and "y" not in fields:
            fields["y"] = [0.0] * len(fields["x"])
        return self.data

    def _load(self) -> list[list[str]]:
        try:
            with open(self.filename, encoding="utf-8") as fh:
                raw = fh.readlines()
        except UnicodeDecodeError:
            with open(self.filename, encoding="latin-1") as fh:
                raw = fh.readlines()
        result: list[list[str]] = []
        cont = ""
        for line in raw:
            if "!" in line:
                line = line[: line.index("!")]
            line = line.rstrip()
            if not line:
                if cont:
                    self._tokenize(cont, result)
                    cont = ""
                continue
            if line.endswith("&"):
                cont += " " + line[:-1]
            else:
                full = (cont + " " + line).strip()
                cont = ""
                self._tokenize(full, result)
        if cont:
            self._tokenize(cont, result)
        return result

    @staticmethod
    def _tokenize(line: str, result: list):
        line = re.sub(r'"[^"]*"', "", line)
        for segment in line.split(";"):
            tokens = segment.split()
            if tokens:
                result.append(tokens)

    def _dispatch(self, tokens: list[str]):
        if self._in_prv:
            if tokens[0].upper() == "END":
                self._in_prv = False
            return
        cmd = tokens[0].upper()
        if cmd in ("SO", "SI") or (
            cmd == "S" and (len(tokens) == 1 or _looks_like_float(tokens[1]))
        ):
            self._flush_surface()
            self._start_surface(tokens)
            return
        if cmd == "STO" and self._surf < 0:
            self._flush_surface()
            self._start_surface(["S", "0.0", "0.0"])
            self._surf_data["is_stop"] = True
            return
        if self._surf >= 0:
            handled = self._surface_modifier(cmd, tokens)
            if handled:
                return
        self._global_cmd(cmd, tokens)

    def _surface_modifier(self, cmd, tokens) -> bool:
        sd = self._surf_data
        if cmd == "STO":
            if len(tokens) > 1 and re.match(r"^[Ss]\d+$", tokens[1]):
                self.data["sto_surface_index"] = int(tokens[1][1:])
            else:
                sd["is_stop"] = True
            return True
        if cmd == "K":
            sd["conic"] = float(tokens[1])
            return True
        if cmd in ("XDE", "YDE", "ZDE", "ADE", "BDE", "CDE"):
            sd[cmd.lower()] = float(tokens[1])
            return True
        if cmd in _ASPH_KEYS:
            idx = _ASPH_KEYS.index(cmd)
            coeffs = sd["coefficients"]
            while len(coeffs) <= idx:
                coeffs.append(0.0)
            coeffs[idx] = float(tokens[1])
            sd["profile"] = "ASP"
            return True
        if cmd == "CIR":
            from optiland_tpu.physical_apertures import RadialAperture

            for tok in tokens[1:]:
                try:
                    sd["aperture"] = RadialAperture(r_max=float(tok))
                    return True
                except ValueError:
                    continue
            return True
        if cmd in ("SLB", "DAR", "BEN", "REV", "REX", "REY", "THC", "CCY",
                   "PIM", "SPH", "CON", "ASP", "CYL", "DIF", "HWL", "HOR",
                   "HCT", "HCO"):
            return True
        return False

    def _global_cmd(self, cmd, tokens):
        if cmd in ("TITLE", "TIT"):
            raw = " ".join(tokens[1:]).strip().strip("'\"")
            self.data["name"] = raw or None
        elif cmd == "DIM":
            self.data["units"] = {"M": "MM", "C": "CM", "I": "IN"}.get(
                tokens[1].upper(), "MM"
            )
        elif cmd == "RDM":
            self.data["radius_mode"] = (
                len(tokens) < 2 or tokens[1].upper() != "N"
            )
        elif cmd in ("EPD", "FNO", "NA", "NAO"):
            self.data["aperture"][cmd] = float(tokens[1])
        elif cmd == "WL":
            self.data["wavelengths"]["data"] = [
                float(v) / 1000.0 for v in tokens[1:]
            ]
        elif cmd == "WTW":
            self.data["wavelengths"]["weights"] = [float(v) for v in tokens[1:]]
        elif cmd == "REF":
            self.data["wavelengths"]["primary_index"] = int(tokens[1]) - 1
        elif cmd in _FIELD_CMD_MAP:
            field_type, axis = _FIELD_CMD_MAP[cmd]
            if "type" not in self.data["fields"]:
                self.data["fields"]["type"] = field_type
            self.data["fields"][axis] = [float(v) for v in tokens[1:]]
        elif cmd == "WTF":
            self.data["fields"]["weights"] = [float(v) for v in tokens[1:]]
        elif cmd == "PRV":
            warnings.warn(
                "Private glass catalog (PRV block) is not supported; "
                "glasses defined in PRV will be resolved as AbbeMaterial "
                "if possible.",
                UserWarning,
                stacklevel=2,
            )
            self._in_prv = True
        elif cmd == "END":
            self._in_prv = False

    def _flush_surface(self):
        if self._surf >= 0:
            self.data["surfaces"][self._surf] = self._surf_data

    def _start_surface(self, tokens):
        self._surf += 1
        cmd = tokens[0].upper()
        surf_type = {"SO": "object", "SI": "image"}.get(cmd, "standard")
        self._surf_data = {
            "type": surf_type, "radius": np.inf, "thickness": 0.0,
            "material": None, "is_stop": False, "conic": 0.0,
            "coefficients": [], "xde": 0.0, "yde": 0.0, "zde": 0.0,
            "ade": 0.0, "bde": 0.0, "cde": 0.0, "aperture": None,
        }
        try:
            r_raw = float(tokens[1]) if len(tokens) > 1 else 0.0
            self._surf_data["radius"] = self._convert_radius(r_raw)
        except (ValueError, IndexError):
            pass
        try:
            self._surf_data["thickness"] = float(tokens[2])
        except (ValueError, IndexError):
            pass
        if len(tokens) > 3:
            self._surf_data["material"] = self._parse_glass(tokens[3])

    def _convert_radius(self, val: float) -> float:
        if val == 0.0:
            return np.inf
        if self.data["radius_mode"]:
            return float(val)
        return 1.0 / float(val)

    def _parse_glass(self, token: str):
        from optiland_tpu.materials import AbbeMaterial, Material

        token = token.strip("'\"")
        if not token or token.upper() in ("AIR", ""):
            return None
        upper = token.upper()
        if upper == "REFL":
            return "mirror"
        if ":" in token:
            try:
                nd_str, vd_str = token.split(":", 1)
                return AbbeMaterial(float(nd_str), float(vd_str))
            except (ValueError, TypeError):
                pass
        if re.match(r"^\d+\.\d+$", token):
            try:
                int_str, dec_str = token.split(".", 1)
                nd = 1.0 + int(int_str[:3]) / 1000.0
                vd = int(dec_str[:3].ljust(3, "0")) / 10.0
                if 1.0 < nd < 4.0 and 0.0 < vd < 200.0:
                    return AbbeMaterial(nd, vd)
            except (ValueError, IndexError):
                pass
        if len(token) == 6 and token.isdigit():
            try:
                nd = 1.0 + int(token[:3]) / 1000.0
                vd = int(token[3:]) / 10.0
                return AbbeMaterial(nd, vd)
            except ValueError:
                pass
        if "_" in token:
            name, catalog = token.rsplit("_", 1)
            for candidate in _glass_name_candidates(name):
                try:
                    return Material(candidate, catalog.lower())
                except ValueError:
                    pass
            for candidate in _glass_name_candidates(name):
                try:
                    return Material(candidate)
                except ValueError:
                    pass
        for candidate in _glass_name_candidates(upper):
            try:
                return Material(candidate)
            except ValueError:
                pass
        warnings.warn(
            f"Glass '{token}' could not be resolved; treating as air.",
            UserWarning,
            stacklevel=2,
        )
        return None


class CodeVToOpticConverter:
    """data dict -> Optic (reference: reader/converter.py:30-230)."""

    def __init__(self, codev_data: dict):
        self.data = dict(codev_data)
        self.optic = None

    def convert(self):
        from optiland_tpu.optic import Optic

        self.optic = Optic(self.data.get("name"))
        self._configure_surfaces()
        self._configure_aperture()
        self._configure_fields()
        self._configure_wavelengths()
        return self.optic

    def _configure_surfaces(self):
        surfaces = self.data.get("surfaces", {})
        sto_index = self.data.get("sto_surface_index")
        keys = sorted(surfaces.keys(), key=int)
        first = surfaces[keys[0]] if keys else {}
        if first.get("type", "standard") != "object":
            new_surfaces = {0: {
                "type": "object", "radius": np.inf, "thickness": np.inf,
                "material": None, "is_stop": False, "conic": 0.0,
                "coefficients": [], "xde": 0.0, "yde": 0.0, "zde": 0.0,
                "ade": 0.0, "bde": 0.0, "cde": 0.0, "aperture": None,
            }}
            for new_k, old_k in enumerate(keys, start=1):
                new_surfaces[new_k] = surfaces[old_k]
            surfaces = new_surfaces
            keys = sorted(surfaces.keys(), key=int)
            if sto_index is not None:
                sto_index += 1
        has_stop = any(sd.get("is_stop", False) for sd in surfaces.values())
        for surf_idx, k in enumerate(keys):
            surf = surfaces[k]
            if sto_index is not None and surf_idx == sto_index:
                surf = dict(surf)
                surf["is_stop"] = True
                has_stop = True
            if not has_stop and surf_idx == 1:
                surf = dict(surf)
                surf["is_stop"] = True
            self.optic.surfaces.add(**self._surface_params(surf, surf_idx))

    def _surface_params(self, surf: dict, surf_idx: int) -> dict:
        cv_type = surf.get("type", "standard")
        if cv_type in ("object", "image"):
            opt_type = "standard"
        else:
            profile = surf.get("profile", "SPH")
            if surf.get("coefficients"):
                profile = "ASP"
            opt_type = "even_asphere" if profile == "ASP" else "standard"
        thickness = surf.get("thickness", 0.0)
        if cv_type == "object" and abs(float(thickness)) >= 1e10:
            thickness = np.inf
        params = {
            "index": surf_idx,
            "surface_type": opt_type,
            "radius": surf.get("radius", np.inf),
            "conic": surf.get("conic", 0.0),
            "thickness": thickness,
            "is_stop": surf.get("is_stop", False),
            "material": surf.get("material") or "air",
        }
        if surf.get("coefficients"):
            params["coefficients"] = surf["coefficients"]
        if surf.get("aperture") is not None:
            params["aperture"] = surf["aperture"]
        xde = float(surf.get("xde", 0.0))
        yde = float(surf.get("yde", 0.0))
        ade = float(surf.get("ade", 0.0))
        bde = float(surf.get("bde", 0.0))
        cde = float(surf.get("cde", 0.0))
        if xde or yde or ade or bde or cde:
            params["dx"] = xde
            params["dy"] = yde
            params["rx"] = math.radians(ade)
            params["ry"] = math.radians(bde)
            params["rz"] = math.radians(cde)
        return params

    def _configure_aperture(self):
        ap = self.data.get("aperture", {})
        if not ap:
            return
        for cv_key, opt_key in _APERTURE_KEY_MAP.items():
            if cv_key in ap:
                self.optic.set_aperture(opt_key, float(ap[cv_key]))
                return
        raise ValueError("No valid aperture type found in CODE V data.")

    def _configure_fields(self):
        fields = self.data.get("fields", {})
        self.optic.fields.set_type(fields.get("type", "angle"))
        fx = fields.get("x", [0.0])
        fy = fields.get("y", [0.0])
        for k in range(len(fy)):
            x = fx[k] if k < len(fx) else 0.0
            self.optic.fields.add(x=float(x), y=float(fy[k]))

    def _configure_wavelengths(self):
        wl = self.data.get("wavelengths", {})
        primary = wl.get("primary_index", 0)
        for idx, value in enumerate(wl.get("data", [])):
            self.optic.wavelengths.add(float(value), is_primary=(idx == primary))


def load_codev_file(filepath: str):
    """Parse a .seq file and build an Optic
    (reference: fileio/codev/reader/converter.py load_codev_file)."""
    data = CodeVDataParser(filepath).parse()
    return CodeVToOpticConverter(data).convert()


# ---------------------------------------------------------------------------
# Writer
# ---------------------------------------------------------------------------


def _fmt(value: float) -> str:
    return f"{value:.8g}"


def _fmt_list(values) -> str:
    return " ".join(_fmt(v) for v in values)


def _raw_from_radius(radius: float) -> float:
    if np.isinf(radius) or radius == 0:
        return 0.0
    return float(radius)


class OpticToCodeVConverter:
    """Optic -> data dict (reference: writer/formatter.py:65-352)."""

    def __init__(self, optic):
        self._optic = optic

    def convert(self) -> dict:
        self._optic.system  # force compile: resolves materials/mirror flags
        model = {
            "name": self._optic.name,
            "aperture": {},
            "fields": {},
            "wavelengths": {"data": []},
            "surfaces": {},
        }
        self._aperture(model)
        self._fields(model)
        self._wavelengths(model)
        self._warn_pickups_solves()
        self._surfaces(model)
        return model

    def _aperture(self, model):
        ap = self._optic.aperture
        if ap is None:
            return
        mapping = {
            "EPD": "EPD", "imageFNO": "FNO", "objectNA": "NAO",
            "float_by_stop_size": "EPD",
        }
        cv_key = mapping.get(ap.ap_type)
        if cv_key is None:
            warnings.warn(
                f"Unknown aperture type '{ap.ap_type}'; skipping aperture "
                "export.", UserWarning, stacklevel=3,
            )
            return
        model["aperture"][cv_key] = float(ap.value)

    def _fields(self, model):
        fields = self._optic.fields
        model["fields"] = {
            "type": fields.field_type,
            "x": [float(f.x) for f in fields.fields],
            "y": [float(f.y) for f in fields.fields],
        }

    def _wavelengths(self, model):
        data, primary = [], 0
        for i, w in enumerate(self._optic.wavelengths.wavelengths):
            data.append(float(w.value))
            if w.is_primary:
                primary = i
        model["wavelengths"] = {"data": data, "primary_index": primary}

    def _warn_pickups_solves(self):
        n_pick = len(getattr(self._optic.pickups, "pickups", []))
        n_solv = len(getattr(self._optic.solves, "solves", []))
        if n_pick:
            warnings.warn(
                f"Optic has {n_pick} pickup(s) that cannot be represented in "
                "a .seq file; resolved values will be exported instead.",
                UserWarning, stacklevel=3,
            )
        if n_solv:
            warnings.warn(
                f"Optic has {n_solv} solve(s) that cannot be represented in "
                "a .seq file; resolved values will be exported instead.",
                UserWarning, stacklevel=3,
            )

    def _surfaces(self, model):
        surfs = self._optic.surfaces.surfaces
        if not surfs:
            return
        idx = 0
        model["surfaces"][idx] = {
            "type": "object", "radius": 0.0,
            "thickness": float(surfs[0].thickness),
        }
        idx += 1
        for surface in surfs[1:-1]:
            st = surface.surface_type or "standard"
            if st not in ("standard", "plane", "even_asphere"):
                raise NotImplementedError(
                    f"Surface {idx}: geometry type '{st}' is not supported "
                    "by the CODE V writer."
                )
            raw = {
                "type": "standard",
                "profile": "ASP" if st == "even_asphere" else "SPH",
                "radius": _raw_from_radius(float(surface.radius)),
                "conic": float(surface.conic),
                "thickness": float(surface.thickness),
            }
            if st == "even_asphere":
                coeffs = list(surface.coefficients)
                while len(coeffs) < len(_ASPH_KEYS):
                    coeffs.append(0.0)
                for i in range(len(_ASPH_KEYS)):
                    raw[f"coeff_{i}"] = float(coeffs[i])
            if surface.is_stop:
                raw["is_stop"] = True
            if surface.aperture is not None and not isinstance(
                surface.aperture, (int, float)
            ):
                raw["aperture"] = surface.aperture
            elif isinstance(surface.aperture, (int, float)):
                from optiland_tpu.physical_apertures import RadialAperture

                raw["aperture"] = RadialAperture(r_max=surface.aperture / 2)
            glass = self._format_glass(surface, idx)
            if glass is not None:
                raw["glass"] = glass
            if abs(surface.dx) > 1e-12:
                raw["xde"] = float(surface.dx)
            if abs(surface.dy) > 1e-12:
                raw["yde"] = float(surface.dy)
            if abs(surface.rx) > 1e-12:
                raw["ade"] = math.degrees(surface.rx)
            if abs(surface.ry) > 1e-12:
                raw["bde"] = math.degrees(surface.ry)
            if abs(surface.rz) > 1e-12:
                raw["cde"] = math.degrees(surface.rz)
            model["surfaces"][idx] = raw
            idx += 1
        model["surfaces"][idx] = {
            "type": "image", "radius": 0.0, "thickness": 0.0,
        }

    def _format_glass(self, surface, surf_idx):
        from optiland_tpu.materials import IdealMaterial, Material

        if surface._is_reflective:
            return {"name": "REFL"}
        mat = surface._material_obj if surface._material_obj is not None \
            else surface.material
        if mat is None:
            return None
        if isinstance(mat, str):
            if mat.lower() in ("air", ""):
                return None
            if mat.lower() == "mirror":
                return {"name": "REFL"}
            from optiland_tpu.materials import resolve_material

            mat = resolve_material(mat)
        if isinstance(mat, IdealMaterial):
            if abs(float(mat.index) - 1.0) < 1e-6:
                return None
        if isinstance(mat, Material):
            if mat.reference:
                return {"name": mat.name.upper(),
                        "catalog": mat.reference.upper()}
            return {"name": mat.name.upper()}
        # AbbeMaterial round-trips its defining (nd, vd) pair exactly
        from optiland_tpu.materials import AbbeMaterial

        if isinstance(mat, AbbeMaterial):
            return {"nd": mat.index, "vd": mat.abbe}
        # unknown -> fictitious Nd:Vd glass recomputed from dispersion
        try:
            n_F = float(np.ravel(np.asarray(mat.n(_WL_F)))[0])
            n_C = float(np.ravel(np.asarray(mat.n(_WL_C)))[0])
            n_d = float(np.ravel(np.asarray(mat.n(_WL_d)))[0])
            denom = n_F - n_C
            v_d = 99.99 if abs(denom) < 1e-12 else (n_d - 1.0) / denom
        except Exception:
            n_d, v_d = 1.5, 64.17
        mat_name = getattr(mat, "name", type(mat).__name__)
        warnings.warn(
            f"Surface {surf_idx}: glass '{mat_name}' has no CODE V catalog "
            f"entry; writing as fictitious glass (Nd={n_d:.6f}, "
            f"Vd={v_d:.2f}). Round-trip fidelity is not guaranteed.",
            UserWarning, stacklevel=4,
        )
        return {"nd": n_d, "vd": v_d}


class CodeVFileEncoder:
    """data dict -> .seq text lines (reference: writer/encoder.py:60-240)."""

    def __init__(self, model: dict):
        self._model = model

    def encode(self) -> list[str]:
        lines: list[str] = []
        lines.append("! Generated by optiland_tpu")
        lines.append("RDM Y")
        if self._model.get("name"):
            lines.append(f"TITLE '{self._model['name']}'")
        self._encode_aperture(lines)
        self._encode_wavelengths(lines)
        self._encode_fields(lines)
        lines.append("")
        for idx in sorted(self._model["surfaces"].keys()):
            self._encode_surface(lines, self._model["surfaces"][idx])
        return lines

    def _encode_aperture(self, lines):
        ap = self._model.get("aperture", {})
        for key, cmd in _AP_KEY_TO_CMD.items():
            if key in ap:
                lines.append(f"{cmd} {_fmt(ap[key])}")
                return

    def _encode_wavelengths(self, lines):
        wl = self._model.get("wavelengths", {})
        data = wl.get("data", [])
        if not data:
            return
        lines.append("WL " + _fmt_list([v * 1000.0 for v in data]))
        lines.append("WTW " + " ".join(["1"] * len(data)))
        lines.append(f"REF {wl.get('primary_index', 0) + 1}")

    def _encode_fields(self, lines):
        fields = self._model.get("fields", {})
        y_vals = fields.get("y", [])
        if not y_vals:
            return
        x_cmd, y_cmd = _FIELD_TYPE_CMDS.get(
            fields.get("type", "angle"), ("XAN", "YAN")
        )
        x_vals = fields.get("x", [])
        if x_vals and any(abs(v) > 1e-12 for v in x_vals):
            lines.append(f"{x_cmd} " + _fmt_list(x_vals))
        lines.append(f"{y_cmd} " + _fmt_list(y_vals))

    def _encode_surface(self, lines, raw):
        surf_type = raw.get("type", "standard")
        r_str = _fmt(float(raw.get("radius", 0.0)))
        t_str = _fmt(float(raw.get("thickness", 0.0)))
        if surf_type == "object":
            line = f"SO {r_str} {t_str}"
        elif surf_type == "image":
            line = f"SI {r_str} {t_str}"
        else:
            glass = raw.get("glass")
            line = f"S  {r_str} {t_str}"
            if glass:
                line += f"  {self._glass_inline(glass)}"
        lines.append(line)
        if raw.get("is_stop"):
            lines.append("  STO")
        conic = raw.get("conic", 0.0)
        if conic is not None and abs(float(conic)) > 1e-16:
            lines.append(f"  K {_fmt(float(conic))}")
        if raw.get("profile") == "ASP":
            for i, key in enumerate(_ASPH_KEYS):
                val = float(raw.get(f"coeff_{i}", 0.0))
                if abs(val) > 1e-30:
                    lines.append(f"  {key} {_fmt(val)}")
        for cv_key, label in (("xde", "XDE"), ("yde", "YDE"), ("zde", "ZDE"),
                              ("ade", "ADE"), ("bde", "BDE"), ("cde", "CDE")):
            val = float(raw.get(cv_key, 0.0))
            if abs(val) > 1e-12:
                lines.append(f"  {label} {_fmt(val)}")
        aperture = raw.get("aperture")
        if aperture is not None:
            try:
                lines.append(f"  CIR CLR {_fmt(float(aperture.r_max))}")
            except AttributeError:
                pass

    @staticmethod
    def _glass_inline(glass: dict) -> str:
        name = glass.get("name", "")
        if name == "REFL":
            return "REFL"
        if "nd" in glass and "vd" in glass:
            return f"{glass['nd']:.9f}:{glass['vd']:.6f}"
        catalog = glass.get("catalog")
        if catalog:
            return f"{name}_{catalog}"
        return name


def save_codev_file(optic, filepath: str) -> None:
    """Export an Optic to a CODE V .seq file
    (reference: writer/exporter.py save_codev_file)."""
    model = OpticToCodeVConverter(optic).convert()
    lines = CodeVFileEncoder(model).encode()
    with open(filepath, "w", encoding="utf-8") as fh:
        fh.write("\n".join(lines))
