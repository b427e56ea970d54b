"""Extract the reference's sample lens PRESCRIPTIONS to JSON.

Lens prescriptions (radii, thicknesses, glasses, stops, fields) are
published design data; this tool instantiates every reference sample
system, serializes it via the reference's own ``Optic.to_dict()``, and
translates the result into optiland_tpu ``surfaces.add`` keyword specs
stored in ``optiland_tpu/database/samples.json``. The samples package
rebuilds the systems from that data at import time.

Usage: python tools/extract_samples.py
"""

from __future__ import annotations

import importlib
import inspect
import json
import math
import os
import sys
import types
import warnings

numba_stub = types.ModuleType("numba")
numba_stub.jit = lambda *a, **k: (a[0] if a and callable(a[0]) else (lambda f: f))
numba_stub.njit = numba_stub.jit
numba_stub.prange = range
sys.modules.setdefault("numba", numba_stub)
sys.modules.setdefault("vtk", types.ModuleType("vtk"))
sys.path.insert(0, "/root/reference")

OUT = os.path.join(
    os.path.dirname(__file__), "..", "optiland_tpu", "database",
    "samples.json",
)

MODULES = [
    "objectives", "telescopes", "eyepieces", "microscopes", "infrared",
    "lithography", "simple", "miscellaneous",
]

_FIELD_TYPES = {
    "AngleField": "angle",
    "ObjectHeightField": "object_height",
    "ParaxialImageHeightField": "paraxial_image_height",
    "RealImageHeightField": "real_image_height",
}


def _num(v):
    v = float(v)
    if math.isinf(v):
        return "inf" if v > 0 else "-inf"
    return v


def _material_spec(mat: dict, reflective: bool):
    if reflective:
        return "mirror"
    t = mat.get("type")
    if t == "IdealMaterial":
        idx = float(mat.get("index", 1.0))
        if abs(idx - 1.0) < 1e-12:
            return "air"
        return {"ideal_index": idx, "absorb": float(mat.get("absorp", 0.0))}
    if t == "Material":
        spec = {"name": mat["name"]}
        if mat.get("reference"):
            spec["reference"] = mat["reference"]
        return spec
    if t == "AbbeMaterial":
        return {"abbe_index": float(mat["index"]),
                "abbe": float(mat["abbe"])}
    if t == "MaterialFile":
        return {"name": os.path.basename(mat.get("filename", "")).replace(
            ".yml", "")}
    raise ValueError(f"Unhandled material type {t}")


def _geometry_spec(geo: dict, out: dict):
    t = geo["type"]
    out["radius"] = _num(geo.get("radius", float("inf")))
    if t in ("Plane", "StandardGeometry"):
        out["conic"] = float(geo.get("conic", 0.0))
    elif t == "EvenAsphere":
        out["surface_type"] = "even_asphere"
        out["conic"] = float(geo.get("conic", 0.0))
        out["coefficients"] = [float(c) for c in geo.get("coefficients", [])]
    elif t == "OddAsphere":
        out["surface_type"] = "odd_asphere"
        out["conic"] = float(geo.get("conic", 0.0))
        out["coefficients"] = [float(c) for c in geo.get("coefficients", [])]
    elif t == "ParaxialSurface":
        out["surface_type"] = "paraxial"
        out["f"] = float(geo["focal_length"])
    else:
        raise ValueError(f"Unhandled geometry type {t}")
    cs = geo.get("cs", {})
    for src, dst in (("x", "dx"), ("y", "dy"), ("rx", "rx"), ("ry", "ry"),
                     ("rz", "rz")):
        v = float(cs.get(src, 0.0))
        if abs(v) > 1e-15 and math.isfinite(v):
            out[dst] = v


def translate(d: dict, optic=None) -> dict:
    spec = {"surfaces": [], "aperture": None, "fields": None,
            "wavelengths": []}
    ap = d.get("aperture")
    if ap:
        spec["aperture"] = {"type": ap["type"], "value": float(ap["value"])}
    fd = d["fields"]
    spec["fields"] = {
        "type": _FIELD_TYPES.get(
            fd.get("field_definition", {}).get("field_type", "AngleField"),
            "angle",
        ),
        # NOTE: read the live attribute — the reference's to_dict reports
        # the field-group flag, not optic.obj_space_telecentric (the one the
        # aimer consults), so serialization drops telecentricity.
        "telecentric": bool(
            getattr(optic, "obj_space_telecentric", False)
            or fd.get("telecentric", False)
        ),
        "points": [
            {"x": float(f["x"]), "y": float(f["y"]),
             "vx": float(f.get("vx", 0.0)), "vy": float(f.get("vy", 0.0))}
            for f in fd["fields"]
        ],
    }
    for w in d["wavelengths"]["wavelengths"]:
        spec["wavelengths"].append(
            {"value": float(w["value"]), "is_primary": bool(w["is_primary"])}
        )
    rt = d.get("ray_tracer") or {}
    cfg = rt.get("ray_aiming_config") or {}
    if cfg.get("mode", "paraxial") != "paraxial":
        spec["ray_aiming"] = {
            "method": cfg["mode"],
            "cache": bool(cfg.get("cache", False)),
            "max_iter": int(cfg.get("max_iter", 20)),
            "tol": float(cfg.get("tol", 1e-8)),
        }

    surfaces = d["surface_group"]["surfaces"]
    prev_z = None
    for i, s in enumerate(surfaces):
        row: dict = {"index": i}
        geo = s["geometry"]
        _geometry_spec(geo, row)
        stype = s.get("type")
        if stype == "ObjectSurface":
            z = float(geo["cs"].get("z", 0.0))
            row["thickness"] = (
                "inf" if not math.isfinite(z) else None
            )
        if "thickness" not in row or row["thickness"] is None:
            t = s.get("thickness")
            if t is None:
                # object surface with finite z: thickness = -z
                z = float(geo["cs"].get("z", 0.0))
                row["thickness"] = -z
            else:
                row["thickness"] = _num(t)
        refl = bool(
            s.get("interaction_model", {}).get("is_reflective", False)
        )
        mat = s.get("material_post")
        if mat is not None and stype != "ObjectSurface":
            m = _material_spec(mat, refl)
            if m != "air":
                row["material"] = m
        if s.get("is_stop"):
            row["is_stop"] = True
        apert = s.get("aperture")
        if isinstance(apert, dict) and "r_max" in apert:
            r_max = float(apert["r_max"])
            r_min = float(apert.get("r_min", 0.0))
            if r_min > 0.0 or not math.isfinite(r_max):
                # annular obscuration (e.g. Hubble secondary): keep as a
                # physical RadialAperture spec, not a scalar diameter
                row["aperture"] = {
                    "radial": {
                        "r_max": "inf" if math.isinf(r_max) else r_max,
                        "r_min": r_min,
                    }
                }
            else:
                row["aperture"] = 2 * r_max
        if s.get("comment"):
            row["comment"] = s["comment"]
        spec["surfaces"].append(row)
    return spec


def main():
    warnings.filterwarnings("ignore")
    out = {}
    for modname in MODULES:
        try:
            mod = importlib.import_module(f"optiland.samples.{modname}")
        except Exception as e:
            print(f"skip module {modname}: {e}")
            continue
        for name, cls in inspect.getmembers(mod, inspect.isclass):
            if cls.__module__ != mod.__name__:
                continue
            try:
                optic = cls()
                spec = translate(optic.to_dict(), optic)
                spec["module"] = modname
                out[name] = spec
                print(f"{modname}.{name}: {len(spec['surfaces'])} surfaces")
            except Exception as e:
                print(f"FAILED {modname}.{name}: {type(e).__name__}: {e}")
    with open(OUT, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(f"wrote {len(out)} samples -> {OUT}")


if __name__ == "__main__":
    main()
