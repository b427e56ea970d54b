"""Data-driven sample systems.

Prescriptions extracted from the reference's sample library (published
lens-design data) live in optiland_tpu/database/samples.json
(tools/extract_samples.py); this module rebuilds each system as an Optic
subclass (reference: optiland/samples/*.py, ~30 systems).
"""

from __future__ import annotations

import json
import os

import numpy as np

from optiland_tpu.optic import Optic

_PATH = os.path.join(
    os.path.dirname(__file__), "..", "database", "samples.json"
)
with open(_PATH) as _fh:
    SAMPLE_SPECS: dict = json.load(_fh)


def _resolve_value(v):
    if v == "inf":
        return np.inf
    if v == "-inf":
        return -np.inf
    return v


def _resolve_material(spec):
    if isinstance(spec, str):
        return spec  # "mirror", "air", or a catalog name
    if "ideal_index" in spec:
        from optiland_tpu.materials import IdealMaterial

        return IdealMaterial(spec["ideal_index"], spec.get("absorb", 0.0))
    if "abbe_index" in spec:
        from optiland_tpu.materials import AbbeMaterial

        return AbbeMaterial(spec["abbe_index"], spec["abbe"])
    if "reference" in spec:
        return (spec["name"], spec["reference"])
    return spec["name"]


def build_sample(name: str) -> Optic:
    """Instantiate one sample system from its stored prescription."""
    spec = SAMPLE_SPECS[name]
    o = Optic(name)
    for row in spec["surfaces"]:
        kwargs = dict(row)
        kwargs["radius"] = _resolve_value(kwargs.get("radius", np.inf))
        kwargs["thickness"] = _resolve_value(kwargs.get("thickness", 0.0))
        if "material" in kwargs:
            kwargs["material"] = _resolve_material(kwargs["material"])
        ap = kwargs.get("aperture")
        if isinstance(ap, dict) and "radial" in ap:
            from optiland_tpu.physical_apertures import RadialAperture

            kwargs["aperture"] = RadialAperture(
                r_max=float(_resolve_value(ap["radial"]["r_max"])),
                r_min=float(ap["radial"]["r_min"]),
            )
        o.surfaces.add(**kwargs)
    ap = spec.get("aperture")
    if ap:
        o.set_aperture(ap["type"], ap["value"])
    fd = spec["fields"]
    o.fields.set_type(fd["type"])
    if fd.get("telecentric"):
        o.obj_space_telecentric = True
    for f in fd["points"]:
        o.fields.add(x=f["x"], y=f["y"], vx=f.get("vx", 0.0),
                     vy=f.get("vy", 0.0))
    for w in spec["wavelengths"]:
        o.wavelengths.add(w["value"], is_primary=w["is_primary"])
    ra = spec.get("ray_aiming")
    if ra:
        o.set_ray_aiming(ra["method"], cache=ra.get("cache", False),
                         max_iter=ra.get("max_iter", 20),
                         tol=ra.get("tol", 1e-8))
    return o


def _make_class(name: str):
    def __init__(self):
        Optic.__init__(self, name)
        built = build_sample(name)
        self.__dict__.update(built.__dict__)

    cls = type(name, (Optic,), {
        "__init__": __init__,
        "__doc__": (
            f"{name} sample system (prescription data extracted from "
            f"reference optiland/samples/{SAMPLE_SPECS[name]['module']}.py)."
        ),
    })
    return cls


_GENERATED = {}
for _name in SAMPLE_SPECS:
    _GENERATED[_name] = _make_class(_name)

globals().update(_GENERATED)

__all__ = sorted(_GENERATED)
