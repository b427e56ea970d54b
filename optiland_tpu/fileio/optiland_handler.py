"""Native JSON serialization of optical systems.

Dict round-trip compatible in spirit with the reference's
``Optic.to_dict``/``from_dict`` and save/load_optiland_file
(reference: optiland/optic/optic_serializer.py, fileio/optiland_handler.py:45).
"""

from __future__ import annotations

import json

import numpy as np

from optiland_tpu.coordinate_system import CoordinateSystem
from optiland_tpu.materials import BaseMaterial
from optiland_tpu.optic import Optic


def optic_to_dict(optic: Optic) -> dict:
    """Serialize an Optic builder to a plain dict."""
    surfaces = []
    for s in optic.surfaces.surfaces:
        mat = s.material
        if isinstance(mat, BaseMaterial):
            mat_spec = mat.to_dict()
        elif isinstance(mat, tuple):
            mat_spec = {"type": "_name", "name": mat[0], "reference": mat[1]}
        else:
            mat_spec = {"type": "_name", "name": str(mat)}
        surfaces.append(
            {
                "radius": None if np.isinf(s.radius) else float(s.radius),
                "thickness": None if np.isinf(s.thickness) else float(s.thickness),
                "conic": float(s.conic),
                "material": mat_spec,
                "is_stop": bool(s.is_stop),
                "surface_type": s.surface_type,
                "coefficients": list(map(float, s.coefficients)),
                "dx": float(s.dx),
                "dy": float(s.dy),
                "dz": float(s.dz),
                "rx": float(s.rx),
                "ry": float(s.ry),
                "rz": float(s.rz),
                "aperture": s.aperture,
                "comment": s.comment,
                "geo_p1": float(s.geo_p1),
                "geo_p2": float(s.geo_p2),
                "geo_aux": list(s.geo_aux) if s.geo_aux else None,
                "coordinate_system": (
                    s.coordinate_system.to_dict()
                    if s.coordinate_system is not None else None
                ),
            }
        )
    return {
        "version": 1.0,
        "name": optic.name,
        "surfaces": surfaces,
        "aperture": (
            {"type": optic.aperture.ap_type, "value": optic.aperture.value}
            if optic.aperture
            else None
        ),
        "fields": {
            "type": optic.fields.field_type,
            "telecentric": optic.fields.telecentric,
            "points": [
                {"x": f.x, "y": f.y, "vx": f.vx, "vy": f.vy,
                 "weight": f.weight}
                for f in optic.fields.fields
            ],
        },
        "wavelengths": [
            {"value": w.value, "is_primary": w.is_primary,
             "weight": w.weight}
            for w in optic.wavelengths.wavelengths
        ],
        "polarization": optic.polarization,
    }


def optic_from_dict(data: dict) -> Optic:
    """Rebuild an Optic builder from its dict form."""
    optic = Optic(name=data.get("name"))
    for i, sd in enumerate(data["surfaces"]):
        mat_spec = sd.get("material", {"type": "_name", "name": "air"})
        if mat_spec.get("type") == "_name":
            material = (
                (mat_spec["name"], mat_spec["reference"])
                if mat_spec.get("reference")
                else mat_spec["name"]
            )
        else:
            material = BaseMaterial.from_dict(mat_spec)
        kwargs = {}
        st = sd.get("surface_type") or "standard"
        if st == "chebyshev":
            kwargs.update(norm_x=sd.get("geo_p1"), norm_y=sd.get("geo_p2"))
        elif st == "zernike":
            kwargs.update(
                norm_radius=sd.get("geo_p1"),
                zernike_type=(sd.get("geo_aux") or ["fringe"])[0],
            )
        elif st == "biconic":
            kwargs.update(
                radius_x=sd["radius"] if sd["radius"] is not None else np.inf,
                radius_y=sd.get("geo_p1", np.inf),
                conic_x=sd.get("conic", 0.0),
                conic_y=sd.get("geo_p2", 0.0),
            )
        elif st == "toroidal":
            kwargs.update(
                radius_x=sd["radius"] if sd["radius"] is not None else np.inf,
                radius_y=sd.get("geo_p1", np.inf),
                toroidal_coeffs_poly_y=sd.get("coefficients", []),
            )
        optic.surfaces.add(
            index=i,
            radius=np.inf if sd["radius"] is None else sd["radius"],
            thickness=np.inf if sd["thickness"] is None else sd["thickness"],
            conic=sd.get("conic", 0.0),
            material=material,
            is_stop=sd.get("is_stop", False),
            surface_type=st,
            coefficients=sd.get("coefficients", []),
            dx=sd.get("dx", 0.0),
            dy=sd.get("dy", 0.0),
            dz=sd.get("dz", 0.0),
            rx=sd.get("rx", 0.0),
            ry=sd.get("ry", 0.0),
            rz=sd.get("rz", 0.0),
            coordinate_system=(
                CoordinateSystem.from_dict(sd["coordinate_system"])
                if sd.get("coordinate_system") else None
            ),
            aperture=sd.get("aperture"),
            comment=sd.get("comment", ""),
            **kwargs,
        )
    if data.get("aperture"):
        optic.set_aperture(data["aperture"]["type"], data["aperture"]["value"])
    fdata = data.get("fields", {})
    optic.fields.set_type(fdata.get("type", "angle"))
    for p in fdata.get("points", []):
        optic.fields.add(x=p["x"], y=p["y"], vx=p.get("vx", 0),
                         vy=p.get("vy", 0), weight=p.get("weight", 1.0))
    optic.fields.telecentric = fdata.get("telecentric", False)
    for w in data.get("wavelengths", []):
        optic.wavelengths.add(value=w["value"],
                              is_primary=w.get("is_primary", False),
                              weight=w.get("weight", 1.0))
    optic.polarization = data.get("polarization", "ignore")
    return optic


def save_optiland_file(optic: Optic, filename: str) -> None:
    """Write the JSON system file (reference: fileio/optiland_handler.py)."""
    with open(filename, "w") as f:
        json.dump(optic_to_dict(optic), f, indent=2)


def load_optiland_file(filename: str) -> Optic:
    """Read a JSON system file."""
    with open(filename) as f:
        return optic_from_dict(json.load(f))
