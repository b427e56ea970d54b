"""Parsing of refractiveindex.info material YAML files.

Shared by the runtime ``MaterialFile`` class and the offline catalog builder
(``tools/build_catalog.py``). Parsing semantics mirror the reference
implementation (reference: optiland/materials/material_file.py:446-530):
one formula or tabulated-n block defines the index model; a tabulated-k
block defines extinction; SPECS carries Schott thermal-dispersion
coefficients, reference temperature, and nd/Vd.
"""

from __future__ import annotations

import numpy as np
import yaml

FORMULA_CODES = {
    "formula 1": 1,
    "formula 2": 2,
    "formula 3": 3,
    "formula 4": 4,
    "formula 5": 5,
    "formula 6": 6,
    "formula 7": 7,
    "formula 8": 8,
    "formula 9": 9,
    "tabulated n": 10,
    "tabulated nk": 10,
}


def parse_material_yaml(path: str) -> dict:
    """Parse one material YAML file into numeric payloads."""
    with open(path) as f:
        data = yaml.safe_load(f)

    out = {
        "formula_code": -1,
        "coeffs": np.zeros(0),
        "ntab": np.zeros((0, 2)),
        "ktab": np.zeros((0, 2)),
        "therm": np.zeros(0),
        "t0": np.nan,
        "nd": np.nan,
        "vd": np.nan,
    }

    for sub in data.get("DATA", []) or []:
        t = sub.get("type", "")
        if t.startswith("formula "):
            out["coeffs"] = np.array(
                [float(x) for x in str(sub.get("coefficients", "")).split()]
            )
            out["formula_code"] = FORMULA_CODES[t]
        elif t in ("tabulated n", "tabulated nk", "tabulated k"):
            rows = np.array(
                [
                    [float(v) for v in line.split()]
                    for line in str(sub.get("data", "")).strip().splitlines()
                    if line.strip()
                ]
            )
            if rows.ndim == 1:
                rows = rows.reshape(1, -1)
            if t == "tabulated n":
                out["ntab"] = rows[:, :2]
                if out["formula_code"] < 0:
                    out["formula_code"] = 10
            elif t == "tabulated k":
                out["ktab"] = rows[:, :2]
            else:
                out["ntab"] = rows[:, [0, 1]]
                out["ktab"] = rows[:, [0, 2]]
                if out["formula_code"] < 0:
                    out["formula_code"] = 10

    specs = data.get("SPECS") or {}
    try:
        td = specs.get("thermal_dispersion", [{}])[0]
        if str(td.get("type", "")).startswith("Schott"):
            out["therm"] = np.array(
                [float(x) for x in str(td.get("coefficients", "")).split()]
            )
    except (KeyError, IndexError, TypeError):
        pass
    try:
        out["t0"] = float(str(specs["temperature"]).split(" ")[0])
    except (KeyError, ValueError, TypeError):
        pass
    for key, col in (("nd", "nd"), ("vd", "Vd")):
        try:
            out[key] = float(specs[col])
        except (KeyError, ValueError, TypeError):
            pass
    return out
