"""Build the compact optiland_tpu glass catalog from a refractiveindex.info
database snapshot.

The refractiveindex.info database is public-domain (CC0) data. This tool
parses the YAML snapshot shipped with the reference implementation (or any
refractiveindex.info dump laid out the same way) into a compact columnar
format optimized for array-based lookup:

 - ``catalog_index.json``: per-material string metadata (names, references,
   file stems) in catalog order, used for name resolution.
 - ``catalog_arrays.npz``: concatenated numeric payloads (dispersion formula
   coefficients, tabulated n/k data, thermal dispersion coefficients) with
   offset arrays, plus formula codes and wavelength ranges.

Usage:
    python tools/build_catalog.py [--source DIR] [--out DIR]
"""

from __future__ import annotations

import argparse
import csv
import json
import os

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


def parse_material_yaml(path):
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
            else:  # tabulated nk
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", default="/root/reference/optiland/database")
    ap.add_argument(
        "--out", default=os.path.join(os.path.dirname(__file__), "..", "optiland_tpu", "database")
    )
    args = ap.parse_args()

    index_csv = os.path.join(args.source, "catalog_nk.csv")
    with open(index_csv) as f:
        rows = list(csv.DictReader(f))

    meta = []
    formula_code = []
    minw, maxw, t0, nd, vd = [], [], [], [], []
    coeffs_flat, coeffs_off = [], [0]
    ntab_flat, ntab_off = [], [0]
    ktab_flat, ktab_off = [], [0]
    therm_flat, therm_off = [], [0]

    skipped = 0
    for row in rows:
        path = os.path.join(args.source, "data-nk", row["filename"])
        try:
            m = parse_material_yaml(path)
        except Exception:
            skipped += 1
            continue
        meta.append(
            {
                "group": row["group"],
                "category_name": row["category_name"],
                "category_name_full": row["category_name_full"],
                "reference": row["reference"],
                "name": row["name"],
                "filename": row["filename"],
                "filename_no_ext": row["filename_no_ext"],
            }
        )
        formula_code.append(m["formula_code"])

        def _f(v):
            try:
                return float(v)
            except (TypeError, ValueError):
                return np.nan

        minw.append(_f(row.get("min_wavelength")))
        maxw.append(_f(row.get("max_wavelength")))
        t0.append(m["t0"])
        nd.append(m["nd"])
        vd.append(m["vd"])
        coeffs_flat.append(m["coeffs"])
        coeffs_off.append(coeffs_off[-1] + len(m["coeffs"]))
        ntab_flat.append(m["ntab"])
        ntab_off.append(ntab_off[-1] + len(m["ntab"]))
        ktab_flat.append(m["ktab"])
        ktab_off.append(ktab_off[-1] + len(m["ktab"]))
        therm_flat.append(m["therm"])
        therm_off.append(therm_off[-1] + len(m["therm"]))

    os.makedirs(args.out, exist_ok=True)
    np.savez_compressed(
        os.path.join(args.out, "catalog_arrays.npz"),
        formula_code=np.array(formula_code, np.int32),
        min_wavelength=np.array(minw),
        max_wavelength=np.array(maxw),
        t0=np.array(t0),
        nd=np.array(nd),
        vd=np.array(vd),
        coeffs=np.concatenate(coeffs_flat) if coeffs_flat else np.zeros(0),
        coeffs_off=np.array(coeffs_off, np.int64),
        ntab=(np.concatenate(ntab_flat) if ntab_flat else np.zeros((0, 2))),
        ntab_off=np.array(ntab_off, np.int64),
        ktab=(np.concatenate(ktab_flat) if ktab_flat else np.zeros((0, 2))),
        ktab_off=np.array(ktab_off, np.int64),
        therm=np.concatenate(therm_flat) if therm_flat else np.zeros(0),
        therm_off=np.array(therm_off, np.int64),
    )
    with open(os.path.join(args.out, "catalog_index.json"), "w") as f:
        json.dump(meta, f)
    print(f"catalog: {len(meta)} materials written, {skipped} skipped")


if __name__ == "__main__":
    main()
