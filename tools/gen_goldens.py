"""Generate golden parity data by running the reference implementation.

Runs the reference Optiland (read-only at /root/reference) on the sample
systems used by the parity suite and dumps traced rays, paraxial
quantities, and material data to ``tests/goldens/*.npz``. The test suite
then compares optiland_tpu outputs against these goldens without importing
the reference at test time.

Usage: python tools/gen_goldens.py
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np

# The reference uses numba only for optional JIT acceleration; stub it out.
numba_stub = types.ModuleType("numba")
numba_stub.jit = lambda *a, **k: (a[0] if a and callable(a[0]) else (lambda f: f))
numba_stub.njit = numba_stub.jit
numba_stub.prange = range
sys.modules.setdefault("numba", numba_stub)

sys.path.insert(0, "/root/reference")

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")


def paraxial_goldens(lens):
    p = lens.paraxial
    out = {}
    for name in ("f1", "f2", "F1", "F2", "P1", "P2", "N1", "N2",
                 "EPL", "EPD", "XPL", "XPD", "FNO", "magnification",
                 "invariant"):
        out[name] = float(np.ravel(getattr(p, name)())[0])
    ym, um = p.marginal_ray()
    yc, uc = p.chief_ray()
    out["marginal_y"] = np.ravel(np.asarray(ym))
    out["marginal_u"] = np.ravel(np.asarray(um))
    out["chief_y"] = np.ravel(np.asarray(yc))
    out["chief_u"] = np.ravel(np.asarray(uc))
    return out


def trace_goldens(lens, cases):
    out = {}
    for tag, (Hx, Hy, wl, nrings) in cases.items():
        rays = lens.trace(Hx=Hx, Hy=Hy, wavelength=wl, num_rays=nrings,
                          distribution="hexapolar")
        for comp in ("x", "y", "z", "L", "M", "N", "i", "opd"):
            out[f"{tag}_{comp}"] = np.asarray(getattr(rays, comp))
        sg = lens.surfaces
        out[f"{tag}_hist_x"] = np.asarray(sg.x)
        out[f"{tag}_hist_y"] = np.asarray(sg.y)
        out[f"{tag}_hist_z"] = np.asarray(sg.z)
        out[f"{tag}_hist_opd"] = np.asarray(sg.opd)
        out[f"{tag}_hist_intensity"] = np.asarray(sg.intensity)
    return out


def main():
    os.makedirs(OUT, exist_ok=True)

    from optiland.samples.objectives import (
        CookeTriplet,
        DoubleGauss,
        TripletTelescopeObjective,
    )

    cases = {
        "onaxis": (0.0, 0.0, 0.55, 6),
        "field1": (0.0, 1.0, 0.55, 6),
        "field07_blue": (0.0, 0.7, 0.48, 5),
        "fieldx": (0.5, 0.5, 0.65, 4),
    }

    for cls, name in (
        (CookeTriplet, "cooke"),
        (DoubleGauss, "double_gauss"),
        (TripletTelescopeObjective, "triplet_telescope"),
    ):
        lens = cls()
        data = {}
        data.update({f"px_{k}": v for k, v in paraxial_goldens(lens).items()})
        wl = lens.primary_wavelength
        local_cases = dict(cases)
        if name == "double_gauss":
            local_cases = {
                k: (hx, hy, {0.55: 0.5876, 0.48: 0.4861, 0.65: 0.6563}[w], n)
                for k, (hx, hy, w, n) in cases.items()
            }
        if name == "triplet_telescope":
            local_cases = {
                k: (hx, hy, {0.55: 0.5876, 0.48: 0.4861, 0.65: 0.6563}[w], n)
                for k, (hx, hy, w, n) in cases.items()
            }
        data.update(trace_goldens(lens, local_cases))
        np.savez_compressed(os.path.join(OUT, f"{name}.npz"), **data)
        print(f"{name}: {len(data)} arrays")

    # Material goldens
    from optiland.materials import AbbeMaterial, Material

    wls = np.linspace(0.4, 0.75, 36)
    mat_data = {"wavelengths": wls}
    for name, ref in (
        ("SK16", None),
        ("F2", "schott"),
        ("N-BK7", None),
        ("SF1", "schott"),
        ("N-SSK2", None),
        ("F5", "schott"),
        ("N-SK16", None),
    ):
        m = Material(name, ref) if ref else Material(name)
        tag = name.replace("-", "_")
        mat_data[f"{tag}_n"] = np.asarray(m.n(wls))
        mat_data[f"{tag}_k"] = np.asarray(m.k(wls))
    ab = AbbeMaterial(1.6, 60.0, model="polynomial")
    mat_data["abbe_poly_n"] = np.ravel(np.asarray(ab.n(np.linspace(0.4, 0.74, 18))))
    ab2 = AbbeMaterial(1.6, 60.0, model="buchdahl")
    mat_data["abbe_buchdahl_n"] = np.ravel(np.asarray(ab2.n(wls)))
    np.savez_compressed(os.path.join(OUT, "materials.npz"), **mat_data)
    print(f"materials: {len(mat_data)} arrays")


if __name__ == "__main__":
    main()
