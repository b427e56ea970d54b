"""Generate tests/test_paraxial_hardvalues.py + test_materials_hardvalues.py
from the reference implementation (numba stubbed): first-order quantities
of six published sample systems and catalog dispersion values as in-line
literals (reference test style: hard-coded expected numbers per quantity).

Usage: python tools/gen_hardvals_paraxial_r5.py
"""

from __future__ import annotations

import sys
import types

import numpy as np

numba_stub = types.ModuleType("numba")
numba_stub.jit = lambda *a, **k: (
    a[0] if a and callable(a[0]) else (lambda f: f)
)
numba_stub.njit = numba_stub.jit
numba_stub.prange = range
sys.modules.setdefault("numba", numba_stub)
sys.path.insert(0, "/root/reference")

QUANTITIES = (
    "f1", "f2", "F1", "F2", "P1", "P2", "N1", "N2",
    "EPL", "EPD", "XPL", "XPD", "FNO", "magnification", "invariant",
)

SYSTEMS = {
    "CookeTriplet": ("optiland.samples.objectives", "CookeTriplet"),
    "DoubleGauss": ("optiland.samples.objectives", "DoubleGauss"),
    "ReverseTelephoto": ("optiland.samples.objectives", "ReverseTelephoto"),
    "TessarLens": ("optiland.samples.objectives", "TessarLens"),
    "HubbleTelescope": ("optiland.samples.telescopes", "HubbleTelescope"),
    "AsphericSinglet": ("optiland.samples.simple", "AsphericSinglet"),
}

# plain legacy names (F2, SF5) are ambiguous across manufacturers and
# the two implementations may legitimately resolve different catalog
# entries; pin only unambiguous names
GLASSES = (
    "N-BK7", "N-SF11", "SF11", "N-SK16", "N-LAK34",
    "N-SF5", "LITHOTEC-CAF2", "N-BAF10", "N-SSK2", "N-LASF44",
)
WAVELENGTHS = (0.4861, 0.5876, 0.6563)


def main():
    import importlib

    # ---------------- paraxial ----------------
    lines = [
        '"""Hard-coded first-order values of published sample systems,',
        "generated from the reference by tools/gen_hardvals_paraxial_r5.py",
        '(values asserted in-line, reference test style)."""',
        "",
        "import numpy as np",
        "import pytest",
        "",
        "import optiland_tpu.samples as S",
        "",
        "",
        "def _q(lens, name):",
        "    return float(np.ravel(np.asarray(",
        "        getattr(lens.paraxial, name)()))[0])",
        "",
        "",
        "@pytest.fixture(scope='module')",
        "def lenses():",
        "    cache = {}",
        "",
        "    def get(name):",
        "        if name not in cache:",
        "            cache[name] = getattr(S, name)()",
        "        return cache[name]",
        "",
        "    return get",
        "",
    ]
    for sysname, (mod, cls) in SYSTEMS.items():
        lens = getattr(importlib.import_module(mod), cls)()
        for q in QUANTITIES:
            try:
                val = float(np.ravel(np.asarray(getattr(lens.paraxial, q)()))[0])
            except Exception:
                continue
            if not np.isfinite(val):
                continue
            lines += [
                "",
                f"def test_{sysname.lower()}_{q}(lenses):",
                f"    assert _q(lenses('{cls}'), '{q}') == pytest.approx(",
                f"        {val!r}, rel=1e-6, abs=1e-9)",
            ]
    with open("tests/test_paraxial_hardvalues.py", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("paraxial tests written")

    # ---------------- materials ----------------
    from optiland.materials import Material

    lines = [
        '"""Hard-coded catalog dispersion values (n at F/d/C lines),',
        "generated from the reference by tools/gen_hardvals_paraxial_r5.py",
        '(the 40 MB refractiveindex.info snapshot is the shared source)."""',
        "",
        "import numpy as np",
        "import pytest",
        "",
        "from optiland_tpu.materials import Material",
        "",
    ]
    for glass in GLASSES:
        try:
            m = Material(glass)
            vals = [
                float(np.ravel(np.asarray(m.n(w)))[0]) for w in WAVELENGTHS
            ]
        except Exception as err:
            print(f"skip {glass}: {err}")
            continue
        tag = glass.lower().replace("-", "_")
        lines += [
            "",
            f"def test_{tag}_index_lines():",
            f"    m = Material('{glass}')",
        ]
        for w, v in zip(WAVELENGTHS, vals):
            lines += [
                f"    assert float(np.ravel(np.asarray(m.n({w})))[0]) == \\",
                f"        pytest.approx({v!r}, rel=1e-9)",
            ]
    with open("tests/test_materials_hardvalues.py", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("material tests written")


if __name__ == "__main__":
    main()
