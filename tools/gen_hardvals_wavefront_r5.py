"""Generate tests/test_wavefront_hardvalues.py from the reference:
per-(field, wavelength) OPD arrays on a small hexapolar pupil, plus
standard-Zernike OPD fit coefficients, as in-line literals
(reference: wavefront/strategy.py chief-ray path, analysis ZernikeOPD).

Usage: python tools/gen_hardvals_wavefront_r5.py
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

SYSTEMS = {
    "CookeTriplet": ("optiland.samples.objectives", "CookeTriplet"),
    "DoubleGauss": ("optiland.samples.objectives", "DoubleGauss"),
    "TessarLens": ("optiland.samples.objectives", "TessarLens"),
}
CASES = [((0.0, 0.0), None), ((0.0, 0.7), None), ((0.0, 1.0), None)]
NUM_RAYS = 3  # hexapolar rings -> 19 pupil points


def lit(arr):
    return "[" + ", ".join(repr(float(v)) for v in np.ravel(arr)) + "]"


def main():
    import importlib

    from optiland.wavefront import Wavefront
    from optiland.zernike import ZernikeFit

    lines = [
        '"""Hard-coded chief-ray-referenced OPD values and Zernike fit',
        "coefficients of published sample systems, generated from the",
        "reference by tools/gen_hardvals_wavefront_r5.py (reference:",
        'wavefront/strategy.py:155+, zernike/fit.py:33)."""',
        "",
        "import numpy as np",
        "import pytest",
        "",
        "import optiland_tpu.samples as S",
        "from optiland_tpu.wavefront import Wavefront",
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
        wl = float(np.ravel(np.asarray(
            lens.wavelengths.primary_wavelength.value))[0])
        for (hx, hy), _ in CASES:
            w = Wavefront(
                lens, fields=[(hx, hy)], wavelengths=[wl],
                num_rays=NUM_RAYS, distribution="hexapolar",
            )
            data = w.get_data((hx, hy), wl)
            opd = np.ravel(np.asarray(data.opd, float))
            inten = np.ravel(np.asarray(data.intensity, float))
            mask = inten > 0
            tag = f"{sysname.lower()}_h{int(round(hy * 10)):02d}"
            lines += [
                "",
                f"def test_{tag}_opd(lenses):",
                f"    w = Wavefront(lenses('{cls}'), fields=[({hx!r},"
                f" {hy!r})],",
                f"                  wavelengths=[{wl!r}], num_rays="
                f"{NUM_RAYS},",
                "                  distribution='hexapolar')",
                f"    d = w.get_data(({hx!r}, {hy!r}), {wl!r})",
                "    opd = np.ravel(np.asarray(d.opd, float))",
                "    inten = np.ravel(np.asarray(d.intensity, float))",
                f"    exp = np.array({lit(opd)})",
                f"    exp_mask = np.array({lit(mask.astype(float))}) > 0.5",
                "    live = (inten > 0) & exp_mask",
                "    assert live.sum() >= exp_mask.sum() - 1",
                "    np.testing.assert_allclose(",
                "        opd[live], exp[live], rtol=1e-6, atol=5e-7)",
            ]
        # Zernike fit at the edge field (vignetting-free pupil points)
        w = Wavefront(lens, fields=[(0.0, 1.0)], wavelengths=[wl],
                      num_rays=6, distribution="hexapolar")
        data = w.get_data((0.0, 1.0), wl)
        x = np.ravel(np.asarray(w.distribution.x, float))
        y = np.ravel(np.asarray(w.distribution.y, float))
        opd = np.ravel(np.asarray(data.opd, float))
        keep = np.ravel(np.asarray(data.intensity, float)) > 0
        fit = ZernikeFit(x[keep], y[keep], opd[keep],
                         zernike_type="standard", num_terms=8)
        coeffs = np.ravel(np.asarray(fit.coeffs, float))
        lines += [
            "",
            f"def test_{sysname.lower()}_zernike_fit(lenses):",
            "    from optiland_tpu.zernike import ZernikeFit",
            f"    w = Wavefront(lenses('{cls}'), fields=[(0.0, 1.0)],",
            f"                  wavelengths=[{wl!r}], num_rays=6,",
            "                  distribution='hexapolar')",
            f"    d = w.get_data((0.0, 1.0), {wl!r})",
            "    x = np.ravel(np.asarray(w.distribution.x, float))",
            "    y = np.ravel(np.asarray(w.distribution.y, float))",
            "    opd = np.ravel(np.asarray(d.opd, float))",
            "    keep = np.ravel(np.asarray(d.intensity, float)) > 0",
            "    fit = ZernikeFit(x[keep], y[keep], opd[keep],",
            "                     zernike_type='standard', num_terms=8)",
            "    got = np.ravel(np.asarray(fit.coeffs, float))",
            f"    exp = np.array({lit(coeffs)})",
            "    np.testing.assert_allclose(got, exp, rtol=1e-5,"
            " atol=1e-7)",
        ]
    with open("tests/test_wavefront_hardvalues.py", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wavefront tests written")


if __name__ == "__main__":
    main()
