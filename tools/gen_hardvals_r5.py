"""Generate tests/test_geometries_hardvalues.py from the reference.

Runs the reference implementation's geometry classes (read-only at
/root/reference, numba stubbed) on fixed coordinate grids and oblique ray
sets, and emits a self-contained test module with the expected values as
hard-coded literals — the reference's own test style
(reference: tests/test_geometries.py, 110 hard-value tests). Unlike the
golden .npz files, these tests carry their expected numbers in-line, so a
regression shows the actual-vs-expected values in the diff.

Usage: python tools/gen_hardvals_r5.py > tests/test_geometries_hardvalues.py
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

from optiland.coordinate_system import CoordinateSystem  # noqa: E402
from optiland.geometries import (  # noqa: E402
    BiconicGeometry,
    ChebyshevPolynomialGeometry,
    EvenAsphere,
    GridSagGeometry,
    OddAsphere,
    Plane,
    PolynomialGeometry,
    StandardGeometry,
    ToroidalGeometry,
    ZernikePolynomialGeometry,
)
from optiland.geometries.forbes.geometry import (  # noqa: E402
    ForbesQ2dGeometry,
    ForbesQbfsGeometry,
    ForbesSurfaceConfig,
)
from optiland.rays import RealRays  # noqa: E402

CS = CoordinateSystem()

# fixed evaluation points (inside every family's normalization region)
XPTS = np.array([0.0, 1.3, -2.1, 3.7, -4.4, 2.9, 0.6, -3.3])
YPTS = np.array([0.0, -1.7, 2.6, 3.1, -3.9, -0.8, 4.2, 1.1])

# oblique ray set for distance tests (launched from z = -4)
RAYX = np.array([0.0, 1.0, -2.0, 3.0, -1.5, 0.5])
RAYY = np.array([0.5, -1.0, 2.0, -2.5, 3.0, 0.0])
RAYL = np.array([0.0, 0.08, -0.12, 0.05, 0.15, -0.02])
RAYM = np.array([0.02, -0.06, 0.10, 0.12, -0.08, 0.0])

GRID_X = np.linspace(-6.0, 6.0, 13)
GRID_Y = np.linspace(-6.0, 6.0, 11)
_gx, _gy = np.meshgrid(GRID_X, GRID_Y)
GRID_SAG_SMOOTH = 2e-3 * (_gx**2 + 0.7 * _gy**2)
_rng = np.random.default_rng(42)
GRID_SAG_ROUGH = GRID_SAG_SMOOTH + 0.02 * _rng.standard_normal(
    GRID_SAG_SMOOTH.shape
)

CMAT_A = [[0, 1e-4, -1e-6], [2e-4, 1e-5, 0], [1e-6, 0, 1e-8]]
CMAT_B = [[5e-4, 0, 2e-6], [0, -3e-5, 0], [-1e-6, 4e-7, 0]]
ZC_A = [0.001, -0.002, 0.0005, 0.0003, 0.0001, 0.0002]
ZC_B = [0.0, 0.004, -0.001, 0.0, 0.0006, -0.0002, 0.0001]

# name -> (reference geometry, our (code_name, radius, conic, coeffs,
#          p1, p2, aux_expr), sag rtol, dist rtol)
CASES = {
    "standard_convex": (
        StandardGeometry(CS, 25.0, 0.0),
        ("STANDARD", 25.0, 0.0, [], 1.0, 1.0, None),
    ),
    "standard_concave_conic": (
        StandardGeometry(CS, -40.0, -1.5),
        ("STANDARD", -40.0, -1.5, [], 1.0, 1.0, None),
    ),
    "even_asphere_a": (
        EvenAsphere(CS, 50.0, -0.5, coefficients=[1e-5, -2e-8, 3e-11]),
        ("EVEN_ASPHERE", 50.0, -0.5, [1e-5, -2e-8, 3e-11], 1.0, 1.0, None),
    ),
    "even_asphere_b": (
        EvenAsphere(CS, -80.0, 0.8, coefficients=[-3e-5, 5e-8]),
        ("EVEN_ASPHERE", -80.0, 0.8, [-3e-5, 5e-8], 1.0, 1.0, None),
    ),
    "odd_asphere_a": (
        OddAsphere(CS, 50.0, -0.5, coefficients=[1e-4, -1e-6, 1e-8]),
        ("ODD_ASPHERE", 50.0, -0.5, [1e-4, -1e-6, 1e-8], 1.0, 1.0, None),
    ),
    "odd_asphere_b": (
        OddAsphere(CS, 120.0, 0.0, coefficients=[-2e-4, 3e-6]),
        ("ODD_ASPHERE", 120.0, 0.0, [-2e-4, 3e-6], 1.0, 1.0, None),
    ),
    "polynomial_a": (
        PolynomialGeometry(CS, 50.0, -0.5, coefficients=CMAT_A),
        ("POLYNOMIAL_XY", 50.0, -0.5, np.ravel(CMAT_A).tolist(),
         1.0, 1.0, None),
    ),
    "polynomial_b": (
        PolynomialGeometry(CS, -60.0, 0.2, coefficients=CMAT_B),
        ("POLYNOMIAL_XY", -60.0, 0.2, np.ravel(CMAT_B).tolist(),
         1.0, 1.0, None),
    ),
    "chebyshev_a": (
        ChebyshevPolynomialGeometry(
            CS, 50.0, -0.5, coefficients=CMAT_A, norm_x=6.0, norm_y=7.0
        ),
        ("CHEBYSHEV", 50.0, -0.5, np.ravel(CMAT_A).tolist(),
         6.0, 7.0, None),
    ),
    "chebyshev_b": (
        ChebyshevPolynomialGeometry(
            CS, 200.0, 0.0, coefficients=CMAT_B, norm_x=8.0, norm_y=5.0
        ),
        ("CHEBYSHEV", 200.0, 0.0, np.ravel(CMAT_B).tolist(),
         8.0, 5.0, None),
    ),
    "zernike_fringe": (
        ZernikePolynomialGeometry(
            CS, 50.0, -0.5, coefficients=ZC_A, zernike_type="fringe",
            norm_radius=8.0,
        ),
        ("ZERNIKE_SAG", 50.0, -0.5, ZC_A, 8.0, 1.0, "('fringe',)"),
    ),
    "zernike_standard": (
        ZernikePolynomialGeometry(
            CS, -90.0, 0.0, coefficients=ZC_B, zernike_type="standard",
            norm_radius=6.5,
        ),
        ("ZERNIKE_SAG", -90.0, 0.0, ZC_B, 6.5, 1.0, "('standard',)"),
    ),
    "toroidal_a": (
        ToroidalGeometry(CS, radius_x=100.0, radius_y=50.0, conic=-0.5,
                         coeffs_poly_y=[1e-5, -1e-8]),
        ("TOROIDAL", 100.0, -0.5, [1e-5, -1e-8], 50.0, -0.5, None),
    ),
    "toroidal_b": (
        ToroidalGeometry(CS, radius_x=-70.0, radius_y=90.0, conic=0.3,
                         coeffs_poly_y=[-2e-5]),
        ("TOROIDAL", -70.0, 0.3, [-2e-5], 90.0, 0.3, None),
    ),
    "biconic_a": (
        BiconicGeometry(CS, radius_x=80.0, radius_y=50.0,
                        conic_x=-0.2, conic_y=-0.8),
        ("BICONIC", 80.0, -0.2, [], 50.0, -0.8, None),
    ),
    "biconic_b": (
        BiconicGeometry(CS, radius_x=-45.0, radius_y=-120.0,
                        conic_x=0.5, conic_y=0.0),
        ("BICONIC", -45.0, 0.5, [], -120.0, 0.0, None),
    ),
    "grid_sag_smooth": (
        GridSagGeometry(CS, GRID_X.tolist(), GRID_Y.tolist(),
                        GRID_SAG_SMOOTH),
        ("GRID_SAG", np.inf, 0.0, GRID_SAG_SMOOTH.ravel().tolist(),
         1.0, 1.0,
         f"('grid', {tuple(GRID_X.tolist())!r}, "
         f"{tuple(GRID_Y.tolist())!r})"),
    ),
    "grid_sag_rough": (
        GridSagGeometry(CS, GRID_X.tolist(), GRID_Y.tolist(),
                        GRID_SAG_ROUGH),
        ("GRID_SAG", np.inf, 0.0, GRID_SAG_ROUGH.ravel().tolist(),
         1.0, 1.0,
         f"('grid', {tuple(GRID_X.tolist())!r}, "
         f"{tuple(GRID_Y.tolist())!r})"),
    ),
    "forbes_qbfs_a": (
        ForbesQbfsGeometry(
            CS, ForbesSurfaceConfig(
                radius=40.0, conic=0.0, norm_radius=10.0,
                terms={0: 1e-4, 1: -2e-5, 2: 3e-6, 4: 1e-7},
            ),
        ),
        ("FORBES_QBFS", 40.0, 0.0, [1e-4, -2e-5, 3e-6, 0.0, 1e-7],
         10.0, 1.0, "('qbfs', 5)"),
    ),
    "forbes_qbfs_b": (
        ForbesQbfsGeometry(
            CS, ForbesSurfaceConfig(
                radius=-150.0, conic=-1.0, norm_radius=7.0,
                terms={1: 5e-5, 3: -1e-6},
            ),
        ),
        ("FORBES_QBFS", -150.0, -1.0, [0.0, 5e-5, 0.0, -1e-6],
         7.0, 1.0, "('qbfs', 4)"),
    ),
    "forbes_q2d_a": (
        ForbesQ2dGeometry(
            CS, ForbesSurfaceConfig(
                radius=40.0, conic=0.0, norm_radius=10.0,
                terms={("a", 0, 0): 5e-5, ("a", 0, 1): -1e-5,
                       ("b", 2, 1): 2e-5},
            ),
        ),
        # sorted by (n, m, ab): (a,0,0)n=0 -> (b,2,1)n=1? layout matches
        # the factory: sorted(key=(n, m, ab)); nms=(n, +/-m)
        ("FORBES_Q2D", 40.0, 0.0, None, 10.0, 1.0, None),
    ),
    "forbes_q2d_b": (
        ForbesQ2dGeometry(
            CS, ForbesSurfaceConfig(
                radius=-200.0, conic=0.5, norm_radius=9.0,
                terms={("a", 1, 0): 3e-5, ("b", 1, 0): -2e-5,
                       ("a", 2, 2): 1e-5},
            ),
        ),
        ("FORBES_Q2D", -200.0, 0.5, None, 9.0, 1.0, None),
    ),
}

Q2D_TERMS = {
    "forbes_q2d_a": {("a", 0, 0): 5e-5, ("a", 0, 1): -1e-5,
                     ("b", 2, 1): 2e-5},
    "forbes_q2d_b": {("a", 1, 0): 3e-5, ("b", 1, 0): -2e-5,
                     ("a", 2, 2): 1e-5},
}


def q2d_encoding(terms):
    nms, vals = [], []
    for (ab, m, n), v in sorted(
        terms.items(), key=lambda kv: (kv[0][2], kv[0][1], kv[0][0])
    ):
        nms.append((n, m if ab.lower() == "a" else -m))
        vals.append(v)
    return vals, tuple(nms)


def lit(arr):
    return "[" + ", ".join(repr(float(v)) for v in np.ravel(arr)) + "]"


def main():
    print('"""Hard-coded geometry value tests, generated from the')
    print("reference implementation by tools/gen_hardvals_r5.py")
    print("(reference test style: tests/test_geometries.py — expected")
    print('numbers in-line, values asserted, not shapes)."""')
    print()
    print("import jax.numpy as jnp")
    print("import numpy as np")
    print()
    print("from optiland_tpu.core import geometry as G")
    print("from tests.conftest import assert_allclose")
    print()
    print(f"XPTS = np.array({lit(XPTS)})")
    print(f"YPTS = np.array({lit(YPTS)})")
    print(f"RAYX = np.array({lit(RAYX)})")
    print(f"RAYY = np.array({lit(RAYY)})")
    print(f"RAYL = np.array({lit(RAYL)})")
    print(f"RAYM = np.array({lit(RAYM)})")
    print("RAYN = np.sqrt(1 - RAYL**2 - RAYM**2)")
    print("RAYZ = np.full_like(RAYX, -4.0)")
    print()
    print("def _args(code, radius, conic, coeffs, p1, p2, aux):")
    print("    return (getattr(G, code), jnp.asarray(radius),")
    print("            jnp.asarray(conic), jnp.asarray(np.asarray(")
    print("            coeffs, float)), jnp.asarray(p1), jnp.asarray(p2),")
    print("            aux)")
    print()

    for name, (ref, ours) in CASES.items():
        code, radius, conic, coeffs, p1, p2, aux = ours
        if code == "FORBES_Q2D":
            vals, nms = q2d_encoding(Q2D_TERMS[name])
            coeffs = vals
            aux = f"('q2d', {nms!r})"
        aux_expr = aux if aux is not None else "None"

        sag = np.asarray(ref.sag(XPTS, YPTS), float)
        if hasattr(ref, "_surface_normal"):
            nx, ny, nz = ref._surface_normal(XPTS, YPTS)
        else:
            nrays = RealRays(
                XPTS.copy(), YPTS.copy(), np.asarray(ref.sag(XPTS, YPTS)),
                np.zeros_like(XPTS), np.zeros_like(XPTS),
                np.ones_like(XPTS), np.ones_like(XPTS),
                np.full_like(XPTS, 0.55),
            )
            nx, ny, nz = ref.surface_normal(nrays)
        if code == "ZERNIKE_SAG":
            # The reference's ZernikeStandard.get_derivative returns HALF
            # the true d/drho for the n=1 terms (verified against a
            # central difference of its own poly()), so its analytic
            # normal disagrees with its own sag. Pin the normal to the
            # numerical derivative of the reference's sag instead — the
            # surface SHAPE is the parity contract; this framework's AD
            # normal is the true derivative of that shape.
            eps = 1e-6
            dzdx = (
                np.asarray(ref.sag(XPTS + eps, YPTS))
                - np.asarray(ref.sag(XPTS - eps, YPTS))
            ) / (2 * eps)
            dzdy = (
                np.asarray(ref.sag(XPTS, YPTS + eps))
                - np.asarray(ref.sag(XPTS, YPTS - eps))
            ) / (2 * eps)
            mag = np.sqrt(dzdx**2 + dzdy**2 + 1)
            nx, ny, nz = dzdx / mag, dzdy / mag, -1.0 / mag
            # exact origin: tilt terms have a well-defined slope there,
            # but both implementations report the vertex as slope-free
            # (the reference through its eps guards, this framework by
            # documented convention) — pin the convention, not the
            # central difference
            origin = (XPTS == 0) & (YPTS == 0)
            nx = np.where(origin, 0.0, nx)
            ny = np.where(origin, 0.0, ny)
            nz = np.where(origin, -1.0, nz)
        if code == "GRID_SAG":
            # The reference's GridSagGeometry reports the normal with the
            # opposite orientation to its own other families (its trace
            # re-aligns the sign against the ray, so behavior is
            # unaffected); this framework keeps one convention — toward
            # -z at the vertex — across all families.
            nx, ny, nz = -np.asarray(nx), -np.asarray(ny), -np.asarray(nz)
        rays = RealRays(
            RAYX.copy(), RAYY.copy(), np.full_like(RAYX, -4.0),
            RAYL.copy(), RAYM.copy(),
            np.sqrt(1 - RAYL**2 - RAYM**2),
            np.ones_like(RAYX), np.full_like(RAYX, 0.55),
        )
        dist = np.asarray(ref.distance(rays), float)

        rlit = "np.inf" if np.isinf(radius) else repr(radius)
        setup = (
            f"    a = _args('{code}', {rlit}, {conic!r},\n"
            f"              {lit(coeffs) if coeffs is not None else '[]'},"
            f" {p1!r}, {p2!r},\n"
            f"              {aux_expr})"
        )
        # grid distance: the reference's grid Newton runs tol=1e-6 only
        dtol = "rtol=2e-6, atol=2e-6" if code == "GRID_SAG" else (
            "rtol=1e-7, atol=1e-9"
        )
        ntol = ("rtol=1e-5, atol=1e-7" if code == "ZERNIKE_SAG"
                else "rtol=1e-6, atol=1e-8")
        print(f"def test_{name}_sag():")
        print(setup)
        print("    got = G.sag_static(a[0], a[1], a[2], a[3],")
        print("                       jnp.asarray(XPTS), jnp.asarray(YPTS),")
        print("                       p1=a[4], p2=a[5], aux=a[6])")
        print(f"    assert_allclose(got, np.array({lit(sag)}),")
        print("                    rtol=1e-9, atol=1e-10)")
        print()
        print(f"def test_{name}_normal():")
        print(setup)
        print("    nx, ny, nz = G.surface_normal_static(")
        print("        a[0], a[1], a[2], a[3],")
        print("        jnp.asarray(XPTS), jnp.asarray(YPTS),")
        print("        p1=a[4], p2=a[5], aux=a[6])")
        print(f"    assert_allclose(nx, np.array({lit(nx)}),")
        print(f"                    {ntol})")
        print(f"    assert_allclose(ny, np.array({lit(ny)}),")
        print(f"                    {ntol})")
        print(f"    assert_allclose(nz, np.array({lit(nz)}),")
        print(f"                    {ntol})")
        print()
        print(f"def test_{name}_distance():")
        print(setup)
        print("    got = G.distance_static(")
        print("        a[0], a[1], a[2], a[3],")
        print("        jnp.asarray(RAYX), jnp.asarray(RAYY),")
        print("        jnp.asarray(RAYZ), jnp.asarray(RAYL),")
        print("        jnp.asarray(RAYM), jnp.asarray(RAYN),")
        print("        p1=a[4], p2=a[5], aux=a[6])")
        print(f"    assert_allclose(got, np.array({lit(dist)}),")
        print(f"                    {dtol})")
        print()

    # plane: distance only
    plane = Plane(CS)
    rays = RealRays(
        RAYX.copy(), RAYY.copy(), np.full_like(RAYX, -4.0),
        RAYL.copy(), RAYM.copy(), np.sqrt(1 - RAYL**2 - RAYM**2),
        np.ones_like(RAYX), np.full_like(RAYX, 0.55),
    )
    dist = np.asarray(plane.distance(rays), float)
    print("def test_plane_distance():")
    print("    got = G.distance_static(")
    print("        G.PLANE, jnp.asarray(np.inf), jnp.asarray(0.0),")
    print("        jnp.zeros(0), jnp.asarray(RAYX), jnp.asarray(RAYY),")
    print("        jnp.asarray(RAYZ), jnp.asarray(RAYL),")
    print("        jnp.asarray(RAYM), jnp.asarray(RAYN))")
    print(f"    assert_allclose(got, np.array({lit(dist)}),")
    print("                    rtol=1e-12, atol=1e-12)")


if __name__ == "__main__":
    main()
