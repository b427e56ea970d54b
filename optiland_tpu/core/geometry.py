"""Geometry kernels: sag, surface normal, and ray-surface intersection.

Each geometry family has an integer code; dispatch inside the unrolled
trace loop is *static* (the code is part of the system structure), so each
surface's physics compiles to a pure elementwise expression — replacing the
reference's Python polymorphism over BaseGeometry subclasses
(reference: optiland/geometries/base.py:15-115).

Unified per-surface parameter record:
    radius:  base radius of curvature (inf for planes)
    conic:   conic constant
    coeffs:  (NC,) zero-padded geometry coefficient vector
    p1, p2:  two extra scalars (second radius/conic, normalization radii...)
    aux:     static hashable extras (e.g. zernike scheme), resolved at trace

Closed-form intersections exist for planes and conics (reference:
optiland/geometries/plane.py, standard.py:96-148); every other sag family
uses Newton iterations from the conic initial guess (reference:
optiland/geometries/newton_raphson.py:119-168) with a fixed iteration count
for XLA-friendly control flow. Surface normals derive from the sag by
forward-mode autodiff (mathematically identical to the reference's analytic
formulas for smooth sags).

Family coefficient conventions (matching the reference):
    EVEN_ASPHERE:  z += sum_i C_i r^(2i+2)            (even_asphere.py)
    ODD_ASPHERE:   z += sum_i C_i r^(i+1)             (odd_asphere.py)
    POLYNOMIAL_XY: z += sum_ij C[i,j] x^i y^j         (polynomial.py:105)
                   coeffs = row-major square matrix, side = ceil(sqrt(NC))
    CHEBYSHEV:     z += sum_ij C[i,j] T_i(x/p1) T_j(y/p2)   (chebyshev.py:126)
    ZERNIKE_SAG:   z += sum_i c_i Z_i(r/p1, phi)      (zernike.py:55)
    TOROIDAL:      x-rotated y-z conic + y-polynomial; radius = R_rot,
                   p1 = R_yz, p2 = k_yz, coeffs[i] -> y^(2(i+1)) (toroidal.py)
    BICONIC:       x/y conic sum; radius = Rx, conic = kx, p1 = Ry,
                   p2 = ky (biconic.py:69)
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

# Geometry codes (stable; serialized in system configs)
PLANE = 0
STANDARD = 1
EVEN_ASPHERE = 2
ODD_ASPHERE = 3
POLYNOMIAL_XY = 4
CHEBYSHEV = 5
ZERNIKE_SAG = 6
TOROIDAL = 7
BICONIC = 8
FORBES_QBFS = 9
FORBES_Q2D = 10
GRID_SAG = 11
NURBS = 12

# Number of Newton iterations for aspheric/freeform intersection. The conic
# initial guess converges quadratically; 16 iterations reach f64 roundoff
# for all practical prescriptions (reference uses tol=1e-10, max_iter=100).
NEWTON_ITERS = 16


# ---------------------------------------------------------------------------
# Sag functions: sag(radius, conic, coeffs, p1, p2, x, y) -> z
# ---------------------------------------------------------------------------


def _sag_plane(radius, conic, coeffs, p1, p2, x, y, aux=None):
    return jnp.zeros_like(x)


def _conic_sag(radius, conic, x2py2):
    # Curvature form: cu = 1/R is exactly 0 for a flat (R = inf), which keeps
    # both the forward value and its AD derivatives finite — the radius form
    # R*(1+sqrt(...)) produces inf/inf = NaN under jvp when R = inf
    # (reference: geometries/standard.py:80-94 uses the radius form and
    # relies on never seeing an infinite base radius on the Newton path).
    cu = 1.0 / radius
    return (cu * x2py2) / (1 + jnp.sqrt(1 - (1 + conic) * cu**2 * x2py2))


def _sag_standard(radius, conic, coeffs, p1, p2, x, y, aux=None):
    return _conic_sag(radius, conic, x**2 + y**2)


def _sag_even_asphere(radius, conic, coeffs, p1, p2, x, y, aux=None):
    r2 = x**2 + y**2
    z = _conic_sag(radius, conic, r2)
    acc = jnp.zeros_like(x)
    for i in range(coeffs.shape[0] - 1, -1, -1):
        acc = acc * r2 + coeffs[i]
    return z + acc * r2


def _sag_odd_asphere(radius, conic, coeffs, p1, p2, x, y, aux=None):
    # safe-sqrt double-where: sqrt(x^2+y^2)'s AD is NaN at the exact
    # origin; the reference's normal there is 0 (a vertex is treated as
    # slope-free), so guard the radicand and pin the origin's sag term
    r2 = x**2 + y**2
    at0 = r2 == 0
    r = jnp.where(at0, 0.0, jnp.sqrt(jnp.where(at0, 1.0, r2)))
    z = _conic_sag(radius, conic, r2)
    acc = jnp.zeros_like(x)
    for i in range(coeffs.shape[0] - 1, -1, -1):
        acc = acc * r + coeffs[i]
    return z + acc * r


def _sag_polynomial_xy(radius, conic, coeffs, p1, p2, x, y, aux=None):
    """Conic + sum_ij C[i,j] x^i y^j (reference: polynomial.py:105-121)."""
    z = _conic_sag(radius, conic, x**2 + y**2)
    side = int(math.isqrt(coeffs.shape[0]))
    if side * side < coeffs.shape[0]:
        side += 1
    # y-direction Horner per x-power, then x-direction Horner
    acc = jnp.zeros_like(x)
    for i in range(side - 1, -1, -1):
        row = jnp.zeros_like(y)
        for j in range(side - 1, -1, -1):
            idx = i * side + j
            c = coeffs[idx] if idx < coeffs.shape[0] else 0.0
            row = row * y + c
        acc = acc * x + row
    return z + acc


def _chebyshev_eval(n_max: int, t):
    """T_0..T_n_max at t via the recurrence (static order)."""
    terms = [jnp.ones_like(t)]
    if n_max >= 1:
        terms.append(t)
    for _ in range(2, n_max + 1):
        terms.append(2 * t * terms[-1] - terms[-2])
    return terms


def _sag_chebyshev(radius, conic, coeffs, p1, p2, x, y, aux=None):
    """Conic + sum_ij C[i,j] T_i(x/norm_x) T_j(y/norm_y)
    (reference: chebyshev.py:126-151)."""
    z = _conic_sag(radius, conic, x**2 + y**2)
    side = int(math.isqrt(coeffs.shape[0]))
    if side * side < coeffs.shape[0]:
        side += 1
    tx = _chebyshev_eval(side - 1, x / p1)
    ty = _chebyshev_eval(side - 1, y / p2)
    acc = jnp.zeros_like(x)
    for i in range(side):
        for j in range(side):
            idx = i * side + j
            if idx < coeffs.shape[0]:
                acc = acc + coeffs[idx] * tx[i] * ty[j]
    return z + acc


def _sag_zernike(radius, conic, coeffs, p1, p2, x, y, aux=None):
    """Conic + Zernike polynomial sum over normalized coordinates
    (reference: zernike.py:55-200)."""
    from optiland_tpu.zernike import ZERNIKE_CLASSES

    scheme = (aux or ("standard",))[0]
    r2 = x**2 + y**2
    z = _conic_sag(radius, conic, r2)
    zern = ZERNIKE_CLASSES[scheme](coeffs=coeffs)
    # safe sqrt/atan2 at the exact origin: their AD is NaN there, and the
    # reference reports a slope-free vertex (normal (0, 0, -1))
    at0 = r2 == 0
    rho = jnp.where(at0, 0.0, jnp.sqrt(jnp.where(at0, 1.0, r2))) / p1
    phi = jnp.arctan2(y, jnp.where(at0, 1.0, x))
    return z + zern.poly(rho, phi)


def _toroidal_zy(p1, p2, coeffs, y):
    """Base Y-Z curve: conic of radius p1, conic p2, plus even polynomial
    (reference: toroidal.py:86-123)."""
    y2 = y**2
    c = jnp.where(jnp.isinf(p1), 0.0, 1.0 / jnp.where(jnp.isinf(p1), 1.0, p1))
    root = jnp.maximum(1.0 - (1.0 + p2) * c**2 * y2, 0.0)
    denom = 1.0 + jnp.sqrt(root)
    z_y = c * y2 / denom
    acc = jnp.zeros_like(y)
    for i in range(coeffs.shape[0] - 1, -1, -1):
        acc = acc * y2 + coeffs[i]
    return z_y + acc * y2


def _sag_toroidal(radius, conic, coeffs, p1, p2, x, y, aux=None):
    """Toroid: y-z profile rotated about an axis at distance R_rot
    (reference: toroidal.py:162-190). radius=R_rot, p1=R_yz, p2=k_yz."""
    z_y = _toroidal_zy(p1, p2, coeffs, y)
    R = radius
    inside = (R - z_y) ** 2 - x**2
    z = z_y + (R - z_y) - jnp.sign(R - z_y) * jnp.sqrt(
        jnp.where(inside < 0, jnp.nan, inside)
    )
    return jnp.where(jnp.isinf(R), z_y, z)


def _sag_biconic(radius, conic, coeffs, p1, p2, x, y, aux=None):
    """Biconic: separable x/y conic profiles (reference: biconic.py:69-102).
    radius=Rx, conic=kx, p1=Ry, p2=ky."""
    cx = jnp.where(jnp.isinf(radius), 0.0, 1.0 / jnp.where(jnp.isinf(radius), 1.0, radius))
    cy = jnp.where(jnp.isinf(p1), 0.0, 1.0 / jnp.where(jnp.isinf(p1), 1.0, p1))
    rx = jnp.maximum(1.0 - (1.0 + conic) * cx**2 * x**2, 0.0)
    ry = jnp.maximum(1.0 - (1.0 + p2) * cy**2 * y**2, 0.0)
    dx = 1.0 + jnp.sqrt(rx)
    dy = 1.0 + jnp.sqrt(ry)
    return cx * x**2 / dx + cy * y**2 / dy


def _forbes_base_sag(radius, conic, r2):
    """Base conic sag with clamped root
    (reference: forbes/geometry.py:95-105 _base_sag)."""
    sqrt_arg = 1 - (1 + conic) * r2 / radius**2
    safe = jnp.sqrt(jnp.where(sqrt_arg < 0, 0.0, sqrt_arg))
    z = r2 / (radius * (1 + safe))
    return jnp.where(jnp.isinf(radius), jnp.zeros_like(r2), z)


def _forbes_conic_factor(radius, conic, r2):
    """phi = sqrt((1 - k c^2 r^2)/(1 - (k+1) c^2 r^2))
    (reference: forbes/geometry.py:110-131)."""
    c2 = jnp.where(jnp.isinf(radius), 0.0, 1.0 / radius**2)
    num = jnp.maximum(1 - conic * c2 * r2, 1e-12)
    den = jnp.maximum(1 - (conic + 1) * c2 * r2, 1e-12)
    return jnp.sqrt(num) / jnp.sqrt(den)


def _sag_forbes_qbfs(radius, conic, coeffs, p1, p2, x, y, aux=None):
    """Forbes Q (slope-orthogonal) asphere: base conic + phi u^2(1-u^2)
    sum a_m Q_m(u^2) (reference: forbes/geometry.py:132-287). p1 =
    norm_radius; aux = ("qbfs", n_terms)."""
    from optiland_tpu.core import forbes

    n_terms = aux[1]
    r2 = x**2 + y**2
    z_base = _forbes_base_sag(radius, conic, r2)
    usq = r2 / (p1 * p1)
    cs = [coeffs[i] for i in range(n_terms)]
    poly = forbes.clenshaw_qbfs(cs, usq)
    departure = usq * (1 - usq) * _forbes_conic_factor(radius, conic, r2) * poly
    return z_base + jnp.where(usq > 1, 0.0, departure)


def _sag_forbes_q2d(radius, conic, coeffs, p1, p2, x, y, aux=None):
    """Forbes Q2d freeform: base conic + phi * [u^2(1-u^2) S_0 +
    sum_m u^m (cos/sin) S_m] (reference: forbes/geometry.py:445-596).
    p1 = norm_radius; aux = ("q2d", nms) with nms the static (n, m_signed)
    layout of the coefficient vector."""
    from optiland_tpu.core import forbes

    nms = aux[1]
    cm0_slots, a_slots, b_slots = forbes.q2d_partition(nms)
    r2 = x**2 + y**2
    z_base = _forbes_base_sag(radius, conic, r2)
    # u^m cos(m theta) / u^m sin(m theta) are computed in CARTESIAN form via
    # the (x + iy)^m recurrence: polynomials in (x, y), so forward-mode
    # autodiff (surface normals) is regular at the vertex where the polar
    # parametrization the reference differentiates analytically is singular.
    usq = (r2 + 1e-12) / (p1 * p1)  # epsilon matches reference rho floor

    zero = jnp.zeros_like(usq)

    def slot_vals(slots):
        return [coeffs[i] if i is not None else 0.0 for i in slots]

    poly_m0 = (
        forbes.clenshaw_qbfs(slot_vals(cm0_slots), usq)
        if cm0_slots else zero
    )
    poly_gt0 = zero
    c_m = jnp.ones_like(usq)  # u^m cos(m theta) for m = 0
    s_m = zero  # u^m sin(m theta) for m = 0
    c1, s1 = x / p1, y / p1
    max_m = max(set(a_slots) | set(b_slots), default=0)
    for m in range(1, max_m + 1):
        c_m, s_m = c_m * c1 - s_m * s1, s_m * c1 + c_m * s1
        s_a = (
            forbes.q2d_series_sum(slot_vals(a_slots[m]), m, usq)
            if m in a_slots else zero
        )
        s_b = (
            forbes.q2d_series_sum(slot_vals(b_slots[m]), m, usq)
            if m in b_slots else zero
        )
        poly_gt0 = poly_gt0 + c_m * s_a + s_m * s_b
    phi = _forbes_conic_factor(radius, conic, r2)
    departure = usq * (1 - usq) * phi * poly_m0 + phi * poly_gt0
    return z_base + jnp.where(usq > 1, 0.0, departure)


def _hat_weights(g, q):
    """P1 (piecewise-linear FEM hat) basis weights of query points ``q``
    on the monotone node vector ``g``: (R, n) with exactly the two cell
    nodes nonzero. Equivalent to bilinear interpolation weights on any
    monotone grid, but expressed WITHOUT gathers — the downstream
    contraction is a matmul, which maps to the TPU MXU (per-ray
    searchsorted+gather lowers to serialized dynamic-gathers, and its
    transpose to scatter-adds, both slow on TPU)."""
    dl = jnp.diff(g)  # (n-1,) left-cell widths of nodes 1..n-1
    dxl = jnp.concatenate([dl[:1], dl])  # width of the cell left of node k
    dxr = jnp.concatenate([dl, dl[-1:]])  # width of the cell right of node k
    d = q[:, None] - g[None, :]
    w = jnp.minimum(1.0 + d / dxl[None, :], 1.0 - d / dxr[None, :])
    return jnp.maximum(w, 0.0)


def _grid_arrays(coeffs, aux):
    xg = jnp.asarray(np.asarray(aux[1]))
    yg = jnp.asarray(np.asarray(aux[2]))
    ny, nx_ = yg.shape[0], xg.shape[0]
    return xg, yg, coeffs[: ny * nx_].reshape(ny, nx_)


def _grid_cells(g, q):
    """Cell index of each query on the monotone node vector ``g`` (clipped
    to interior cells so out-of-grid queries extrapolate the edge cell;
    callers apply the NaN mask afterwards)."""
    idx = jnp.searchsorted(g, q, side="right") - 1
    return jnp.clip(idx, 0, g.shape[0] - 2)


def _grid_bilinear_coeffs(xg, yg, sg, xq, yq):
    """Value and partial derivatives (s0, sx, sy, sxy) of the bilinear
    interpolant at cell-interior query points — the cell's bilinear
    coefficients in disguise (sxy is the cell's constant cross term).

    TPU: two shared (R, ny)x(ny, nx) MXU contractions of hat weights and
    their in-cell derivatives (jvp of _hat_weights) — no gathers. Other
    backends: 4-corner gather (O(R) memory; the (R, n) hat matrices are an
    O(R*n) blow-up that only pays off where the MXU/no-gather argument
    holds — advisor finding r4)."""
    if jax.default_backend() == "tpu":
        one = jnp.ones_like(xq)
        wx, dwx = jax.jvp(lambda q: _hat_weights(xg, q), (xq,), (one,))
        wy, dwy = jax.jvp(
            lambda q: _hat_weights(yg, q), (yq,), (jnp.ones_like(yq),)
        )
        wx, dwx = wx.astype(sg.dtype), dwx.astype(sg.dtype)
        p1 = wy.astype(sg.dtype) @ sg  # (R, nx)
        p2 = dwy.astype(sg.dtype) @ sg
        s0 = jnp.sum(p1 * wx, axis=-1)
        sx = jnp.sum(p1 * dwx, axis=-1)
        sy = jnp.sum(p2 * wx, axis=-1)
        sxy = jnp.sum(p2 * dwx, axis=-1)
        return s0, sx, sy, sxy
    ix = _grid_cells(xg, xq)
    iy = _grid_cells(yg, yq)
    x0, x1 = jnp.take(xg, ix), jnp.take(xg, ix + 1)
    y0, y1 = jnp.take(yg, iy), jnp.take(yg, iy + 1)
    nx_ = xg.shape[0]
    flat = sg.reshape(-1)
    s00 = jnp.take(flat, iy * nx_ + ix)
    s01 = jnp.take(flat, iy * nx_ + ix + 1)
    s10 = jnp.take(flat, (iy + 1) * nx_ + ix)
    s11 = jnp.take(flat, (iy + 1) * nx_ + ix + 1)
    dx = x1 - x0
    dy = y1 - y0
    fx = (xq - x0) / dx
    fy = (yq - y0) / dy
    s0 = (1 - fy) * ((1 - fx) * s00 + fx * s01) + fy * (
        (1 - fx) * s10 + fx * s11
    )
    sx = ((1 - fy) * (s01 - s00) + fy * (s11 - s10)) / dx
    sy = ((1 - fx) * (s10 - s00) + fx * (s11 - s01)) / dy
    sxy = (s11 - s10 - s01 + s00) / (dx * dy)
    return s0, sx, sy, sxy


def _sag_grid(radius, conic, coeffs, p1, p2, x, y, aux=None):
    """Bilinear grid sag (reference: grid_sag.py:33-104). aux = ("grid",
    x_grid, y_grid) as static tuples; the sag VALUES live in the coeff
    vector (row-major, shape (ny, nx)) so they stay differentiable and can
    be grid_sag optimization variables. Out-of-grid points are NaN.

    On TPU, evaluated as a hat-basis contraction z = Wy·SG·Wx per ray
    (exactly bilinear on the cell, since only the two spanning hats are
    nonzero): the (R, n)x(n, n) products run on the MXU and the VJP w.r.t.
    the grid values is a matmul instead of a scatter-add. Other backends
    use the O(R)-memory 4-corner gather (advisor finding r4)."""
    xg, yg, sg = _grid_arrays(coeffs, aux)
    shp = x.shape
    xq = x.reshape(-1)
    yq = y.reshape(-1)
    if jax.default_backend() == "tpu":
        wx = _hat_weights(xg, xq).astype(sg.dtype)  # (R, nx)
        wy = _hat_weights(yg, yq).astype(sg.dtype)  # (R, ny)
        sag = jnp.sum((wy @ sg) * wx, axis=-1).reshape(shp)
    else:
        sag = _grid_bilinear_coeffs(xg, yg, sg, xq, yq)[0].reshape(shp)
    oob = (x < xg[0]) | (x > xg[-1]) | (y < yg[0]) | (y > yg[-1])
    return jnp.where(oob, jnp.nan, sag)


def _sag_nurbs(radius, conic, coeffs, p1, p2, x, y, aux=None):
    """NURBS surface sag (reference: nurbs/nurbs_geometry.py:733-762)."""
    from optiland_tpu.core import nurbs

    return nurbs.sag(coeffs, aux, x, y)


_SAG_FNS = {
    PLANE: _sag_plane,
    STANDARD: _sag_standard,
    EVEN_ASPHERE: _sag_even_asphere,
    ODD_ASPHERE: _sag_odd_asphere,
    POLYNOMIAL_XY: _sag_polynomial_xy,
    CHEBYSHEV: _sag_chebyshev,
    ZERNIKE_SAG: _sag_zernike,
    TOROIDAL: _sag_toroidal,
    BICONIC: _sag_biconic,
    FORBES_QBFS: _sag_forbes_qbfs,
    FORBES_Q2D: _sag_forbes_q2d,
    GRID_SAG: _sag_grid,
    NURBS: _sag_nurbs,
}

# Families whose intersection has a closed form
_CLOSED_FORM = {PLANE, STANDARD}

# ---------------------------------------------------------------------------
# User-defined surface families
# (reference capability: docs/examples/Tutorial_10a_Custom_Surface_Types and
# subclassing optiland/geometries/base.py:15-115 — here a single sag
# function is enough: normals, intersection, and gradients are derived)
# ---------------------------------------------------------------------------

CUSTOM_GEOMETRIES: dict[str, int] = {}
_CUSTOM_CODE_BASE = 100
_RESERVED_TYPE_NAMES = frozenset({
    "standard", "plane", "even_asphere", "odd_asphere", "polynomial",
    "chebyshev", "zernike", "toroidal", "biconic", "paraxial",
    "forbes_qbfs", "forbes_q2d", "grid_sag", "nurbs", "grating",
})


def register_geometry(name: str, sag_fn) -> int:
    """Register a user-defined sag family as ``surface_type=name``.

    ``sag_fn(radius, conic, coeffs, p1, p2, x, y, aux=None)`` must return
    the surface sag z(x, y) using ``jax.numpy`` math. Everything else is
    derived automatically by the static dispatchers:

    * normals — forward-mode autodiff of the sag (`surface_normal_static`);
    * intersection — the generic Newton solve from the base-conic guess
      with a single differentiable implicit-function-theorem correction
      (`distance_static`), so ``jax.grad`` flows through the trace;
    * the scan/Pallas fast paths keep their static family sets — custom
      families trace on the unrolled XLA engine.

    ``coeffs`` arrives zero-padded to the system-wide coefficient width,
    so the sag must treat trailing zeros as absent terms (polynomial-style
    conventions do this naturally). ``aux`` is the static hashable extra
    passed to ``surfaces.add(..., aux=...)``.

    Returns the integer geometry code. Re-registering a name keeps its
    code (systems already compiled stay valid) and swaps the function.
    """
    if name in _RESERVED_TYPE_NAMES:
        raise ValueError(f"surface_type {name!r} is a built-in family")
    if name in CUSTOM_GEOMETRIES:
        code = CUSTOM_GEOMETRIES[name]
    else:
        code = _CUSTOM_CODE_BASE + len(CUSTOM_GEOMETRIES)
        CUSTOM_GEOMETRIES[name] = code
    _SAG_FNS[code] = sag_fn
    return code


def sag_static(code: int, radius, conic, coeffs, x, y, p1=1.0, p2=1.0, aux=None):
    """Surface sag at local coordinates (x, y) for a static geometry code."""
    return _SAG_FNS[code](radius, conic, coeffs, p1, p2, x, y, aux=aux)


# ---------------------------------------------------------------------------
# Surface normals (forward-mode autodiff of the sag)
# ---------------------------------------------------------------------------


def _normal_plane(x_like):
    zeros = jnp.zeros_like(x_like)
    return zeros, zeros, -jnp.ones_like(x_like)


def _normal_standard(radius, conic, x, y):
    # rsqrt keeps this on one transcendental op per normalization instead
    # of sqrt-then-divide chains — the VPU-bound Pallas trace kernel runs
    # this per ray per surface.
    r2 = x**2 + y**2
    cu = 1.0 / radius
    inv_denom = cu * lax.rsqrt(1 - (1 + conic) * cu**2 * r2)
    dfdx = x * inv_denom
    dfdy = y * inv_denom
    inv_mag = lax.rsqrt(dfdx**2 + dfdy**2 + 1)
    return dfdx * inv_mag, dfdy * inv_mag, -inv_mag


def _normal_chebyshev(radius, conic, coeffs, p1, p2, x, y):
    """Chebyshev surface normal replicating the reference's convention: the
    polynomial derivative is taken w.r.t. the *normalized* coordinate with
    no 1/norm chain-rule factor (reference: chebyshev.py:154-195 — traced
    rays use this normal, so parity requires matching it exactly)."""
    xn = x / p1
    yn = y / p2
    r2 = x**2 + y**2
    cu = 1.0 / radius
    inv_denom = cu / jnp.sqrt(1 - (1 + conic) * cu**2 * r2)
    dzdx = x * inv_denom
    dzdy = y * inv_denom
    side = int(math.isqrt(coeffs.shape[0]))
    if side * side < coeffs.shape[0]:
        side += 1
    tx = _chebyshev_eval(side - 1, xn)
    ty = _chebyshev_eval(side - 1, yn)

    def dT(n, t):
        if n == 0:
            return jnp.zeros_like(t)
        return n * jnp.sin(n * jnp.arccos(jnp.clip(t, -1.0, 1.0))) / jnp.sqrt(
            jnp.maximum(1 - t**2, 1e-14)
        )

    for i in range(side):
        for j in range(side):
            idx = i * side + j
            if idx < coeffs.shape[0]:
                dzdx = dzdx + dT(i, xn) * coeffs[idx] * ty[j]
                dzdy = dzdy + dT(j, yn) * coeffs[idx] * tx[i]
    mag = jnp.sqrt(dzdx**2 + dzdy**2 + 1)
    return dzdx / mag, dzdy / mag, -1.0 / mag


def surface_normal_static(
    code: int, radius, conic, coeffs, x, y, p1=1.0, p2=1.0, aux=None
):
    """Unit surface normal at local (x, y), pointing toward -z at the vertex."""
    if code == PLANE:
        return _normal_plane(x)
    if code == STANDARD:
        return _normal_standard(radius, conic, x, y)
    if code == CHEBYSHEV:
        return _normal_chebyshev(radius, conic, coeffs, p1, p2, x, y)
    if code == NURBS:
        from optiland_tpu.core import nurbs

        return nurbs.surface_normal(coeffs, aux, x, y)
    if code == GRID_SAG:
        # one shared pair of contractions instead of two jvp'd sag
        # evaluations (identical math: derivative of the interpolant)
        xg, yg, sg = _grid_arrays(coeffs, aux)
        shp = x.shape
        _, dfdx, dfdy, _ = _grid_bilinear_coeffs(
            xg, yg, sg, x.reshape(-1), y.reshape(-1)
        )
        dfdx = dfdx.reshape(shp)
        dfdy = dfdy.reshape(shp)
        inv_mag = lax.rsqrt(dfdx**2 + dfdy**2 + 1)
        return dfdx * inv_mag, dfdy * inv_mag, -inv_mag
    sag_fn = _SAG_FNS[code]
    f = lambda xx, yy: sag_fn(radius, conic, coeffs, p1, p2, xx, yy, aux=aux)
    _, dfdx = jax.jvp(f, (x, y), (jnp.ones_like(x), jnp.zeros_like(y)))
    _, dfdy = jax.jvp(f, (x, y), (jnp.zeros_like(x), jnp.ones_like(y)))
    inv_mag = lax.rsqrt(dfdx**2 + dfdy**2 + 1)
    return dfdx * inv_mag, dfdy * inv_mag, -inv_mag


# ---------------------------------------------------------------------------
# Intersection distances
# ---------------------------------------------------------------------------


def _distance_plane(x, y, z, L, M, N):
    N_safe = jnp.where(jnp.abs(N) > 1e-14, N, 1e-14)
    return -z / N_safe


def _distance_standard(radius, conic, x, y, z, L, M, N):
    """Closed-form conic intersection, choosing the root nearest the vertex
    plane (reference: geometries/standard.py:96-148)."""
    # Curvature form (all coefficients scaled by cu = 1/R relative to the
    # reference's): identical roots for finite R, and degrades smoothly to
    # the plane equation -2*N*t - 2*z = 0 when R = inf (cu = 0) instead of
    # producing inf - inf = NaN.
    k = conic
    cu = 1.0 / radius
    a = cu * (k * N**2 + L**2 + M**2 + N**2)
    b = 2 * (cu * (k * N * z + L * x + M * y + N * z) - N)
    c = cu * (k * z**2 + x**2 + y**2 + z**2) - 2 * z
    d = b**2 - 4 * a * c
    sqrt_d = jnp.sqrt(jnp.maximum(d, 0.0))
    sqrt_d = jnp.where(d < 0, jnp.nan, sqrt_d)
    # Citardauq-stable root pair: q/a and c/q; c/q stays finite as a -> 0.
    s = jnp.where(b >= 0, 1.0, -1.0)
    q = -0.5 * (b + s * sqrt_d)
    q_safe = jnp.where(q == 0, 1.0, q)
    a_safe = jnp.where(a == 0, 1.0, a)
    t1 = jnp.where(a == 0, jnp.inf, q / a_safe)
    t2 = jnp.where(q == 0, 0.0, c / q_safe)
    z1 = z + t1 * N
    z2 = z + t2 * N
    return jnp.where(jnp.abs(z1) <= jnp.abs(z2), t1, t2)


def _quad_tau(A, B, C):
    """Stable root of Aτ² + Bτ + C = 0 nearest τ = 0 (Citardauq pairing);
    disc < 0 (saddle cell the ray misses locally) degrades to a plain
    Newton step −C/B so the next refinement pass can re-anchor."""
    disc = B * B - 4 * A * C
    sqrt_d = jnp.sqrt(jnp.maximum(disc, 0.0))
    sgn = jnp.where(B >= 0, 1.0, -1.0)
    q = -0.5 * (B + sgn * sqrt_d)
    q_safe = jnp.where(q == 0, 1.0, q)
    a_safe = jnp.where(A == 0, 1.0, A)
    tau1 = jnp.where(A == 0, jnp.inf, q / a_safe)
    tau2 = jnp.where(q == 0, 0.0, C / q_safe)
    tau = jnp.where(jnp.abs(tau1) < jnp.abs(tau2), tau1, tau2)
    b_safe = jnp.where(jnp.abs(B) > 1e-14, B, 1e-14)
    tau = jnp.where(disc >= 0, tau, -C / b_safe)
    return jnp.where(jnp.isfinite(tau), tau, 0.0)


def _intersect_grid(coeffs, x, y, z, L, M, N, aux):
    """Closed-form grid-sag intersection AND normal from three coefficient
    extractions total.

    Within a cell the bilinear interpolant makes
    f(τ) = z + τN − S(x + τL, y + τM) exactly QUADRATIC in the step τ
    (S = a + bx + cy + dxy ⇒ Aτ² + Bτ + C with A = −LM·Sxy,
    B = N − L·Sx − M·Sy, C = z − S), so the intersection needs no Newton
    loop: two stop-gradient cell-refinement passes (the second re-derives
    the cell at the first root, catching rays whose plane guess landed a
    cell off), then ONE differentiable extraction at the converged root
    that yields the IFT Newton correction (f = zq − s0, f' = B — no jvp
    needed: the directional derivative is closed-form) and the surface
    normal ((−Sx, −Sy, 1) normalized — the same derivative the generic
    path takes by AD of the sag) in the same pass. Replaces 16 Newton
    iterations x jvp of the O(R·n) hat contraction plus a separate
    2-jvp normal evaluation (reference semantics: grid_sag.py:33-104 +
    newton_raphson.py:119-168, which iterates the same bilinear surface
    to tol 1e-10 — the exact cell root is that limit)."""
    xg, yg, sg = _grid_arrays(coeffs, aux)
    shp = x.shape

    def extract(sgv, xq, yq):
        parts = _grid_bilinear_coeffs(
            xg, yg, sgv, xq.reshape(-1), yq.reshape(-1)
        )
        return tuple(p.reshape(shp) for p in parts)

    xs, ys, zs, Ls, Ms, Ns, sgs = (
        lax.stop_gradient(a) for a in (x, y, z, L, M, N, sg)
    )
    t = lax.stop_gradient(_distance_plane(x, y, z, L, M, N))
    for _ in range(2):
        s0, sx, sy, sxy = extract(sgs, xs + t * Ls, ys + t * Ms)
        A = -Ls * Ms * sxy
        B = Ns - Ls * sx - Ms * sy
        C = (zs + t * Ns) - s0
        t = t + _quad_tau(A, B, C)

    # differentiable pass at the converged root: IFT correction + normal
    s0, sx, sy, _ = extract(sg, x + t * L, y + t * M)
    dfdt = lax.stop_gradient(N - L * sx - M * sy)
    dfdt = jnp.where(jnp.abs(dfdt) > 1e-14, dfdt, 1e-14)
    t = t - ((z + t * N) - s0) / dfdt

    # out-of-grid rays: NaN, matching _sag_grid's mask semantics
    xq = x + t * L
    yq = y + t * M
    oob = (xq < xg[0]) | (xq > xg[-1]) | (yq < yg[0]) | (yq > yg[-1])
    nanv = jnp.nan
    t = jnp.where(oob, nanv, t)
    inv_mag = lax.rsqrt(sx**2 + sy**2 + 1)
    normal = (
        jnp.where(oob, nanv, sx * inv_mag),
        jnp.where(oob, nanv, sy * inv_mag),
        jnp.where(oob, nanv, -inv_mag),
    )
    return t, normal


def _distance_grid(coeffs, x, y, z, L, M, N, aux):
    return _intersect_grid(coeffs, x, y, z, L, M, N, aux)[0]


def distance_static(
    code: int, radius, conic, coeffs, x, y, z, L, M, N, p1=1.0, p2=1.0, aux=None
):
    """Propagation distance to the surface in its local frame."""
    if code == PLANE:
        return _distance_plane(x, y, z, L, M, N)
    if code == STANDARD:
        return _distance_standard(radius, conic, x, y, z, L, M, N)
    if code == NURBS:
        from optiland_tpu.core import nurbs

        return nurbs.distance(coeffs, aux, x, y, z, L, M, N)
    if code == GRID_SAG:
        return _distance_grid(coeffs, x, y, z, L, M, N, aux)

    sag_fn = _SAG_FNS[code]
    # Newton iteration from the base-conic guess
    # (reference: geometries/newton_raphson.py:119-168)
    t0 = _distance_standard(radius, conic, x, y, z, L, M, N)
    t0 = jnp.where(jnp.isfinite(t0), t0, _distance_plane(x, y, z, L, M, N))

    def f_of_t(t):
        return (z + t * N) - sag_fn(
            radius, conic, coeffs, p1, p2, x + t * L, y + t * M, aux=aux
        )

    def body(_, t):
        f_val, dfdt = jax.jvp(f_of_t, (t,), (jnp.ones_like(t),))
        dfdt = jnp.where(jnp.abs(dfdt) > 1e-14, dfdt, 1e-14)
        return t - f_val / dfdt

    t = lax.fori_loop(0, NEWTON_ITERS, body, t0)
    # Implicit-function-theorem gradient: the root satisfies f(t, θ) = 0,
    # so ∂t/∂θ = -f_θ/f_t — discard the iteration loop's parameter
    # dependence (stop_gradient) and apply ONE differentiable Newton
    # correction around the converged root. Forward value is unchanged
    # (the correction is ~0 at convergence); the adjoint differentiates a
    # single sag evaluation instead of all NEWTON_ITERS of them.
    t = lax.stop_gradient(t)
    f_val, dfdt = jax.jvp(f_of_t, (t,), (jnp.ones_like(t),))
    dfdt = jnp.where(jnp.abs(dfdt) > 1e-14, dfdt, 1e-14)
    return t - f_val / dfdt
