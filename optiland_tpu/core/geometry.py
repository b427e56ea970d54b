"""Geometry kernels: sag, surface normal, and ray-surface intersection.

Each geometry family has an integer code; per-surface dispatch inside the
``lax.scan`` trace loop happens via ``lax.switch`` on the code, replacing
the reference's Python polymorphism over BaseGeometry subclasses
(reference: optiland/geometries/base.py:15-115).

All geometry functions are pure and operate on a unified parameter record:
    radius:  scalar radius of curvature (may be inf for planes)
    conic:   scalar conic constant
    coeffs:  (NC,) zero-padded geometry coefficient vector (aspheres, ...)

Intersection ("distance") kernels return the propagation distance t from
the ray's current position to the surface, evaluated in the surface's local
frame. Closed forms exist for planes and conics
(reference: optiland/geometries/plane.py, standard.py:96-148); every other
sag family uses damped Newton iterations from the conic initial guess
(reference: optiland/geometries/newton_raphson.py:119-168) with a fixed
iteration count for XLA-friendly control flow.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

# Geometry codes (stable; serialized in system pytrees)
PLANE = 0
STANDARD = 1
EVEN_ASPHERE = 2
ODD_ASPHERE = 3
POLYNOMIAL_XY = 4
CHEBYSHEV = 5
ZERNIKE_SAG = 6
TOROIDAL = 7
BICONIC = 8

# Number of Newton iterations for aspheric/freeform intersection. The conic
# initial guess converges quadratically; 16 iterations reach f64 roundoff
# for all practical prescriptions (reference uses tol=1e-10, max_iter=100).
NEWTON_ITERS = 16


# ---------------------------------------------------------------------------
# Sag functions: sag(radius, conic, coeffs, x, y) -> z
# ---------------------------------------------------------------------------


def _sag_plane(radius, conic, coeffs, x, y):
    return jnp.zeros_like(x)


def _sag_standard(radius, conic, coeffs, x, y):
    r2 = x**2 + y**2
    return r2 / (radius * (1 + jnp.sqrt(1 - (1 + conic) * r2 / radius**2)))


def _sag_even_asphere(radius, conic, coeffs, x, y):
    """Conic + sum_i C_i r^(2i+2) (reference: geometries/even_asphere.py)."""
    r2 = x**2 + y**2
    z = _sag_standard(radius, conic, coeffs, x, y)
    # Horner evaluation in r^2: C_0 r^2 + C_1 r^4 + ... times r^2 overall
    acc = jnp.zeros_like(x)
    for i in range(coeffs.shape[0] - 1, -1, -1):
        acc = acc * r2 + coeffs[i]
    return z + acc * r2


def _sag_odd_asphere(radius, conic, coeffs, x, y):
    """Conic + sum_i C_i r^(i+1) (reference: geometries/odd_asphere.py)."""
    r = jnp.sqrt(x**2 + y**2)
    z = _sag_standard(radius, conic, coeffs, x, y)
    acc = jnp.zeros_like(x)
    for i in range(coeffs.shape[0] - 1, -1, -1):
        acc = acc * r + coeffs[i]
    return z + acc * r


_SAG_FNS = {
    PLANE: _sag_plane,
    STANDARD: _sag_standard,
    EVEN_ASPHERE: _sag_even_asphere,
    ODD_ASPHERE: _sag_odd_asphere,
}

_MAX_CODE = max(_SAG_FNS) + 1
_SAG_BRANCHES = [_SAG_FNS[c] for c in range(_MAX_CODE)]


def sag(code, radius, conic, coeffs, x, y):
    """Surface sag at local coordinates (x, y), dispatched on geometry code."""
    return lax.switch(
        jnp.asarray(code, jnp.int32), _SAG_BRANCHES, radius, conic, coeffs, x, y
    )


# ---------------------------------------------------------------------------
# Surface normals: normal(code, radius, conic, coeffs, x, y) -> (nx, ny, nz)
# ---------------------------------------------------------------------------


def _normal_plane(radius, conic, coeffs, x, y):
    zeros = jnp.zeros_like(x)
    return zeros, zeros, -jnp.ones_like(x)


def _normal_standard(radius, conic, coeffs, x, y):
    r2 = x**2 + y**2
    denom = radius * jnp.sqrt(1 - (1 + conic) * r2 / radius**2)
    dfdx = x / denom
    dfdy = y / denom
    mag = jnp.sqrt(dfdx**2 + dfdy**2 + 1)
    return dfdx / mag, dfdy / mag, -1.0 / mag


def _make_grad_normal(sag_fn):
    """Build a normal function from a sag function via forward-mode autodiff."""

    def _normal(radius, conic, coeffs, x, y):
        f = lambda xx, yy: sag_fn(radius, conic, coeffs, xx, yy)
        _, dfdx = jax.jvp(f, (x, y), (jnp.ones_like(x), jnp.zeros_like(y)))
        _, dfdy = jax.jvp(f, (x, y), (jnp.zeros_like(x), jnp.ones_like(y)))
        mag = jnp.sqrt(dfdx**2 + dfdy**2 + 1)
        return dfdx / mag, dfdy / mag, -1.0 / mag

    return _normal


_NORMAL_FNS = {
    PLANE: _normal_plane,
    STANDARD: _normal_standard,
    EVEN_ASPHERE: _make_grad_normal(_sag_even_asphere),
    ODD_ASPHERE: _make_grad_normal(_sag_odd_asphere),
}

_NORMAL_BRANCHES = [_NORMAL_FNS[c] for c in range(_MAX_CODE)]


def surface_normal(code, radius, conic, coeffs, x, y):
    """Unit surface normal at local (x, y), pointing toward -z at the vertex."""
    return lax.switch(
        jnp.asarray(code, jnp.int32), _NORMAL_BRANCHES, radius, conic, coeffs, x, y
    )


# ---------------------------------------------------------------------------
# Intersection distances
# ---------------------------------------------------------------------------


def _distance_plane(radius, conic, coeffs, x, y, z, L, M, N):
    N_safe = jnp.where(jnp.abs(N) > 1e-14, N, 1e-14)
    return -z / N_safe


def _distance_standard(radius, conic, coeffs, x, y, z, L, M, N):
    """Closed-form conic intersection, choosing the root nearest the vertex
    plane (reference: geometries/standard.py:96-148)."""
    k = conic
    a = k * N**2 + L**2 + M**2 + N**2
    b = 2 * k * N * z + 2 * L * x + 2 * M * y - 2 * N * radius + 2 * N * z
    c = k * z**2 - 2 * radius * z + x**2 + y**2 + z**2
    d = b**2 - 4 * a * c
    sqrt_d = jnp.sqrt(jnp.maximum(d, 0.0))
    sqrt_d = jnp.where(d < 0, jnp.nan, sqrt_d)
    a_safe = jnp.where(a == 0, 1.0, a)
    t1 = (-b + sqrt_d) / (2 * a_safe)
    t2 = (-b - sqrt_d) / (2 * a_safe)
    z1 = z + t1 * N
    z2 = z + t2 * N
    t = jnp.where(jnp.abs(z1) <= jnp.abs(z2), t1, t2)
    return jnp.where(a == 0, -c / b, t)


def _make_newton_distance(sag_fn):
    """Newton-iteration intersection for general sag surfaces.

    Starts from the base-conic closed-form intersection and iterates
    t <- t - f(t)/f'(t) with f(t) = z(t) - sag(x(t), y(t)), a fixed
    NEWTON_ITERS times (reference: geometries/newton_raphson.py:119-168).
    """

    def _distance(radius, conic, coeffs, x, y, z, L, M, N):
        t0 = _distance_standard(radius, conic, coeffs, x, y, z, L, M, N)
        # Planes as the base guess when the radius is infinite.
        t0 = jnp.where(
            jnp.isfinite(t0), t0, _distance_plane(radius, conic, coeffs, x, y, z, L, M, N)
        )

        def body(_, t):
            xs, ys, zs = x + t * L, y + t * M, z + t * N
            f_val = zs - sag_fn(radius, conic, coeffs, xs, ys)
            fp = lambda tt: (z + tt * N) - sag_fn(
                radius, conic, coeffs, x + tt * L, y + tt * M
            )
            _, dfdt = jax.jvp(fp, (t,), (jnp.ones_like(t),))
            dfdt = jnp.where(jnp.abs(dfdt) > 1e-14, dfdt, 1e-14)
            return t - f_val / dfdt

        return lax.fori_loop(0, NEWTON_ITERS, body, t0)

    return _distance


_DISTANCE_FNS = {
    PLANE: _distance_plane,
    STANDARD: _distance_standard,
    EVEN_ASPHERE: _make_newton_distance(_sag_even_asphere),
    ODD_ASPHERE: _make_newton_distance(_sag_odd_asphere),
}

_DISTANCE_BRANCHES = [_DISTANCE_FNS[c] for c in range(_MAX_CODE)]


def distance(code, radius, conic, coeffs, x, y, z, L, M, N):
    """Propagation distance to the surface in its local frame."""
    return lax.switch(
        jnp.asarray(code, jnp.int32),
        _DISTANCE_BRANCHES,
        radius, conic, coeffs, x, y, z, L, M, N,
    )


# Static-code dispatch (used by the unrolled trace loop; the geometry family
# is part of the static system structure, so these calls resolve at trace
# time into pure elementwise expressions with no runtime branch).


def sag_static(code: int, radius, conic, coeffs, x, y):
    return _SAG_FNS[code](radius, conic, coeffs, x, y)


def surface_normal_static(code: int, radius, conic, coeffs, x, y):
    return _NORMAL_FNS[code](radius, conic, coeffs, x, y)


def distance_static(code: int, radius, conic, coeffs, x, y, z, L, M, N):
    return _DISTANCE_FNS[code](radius, conic, coeffs, x, y, z, L, M, N)
