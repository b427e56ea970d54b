"""Pure elementwise ray kernels: rotation, refraction, reflection, clipping.

These are the vector-physics building blocks of the per-surface trace step,
re-expressed as pure functions over SoA component arrays. Physics matches
the reference kernels (reference: optiland/rays/real_rays.py:112-233):
vector Snell refraction with incident-aligned normals, mirror reflection,
Euler-angle bundle rotations, and intensity-mask clipping (rays are never
compressed out of the batch — vignetted rays keep flowing with intensity 0,
which keeps shapes static for XLA).
"""

from __future__ import annotations

import jax.numpy as jnp


def rotate_x(y, z, M, N, rx):
    """Rotate positions/directions about the x-axis by angle rx."""
    c, s = jnp.cos(rx), jnp.sin(rx)
    return y * c - z * s, y * s + z * c, M * c - N * s, M * s + N * c


def rotate_y(x, z, L, N, ry):
    """Rotate positions/directions about the y-axis by angle ry."""
    c, s = jnp.cos(ry), jnp.sin(ry)
    return x * c + z * s, -x * s + z * c, L * c + N * s, -L * s + N * c


def rotate_z(x, y, L, M, rz):
    """Rotate positions/directions about the z-axis by angle rz."""
    c, s = jnp.cos(rz), jnp.sin(rz)
    return x * c - y * s, x * s + y * c, L * c - M * s, L * s + M * c


def align_normal(L, M, N, nx, ny, nz):
    """Flip surface normals to point against the incident rays.

    Returns the aligned (nx, ny, nz) and |cos| of the incidence angle.
    """
    dot = L * nx + M * ny + N * nz
    sgn = jnp.sign(dot)
    return nx * sgn, ny * sgn, nz * sgn, jnp.abs(dot)


def refract(L, M, N, nx, ny, nz, n1, n2):
    """Vector Snell refraction.

    Total internal reflection produces NaN directions (matching the
    reference's suppressed-warning NaN behavior); callers mask intensity.
    """
    u = n1 / n2
    nx, ny, nz, dot = align_normal(L, M, N, nx, ny, nz)
    root = jnp.sqrt(1 - u**2 * (1 - dot**2))
    tx = u * L + nx * root - u * nx * dot
    ty = u * M + ny * root - u * ny * dot
    tz = u * N + nz * root - u * nz * dot
    return tx, ty, tz


def reflect(L, M, N, nx, ny, nz):
    """Mirror reflection about the (incident-aligned) surface normal."""
    nx, ny, nz, dot = align_normal(L, M, N, nx, ny, nz)
    return L - 2 * dot * nx, M - 2 * dot * ny, N - 2 * dot * nz


def normalize(L, M, N):
    """Normalize direction cosines."""
    mag = jnp.sqrt(L**2 + M**2 + N**2)
    return L / mag, M / mag, N / mag
