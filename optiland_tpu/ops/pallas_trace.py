"""Pallas TPU kernels: fused multi-surface ray trace, forward and backward.

The XLA trace path round-trips the ray state through HBM between fused
kernels; these Pallas kernels keep a tile of rays resident in VMEM while
looping over *all* surfaces (localize -> intersect -> propagate -> OPD ->
clip -> refract/reflect -> globalize), so each ray costs one HBM read and
one write for the entire trace — the speed-of-light regime for this
memory-bound workload on TPU.

Forward: one kernel, grid over ray tiles.
Backward: a second kernel that re-traces the tile and runs the VJP of the
identical step chain *inside* the kernel (jax.vjp at trace time unrolls the
adjoint into the kernel body), with the per-surface scalar parameter
gradients accumulated across the sequential grid into a single VMEM block.
This removes the HBM residual traffic and the dozens of full-array
reductions XLA's transpose emits for scalar-parameter gradients.

The per-surface physics is the SAME code as the XLA path: sag families and
surface normals come from optiland_tpu.core.geometry (Newton intersection
derivative by jax.jvp — forward-mode AD, not finite differences), so every
geometry family whose sag lowers on TPU is covered: plane, conic,
even/odd asphere, polynomial XY, Chebyshev, Zernike sag, toroidal, biconic,
Forbes Qbfs/Q2d. Tilted/decentered surfaces run the localize/globalize
rotations in-kernel. Monochromatic bundles use a precomputed per-surface
index table; polychromatic bundles (trace_fast_poly) carry the wavelength
as a ray array and evaluate each glass's dispersion formula in-kernel.

Grating diffraction runs in-kernel (the m*wavelength product rides the
P_MLAM param column, so order/wavelength stay data). NURBS surfaces run
in-kernel too: the two-plane parameter Newton of Martin et al. with the
control net read from SMEM scalars and the normal extracted from the
converged (u, v) tangents (reduced tile heights — see TILE_ROWS_*_NURBS).
Unsupported (falls back to the XLA path): grid-sag geometry (its
closed-form cell solve rides MXU matmuls on the XLA path; in-kernel it
would need per-lane gathers), thin-lens/phase interaction models,
physical aperture objects, coatings/BSDFs/polarization, gratings in the
polychromatic mode, and absorption in the polychromatic mode.

(reference for semantics: optiland/surfaces/standard_surface.py:200-248,
geometries/newton_raphson.py:119-168, rays/real_rays.py:163-205)
"""

from __future__ import annotations

import contextlib
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def mosaic_compile_ctx(interpret: bool):
    """Scope under which TPU Pallas kernels must be traced.

    With x64 enabled (the library default for reference parity), pallas_call
    lowering emits i64 grid/index constants that Mosaic cannot legalize
    ("failed to legalize operation 'func.return'"). Tracing the call under a
    local x64-disabled scope keeps those constants i32; operands must already
    be 32-bit. Interpret mode (CPU) is unaffected and keeps full x64.
    """
    if interpret or not jax.config.read("jax_enable_x64"):
        return contextlib.nullcontext()
    return jax.enable_x64(False)

from optiland_tpu.core import geometry as geom
from optiland_tpu.materials import dispersion

TILE_ROWS_FWD = 512  # rows of 128 lanes per program: 64k rays/tile


def _tile_rows(num_rays: int, cap: int) -> int:
    """Tile height for a bundle of ``num_rays``.

    Interpret mode (CPU tests / the multichip dryrun) shrinks the tile (to
    a multiple of the 8-sublane f32 tiling) so tiny bundles don't simulate
    almost-entirely-padding 64k-ray blocks. On real TPU the tile stays at
    ``cap``: padding a small bundle costs microseconds there, while every
    distinct tile shape is a separate (relay-slow) Mosaic compile."""
    if jax.default_backend() != "cpu":
        return cap
    need = -(-num_rays // LANE)  # rows of 128 lanes
    need = -(-need // 8) * 8  # round up to the sublane multiple
    return min(cap, max(8, need))
# (large tiles amortize per-step DMA setup: 64->512 rows cut the measured
# HBM-bound forward wall-clock ~18% on v5e; >=1024 can fail VMEM limits)
TILE_ROWS_BWD = 64  # adjoint tile: 128 rows OOMs scoped VMEM (31.57M > 16M, r4 sweep)
# polychromatic adjoint carries per-ray wavelength + in-kernel dispersion
# chains: 64 rows OOMs at 18.71M/16M (r4), 32 fits
TILE_ROWS_BWD_POLY = 32
# under shard_map the adjoint gets extra VMEM overhead: 64 rows OOMs at
# 17.35M/16M (r4, BENCH_MESH=1), 32 fits
TILE_ROWS_BWD_SHARDED = 32
LANE = 128

# param table columns
(
    P_RADIUS, P_CONIC, P_POS, P_NPOST, P_APMAX, P_KPRE,
    P_DX, P_DY, P_RX, P_RY, P_RZ, P_G1, P_G2, P_APMIN,
    P_MLAM,  # m * wavelength for grating surfaces (0 elsewhere)
) = range(15)
NUM_P = 15

# Geometry families the kernels cover: closed-form, Newton-from-sag, or
# (NURBS) the two-plane parameter solve with SMEM control nets. Grid sag
# stays on the XLA path (its closed-form cell solve rides MXU matmuls
# there; in-kernel it would need per-lane gathers).
OK_CODES = frozenset({
    geom.PLANE, geom.STANDARD, geom.EVEN_ASPHERE, geom.ODD_ASPHERE,
    geom.POLYNOMIAL_XY, geom.CHEBYSHEV, geom.ZERNIKE_SAG, geom.TOROIDAL,
    geom.BICONIC, geom.FORBES_QBFS, geom.FORBES_Q2D, geom.NURBS,
})

# NURBS chains keep (nu + nv + ~8) live tile arrays through the unrolled
# 2x2 Newton and its in-kernel VJP: cap the tiles well below the generic
# ones so scoped VMEM fits.
TILE_ROWS_FWD_NURBS = 128
TILE_ROWS_BWD_NURBS = 32  # also the PRNG SUB_ROWS multiple floor


def _fwd_cap(spec) -> int:
    return TILE_ROWS_FWD_NURBS if geom.NURBS in spec[0] else TILE_ROWS_FWD


def _bwd_cap(spec, poly=False) -> int:
    if geom.NURBS in spec[0]:
        return TILE_ROWS_BWD_NURBS
    return TILE_ROWS_BWD_POLY if poly else TILE_ROWS_BWD


def _rot_local(x, y, z, L, M, N, rx, ry, rz):
    """Localize rotation: R_x(-rx) R_y(-ry) R_z(-rz) applied to positions and
    directions (matches optiland_tpu.core.trace._surface_step order;
    reference: coordinate_system.py:73-89)."""
    from optiland_tpu.ops import kernels

    x, y, L, M = kernels.rotate_z(x, y, L, M, -rz)
    x, z, L, N = kernels.rotate_y(x, z, L, N, -ry)
    y, z, M, N = kernels.rotate_x(y, z, M, N, -rx)
    return x, y, z, L, M, N


def _rot_global(x, y, z, L, M, N, rx, ry, rz):
    from optiland_tpu.ops import kernels

    y, z, M, N = kernels.rotate_x(y, z, M, N, rx)
    x, z, L, N = kernels.rotate_y(x, z, L, N, ry)
    x, y, L, M = kernels.rotate_z(x, y, L, M, rz)
    return x, y, z, L, M, N


def _nurbs_eval_tile(getcv, aux, u, v):
    """Homogeneous NURBS surface point on a ray tile from SMEM control
    scalars. Same math as core/nurbs.nurbs_eval, but the (4, nu, nv)
    homogeneous net stays a flat scalar accessor and the basis values a
    list of tile arrays — every intermediate is 2-D (Mosaic requirement).
    Flat layout matches core/nurbs.unpack_pw: P[d, i, j] at
    d*nu*nv + i*nv + j, W at 3*nu*nv + i*nv + j."""
    from optiland_tpu.core import nurbs as _nurbs

    _, nu, nv, p, q, uk, vk = aux
    Bu = _nurbs.basis_list(uk, nu - 1, p, u)
    Bv = _nurbs.basis_list(vk, nv - 1, q, v)
    npw = nu * nv
    Sx = Sy = Sz = Sw = None
    for i in range(nu):
        for j in range(nv):
            b = Bu[i] * Bv[j]
            wb = getcv(3 * npw + i * nv + j) * b
            tx = getcv(0 * npw + i * nv + j) * wb
            ty = getcv(1 * npw + i * nv + j) * wb
            tz = getcv(2 * npw + i * nv + j) * wb
            if Sx is None:
                Sx, Sy, Sz, Sw = tx, ty, tz, wb
            else:
                Sx, Sy, Sz, Sw = Sx + tx, Sy + ty, Sz + tz, Sw + wb
    w_safe = jnp.where(Sw == 0, 1.0, Sw)
    return Sx / w_safe, Sy / w_safe, Sz / w_safe


def _nurbs_intersect_tile(getcv, aux, x, y, z, L, M, N, iters):
    """Two-plane NURBS ray intersection + tangent-product normal on a
    tile (port of core/nurbs.intersect — Martin et al. — to kernel form;
    identical formulation so the CPU-interpret parity tests compare the
    same algorithm). Implicit-function-theorem gradient: the Newton loop
    is stop-gradiented and one differentiable correction closes it."""
    mask = (L > M) & (L > N)
    hyp1 = jnp.sqrt(L * L + M * M)
    hyp2 = jnp.sqrt(N * N + M * M)
    hyp1 = jnp.where(hyp1 == 0, 1.0, hyp1)
    hyp2 = jnp.where(hyp2 == 0, 1.0, hyp2)
    N1x = jnp.where(mask, M / hyp1, 0.0)
    N1y = jnp.where(mask, -L / hyp1, N / hyp2)
    N1z = jnp.where(mask, 0.0, -M / hyp2)
    N2x = N1y * N - N1z * M
    N2y = N1z * L - N1x * N
    N2z = N1x * M - N1y * L
    d1 = -(N1x * x + N1y * y + N1z * z)
    d2 = -(N2x * x + N2y * y + N2z * z)

    def residual(u, v):
        Sx, Sy, Sz = _nurbs_eval_tile(getcv, aux, u, v)
        return (N1x * Sx + N1y * Sy + N1z * Sz + d1,
                N2x * Sx + N2y * Sy + N2z * Sz + d2)

    def newton_step(u, v):
        (f1, f2), (df1_du, df2_du) = jax.jvp(
            residual, (u, v), (jnp.ones_like(u), jnp.zeros_like(v))
        )
        _, (df1_dv, df2_dv) = jax.jvp(
            residual, (u, v), (jnp.zeros_like(u), jnp.ones_like(v))
        )
        det = df1_du * df2_dv - df1_dv * df2_du
        det = jnp.where(jnp.abs(det) < 1e-14, 1e-14, det)
        du = (f1 * df2_dv - f2 * df1_dv) / det
        dv = (f2 * df1_du - f1 * df2_du) / det
        return jnp.clip(u - du, 0.0, 1.0), jnp.clip(v - dv, 0.0, 1.0)

    # bounding-box parameter guess from the corner control points
    nu, nv = aux[1], aux[2]
    npw = nu * nv
    x0, x1 = getcv(0), getcv(npw - 1)
    y0, y1 = getcv(npw), getcv(2 * npw - 1)
    u = jnp.clip(
        (x - x0) / jnp.where(x1 - x0 == 0, 1.0, x1 - x0), 0.0, 1.0
    )
    v = jnp.clip(
        (y - y0) / jnp.where(y1 - y0 == 0, 1.0, y1 - y0), 0.0, 1.0
    )
    for _ in range(iters):
        u, v = newton_step(u, v)
    u = jax.lax.stop_gradient(u)
    v = jax.lax.stop_gradient(v)
    u, v = newton_step(u, v)

    Sx, Sy, Sz = _nurbs_eval_tile(getcv, aux, u, v)
    t = jnp.sqrt((Sx - x) ** 2 + (Sy - y) ** 2 + (Sz - z) ** 2)

    eval_uv = lambda uu, vv: _nurbs_eval_tile(getcv, aux, uu, vv)
    _, Su = jax.jvp(eval_uv, (u, v), (jnp.ones_like(u), jnp.zeros_like(v)))
    _, Sv = jax.jvp(eval_uv, (u, v), (jnp.zeros_like(u), jnp.ones_like(v)))
    nx = Su[1] * Sv[2] - Su[2] * Sv[1]
    ny = Su[2] * Sv[0] - Su[0] * Sv[2]
    nz = Su[0] * Sv[1] - Su[1] * Sv[0]
    mag = jnp.sqrt(nx * nx + ny * ny + nz * nz)
    mag = jnp.where(mag == 0, 1.0, mag)
    nx, ny, nz = nx / mag, ny / mag, nz / mag
    flip = jnp.sign(jnp.where(nz == 0, 1.0, -nz))
    return t, (nx * flip, ny * flip, nz * flip)


def _step_tile(s, code, reflective, tilted, aux, getp, getc, nc, state,
               newton_iters, formula=None, getm=None, nm=0,
               has_absorption=True, inner=False, want_extras=False,
               grating=False):
    """One surface step on a ray tile (pure jnp; runs inside the kernels).

    ``getp(s, col)`` / ``getc(s, ci)`` return scalar surface parameters —
    SMEM reads in the forward kernel, traced values in the adjoint.
    ``state[-1]`` is the per-ray wavelength array in polychromatic mode
    (``formula``/``getm`` set), else None.

    With ``want_extras`` the step additionally returns
    ``(L0, M0, N0, L1, M1, N1, cos_aoi)`` — the local-frame pre- and
    post-interaction directions and |cos(angle of incidence)| — which the
    polarized kernel consumes for the Jones/p-matrix update
    (reference: rays/polarized_rays.py:136-199, coatings.py:72-110).
    """
    x, y, z, L, M, N, inten, opd, n_pre, w = state
    radius = getp(s, P_RADIUS)
    conic = getp(s, P_CONIC)
    pos = getp(s, P_POS)
    ap_max = getp(s, P_APMAX)
    p1 = getp(s, P_G1)
    p2 = getp(s, P_G2)
    cvec = (
        jnp.stack([getc(s, ci) for ci in range(nc)])
        if nc else jnp.zeros((0,), x.dtype)
    )

    # ---- localize (translate + optional static tilt rotations) ----
    x = x - getp(s, P_DX)
    y = y - getp(s, P_DY)
    zl = z - pos
    if tilted:
        rx, ry, rz = getp(s, P_RX), getp(s, P_RY), getp(s, P_RZ)
        x, y, zl, L, M, N = _rot_local(x, y, zl, L, M, N, rx, ry, rz)

    # ---- intersect: closed form for plane/conic, two-plane parameter
    # solve for NURBS (yields the normal too), AD-Newton otherwise ----
    nurbs_normal = None
    if code == geom.PLANE:
        t = geom._distance_plane(x, y, zl, L, M, N)
    elif code == geom.STANDARD:
        t = geom._distance_standard(radius, conic, x, y, zl, L, M, N)
    elif code == geom.NURBS:
        t, nurbs_normal = _nurbs_intersect_tile(
            lambda ci: getc(s, ci), aux, x, y, zl, L, M, N, newton_iters
        )
    else:
        t0 = geom._distance_standard(radius, conic, x, y, zl, L, M, N)
        t0 = jnp.where(
            jnp.isfinite(t0), t0, geom._distance_plane(x, y, zl, L, M, N)
        )
        sag_fn = geom._SAG_FNS[code]

        def f_of_t(t):
            return (zl + t * N) - sag_fn(
                radius, conic, cvec, p1, p2, x + t * L, y + t * M, aux=aux
            )

        t = t0
        for _ in range(newton_iters):
            f_val, dfdt = jax.jvp(f_of_t, (t,), (jnp.ones_like(t),))
            dfdt = jnp.where(jnp.abs(dfdt) > 1e-14, dfdt, 1e-14)
            t = t - f_val / dfdt
        # implicit-function-theorem gradient (see geometry.distance_static):
        # the in-kernel VJP transposes ONE sag evaluation, not newton_iters
        # of them — the stopped loop is dead code in the adjoint
        t = jax.lax.stop_gradient(t)
        f_val, dfdt = jax.jvp(f_of_t, (t,), (jnp.ones_like(t),))
        dfdt = jnp.where(jnp.abs(dfdt) > 1e-14, dfdt, 1e-14)
        t = t - f_val / dfdt

    # ---- propagate + absorption + OPD + clip ----
    x = x + t * L
    y = y + t * M
    zl = zl + t * N
    if formula is None and has_absorption:
        k_pre = getp(s, P_KPRE)
        inten = inten * jnp.exp(-4 * np.pi * k_pre * t * 1e3)
    opd = opd + jnp.abs(t * n_pre)
    r2 = x * x + y * y
    inten = jnp.where(r2 > ap_max * ap_max, 0.0, inten)
    if inner:
        # annular obscuration (reference: physical_apertures/radial.py:31)
        ap_min = getp(s, P_APMIN)
        inten = jnp.where(r2 < ap_min * ap_min, 0.0, inten)

    # ---- normal (shared geometry code: AD of the sag; NURBS reuses the
    # intersect solve's converged parameter point) ----
    if nurbs_normal is not None:
        nx, ny, nz = nurbs_normal
    else:
        nx, ny, nz = geom.surface_normal_static(
            code, radius, conic, cvec, x, y, p1=p1, p2=p2, aux=aux
        )

    # ---- interact ----
    nx0, ny0, nz0 = nx, ny, nz  # raw normal (groove-frame cross products)
    dot = L * nx + M * ny + N * nz
    sgn = jnp.sign(dot)
    nx, ny, nz = nx * sgn, ny * sgn, nz * sgn
    adot = jnp.abs(dot)
    L0p, M0p, N0p = L, M, N  # local-frame pre-interaction directions
    if grating:
        # Vector grating diffraction, same math as the XLA step
        # (core/trace.py grating branch; reference:
        # rays/real_rays.py:207-430, interactions/diffractive_model.py).
        # Monochromatic: the m*wavelength product rides the P_MLAM param
        # column, so order and wavelength stay data, not compile consts.
        d = getp(s, P_G1)
        alpha = getp(s, P_G2)
        mlam = getp(s, P_MLAM)
        if code == geom.PLANE:
            fx = -jnp.sin(alpha) * jnp.ones_like(x)
            fy = jnp.cos(alpha) * jnp.ones_like(x)
            fz = jnp.zeros_like(x)
        else:
            r2g = x * x + y * y
            denomg = radius * jnp.sqrt(
                jnp.maximum(1 - (1 + conic) * r2g / radius**2, 1e-14)
            )
            ta = jnp.tan(alpha)
            dzd = (x + y * ta) / denomg
            tmag = jnp.sqrt(1 + ta * ta + dzd * dzd)
            tx, ty, tz = 1.0 / tmag, ta / tmag, dzd / tmag
            gx = ny0 * tz - nz0 * ty
            gy = -nx0 * tz + nz0 * tx
            gz = nx0 * ty - ny0 * tx
            gmag = jnp.sqrt(gx * gx + gy * gy + gz * gz)
            fx, fy, fz = -gx / gmag, -gy / gmag, -gz / gmag
        # clamped like the XLA branch: zero transverse groove component
        # must not NaN the tile (the fused adjoint would spread it to
        # every stack leaf)
        d_eff = d / jnp.sqrt(jnp.maximum(fx * fx + fy * fy, 1e-12))
        n_post = n_pre if reflective else getp(s, P_NPOST)
        fn = fx * nx + fy * ny + fz * nz
        kn = adot
        Ptx = d_eff * n_pre * (L - kn * nx) + mlam * (fx - fn * nx)
        Pty = d_eff * n_pre * (M - kn * ny) + mlam * (fy - fn * ny)
        Ptz = d_eff * n_pre * (N - kn * nz) + mlam * (fz - fn * nz)
        rad = (d_eff * n_post) ** 2 - (Ptx**2 + Pty**2 + Ptz**2)
        pos_rad = rad >= 0
        inten = jnp.where(pos_rad, inten, 0.0)
        root = jnp.where(
            pos_rad, jnp.sqrt(jnp.where(pos_rad, rad, 1.0)), 0.0
        )
        if reflective:
            L = (-Ptx + nx * root) / (d_eff * n_post)
            M = (-Pty + ny * root) / (d_eff * n_post)
            N = (-Ptz + nz * root) / (d_eff * n_post)
        else:
            L = (Ptx + nx * root) / (d_eff * n_post)
            M = (Pty + ny * root) / (d_eff * n_post)
            N = (Ptz + nz * root) / (d_eff * n_post)
        n_next = n_post
    elif reflective:
        L = L - 2 * adot * nx
        M = M - 2 * adot * ny
        N = N - 2 * adot * nz
        n_next = n_pre
    else:
        if formula is not None:
            mvals = [getm(s, i) for i in range(nm)]
            n_post = dispersion.n_formula_scalar_terms(formula, mvals, w)
        else:
            # mono mode: index is uniform across the tile — keep it 0-d so
            # u = n_pre/n_post is a scalar divide, not a per-ray one
            n_post = getp(s, P_NPOST)
        u = n_pre / n_post
        root = jnp.sqrt(1 - u * u * (1 - adot * adot))
        L = u * L + nx * (root - u * adot)
        M = u * M + ny * (root - u * adot)
        N = u * N + nz * (root - u * adot)
        n_next = n_post

    extras = (L0p, M0p, N0p, L, M, N, adot) if want_extras else None

    # ---- globalize ----
    if tilted:
        x, y, zl, L, M, N = _rot_global(x, y, zl, L, M, N, rx, ry, rz)
    x = x + getp(s, P_DX)
    y = y + getp(s, P_DY)

    out = (x, y, zl + pos, L, M, N, inten, opd, n_next, w)
    if want_extras:
        return out, extras
    return out


def _chain(spec, getp, getc, getm, x, y, z, L, M, N, i, opd, w=None):
    """Run the full surface chain on a tile; returns the 8 output arrays.

    ``spec`` is the static StructSpec; ``w`` is the per-ray wavelength array
    in polychromatic mode (else None and the mono param table is used).
    """
    codes, refl, tilted, auxes, nc, newton_iters, formulas, nm = spec[:8]
    has_abs = spec[8] if len(spec) > 8 else True
    if isinstance(has_abs, bool):
        has_abs = (has_abs,) * len(codes)
    inner = spec[9] if len(spec) > 9 else (False,) * len(codes)
    grat = spec[10] if len(spec) > 10 else (False,) * len(codes)
    S = len(codes)
    if w is None:
        n0 = getp(0, P_NPOST)
    else:
        if refl[0]:
            raise ValueError("object surface cannot be reflective")
        n0 = dispersion.n_formula_scalar_terms(
            formulas[0], [getm(0, i_) for i_ in range(nm)], w
        )
    state = (x, y, z, L, M, N, i, opd, n0, w)
    for s in range(1, S):
        state = _step_tile(
            s, codes[s], refl[s], tilted[s], auxes[s], getp, getc, nc,
            state, newton_iters,
            formula=formulas[s] if w is not None else None,
            getm=getm, nm=nm, has_absorption=has_abs[s], inner=inner[s],
            grating=grat[s],
        )
    return state[:8]


def _spec_of(system, newton_iters, poly):
    cfg = system.cfg
    tilted = tuple(bool(t) for t in _tilt_mask(system))
    auxes = tuple(cfg.geom_aux) if cfg.geom_aux is not None else (
        (None,) * cfg.num_surfaces
    )
    nc = int(system.stack.coeffs.shape[1])
    formulas = tuple(cfg.mat_formulas) if poly else (None,) * cfg.num_surfaces
    nm = int(system.stack.mat_coeffs.shape[1]) if poly else 0
    inner = tuple(
        a is not None and float(getattr(a, "r_min", 0.0)) > 0.0
        for a in (cfg.apertures or (None,) * cfg.num_surfaces)
    )
    grat = tuple(
        i is not None and isinstance(i, tuple) and i[0] == "grating"
        for i in (cfg.interactions or (None,) * cfg.num_surfaces)
    )
    return (
        tuple(cfg.geom_codes), tuple(cfg.reflective), tilted, auxes, nc,
        newton_iters, formulas, nm, _absorption_mask(system), inner, grat,
    )


def _absorption_mask(system):
    """Per-surface absorption flags: surface s attenuates through material
    s-1, and a material whose k table is identically zero contributes
    exp(0) = 1 — skipping its exp is exact, and air gaps dominate most
    systems (4 of the Cooke triplet's 7 exps vanish)."""
    cfg = system.cfg
    S = cfg.num_surfaces
    if not cfg.has_absorption:
        return (False,) * S
    try:
        kt = np.asarray(system.stack.ktab)
    except jax.errors.TracerArrayConversionError:
        return (True,) * S  # k values are traced: keep every exp
    k_col = kt[..., 1] if kt.ndim == 3 else kt
    mat_absorbs = [bool(np.any(k_col[m] != 0.0)) for m in range(S)]
    return tuple(
        mat_absorbs[max(s - 1, 0)] if s > 0 else False for s in range(S)
    )


def _tilt_mask(system):
    st = system.stack
    try:
        r = np.asarray(jnp.stack([st.rx, st.ry, st.rz]))
    except jax.errors.TracerArrayConversionError:
        # tilts are traced (e.g. a tilt variable under grad): keep the
        # rotation code in-kernel for every surface
        return [True] * st.rx.shape[0]
    if not np.isfinite(r).all():
        return [True] * st.rx.shape[0]
    return list((np.abs(r) > 0).any(axis=0))


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _make_fwd_kernel(spec, poly):
    n_ray = 9 if poly else 8

    def kernel(*refs):
        params_ref, coeffs_ref, mats_ref = refs[0], refs[1], refs[2]
        in_refs = refs[3 : 3 + n_ray]
        out_refs = refs[3 + n_ray :]
        getp = lambda s, col: params_ref[s, col]
        getc = lambda s, ci: coeffs_ref[s, ci]
        getm = lambda s, mi: mats_ref[s, mi]
        ins = [r[:] for r in in_refs]
        w = ins[8] if poly else None
        out = _chain(spec, getp, getc, getm, *ins[:8], w=w)
        for ref, val in zip(out_refs, out):
            ref[:] = val

    return kernel


def _pad_ray_arrays(arrays, tile_rows, ones_idx=(5,)):
    """Pad flat ray arrays to a tile multiple and fold to (rows, LANE).

    Padded lanes get benign rays (N=1, wavelength=1 um via ``ones_idx``, all
    else 0 — including every cotangent, so VJP linearity guarantees padded
    lanes contribute exactly zero to the accumulated parameter gradients).
    """
    R = arrays[0].shape[0]
    tile = tile_rows * LANE
    pad = (-R) % tile
    out = []
    for k, a in enumerate(arrays):
        fill = 1.0 if k in ones_idx else 0.0
        out.append(
            jnp.pad(a, (0, pad), constant_values=fill).reshape(-1, LANE)
        )
    return out, R


@functools.partial(jax.jit, static_argnames=("spec", "poly"))
def _pallas_fwd(params, coeffs, mats, ray_arrays, spec, poly):
    tile = _tile_rows(ray_arrays[0].shape[0], _fwd_cap(spec))
    arrs, R = _pad_ray_arrays(
        ray_arrays, tile, ones_idx=(5, 8) if poly else (5,)
    )
    rows = arrs[0].shape[0]
    grid = (rows // tile,)
    dtype = arrs[0].dtype

    ray_spec = pl.BlockSpec(
        (tile, LANE), lambda g: (g, 0), memory_space=pltpu.VMEM
    )
    out_shape = [jax.ShapeDtypeStruct((rows, LANE), dtype) for _ in range(8)]
    kernel = _make_fwd_kernel(spec, poly)
    interpret = jax.default_backend() == "cpu"
    with mosaic_compile_ctx(interpret):
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # params table
                pl.BlockSpec(memory_space=pltpu.SMEM),  # geometry coeffs
                pl.BlockSpec(memory_space=pltpu.SMEM),  # dispersion coeffs
            ] + [ray_spec] * len(arrs),
            out_specs=[ray_spec] * 8,
            out_shape=out_shape,
            interpret=interpret,
        )(params, coeffs, mats, *arrs)
    return tuple(o.reshape(-1)[:R] for o in outs)


# ---------------------------------------------------------------------------
# Backward kernel: in-kernel VJP with accumulated parameter gradients
# ---------------------------------------------------------------------------


def _dp_rows(spec, poly):
    """VMEM rows for the accumulated scalar-parameter gradient block."""
    S = len(spec[0])
    nc, nm = spec[4], spec[7]
    total = S * (NUM_P + nc + (nm if poly else 0))
    rows = -(-total // LANE)
    return max(8, -(-rows // 8) * 8)


def _make_bwd_kernel(spec, poly, tile_rows):
    S = len(spec[0])
    nc, nm = spec[4], spec[7]
    n_param = S * NUM_P
    n_coeff = S * nc
    n_mat = S * nm if poly else 0
    n_ray = 9 if poly else 8
    rows_dp = _dp_rows(spec, poly)

    def kernel(*refs):
        params_ref, coeffs_ref, mats_ref = refs[0], refs[1], refs[2]
        in_refs = refs[3 : 3 + n_ray]
        cot_refs = refs[3 + n_ray : 3 + n_ray + 8]
        out_refs = refs[3 + n_ray + 8 : 3 + n_ray + 16]
        dp_ref = refs[3 + n_ray + 16]

        pvals = tuple(
            params_ref[s, c] for s in range(S) for c in range(NUM_P)
        )
        cvals = tuple(
            coeffs_ref[s, ci] for s in range(S) for ci in range(nc)
        )
        mvals = tuple(
            mats_ref[s, mi] for s in range(S) for mi in range(nm)
        ) if poly else ()

        ins = [r[:] for r in in_refs]
        w_tile = ins[8] if poly else None

        def fwd_vals(pv, cv, mv, x, y, z, L, M, N, i, opd):
            getp = lambda s, col: pv[s * NUM_P + col]
            getc = lambda s, ci: cv[s * nc + ci]
            getm = lambda s, mi: mv[s * nm + mi]
            return _chain(
                spec, getp, getc, getm, x, y, z, L, M, N, i, opd, w=w_tile
            )

        _, vjp = jax.vjp(fwd_vals, pvals, cvals, mvals, *ins[:8])
        cot = tuple(r[:] for r in cot_refs)
        dpv, dcv, dmv, *dray = vjp(cot)

        for ref, val in zip(out_refs, dray):
            ref[:] = val

        # Accumulate scalar parameter gradients into a single shared block
        # (grid iterations run sequentially on a TPU core). Scatter is not
        # lowerable on TPU, so place each scalar with a masked select.
        g = pl.program_id(0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (rows_dp, LANE), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (rows_dp, LANE), 1)
        lin = rows * LANE + cols
        acc = jnp.zeros((rows_dp, LANE), dtype=dray[0].dtype)
        for idx, v in enumerate(dpv):
            acc = jnp.where(lin == idx, v, acc)
        for jdx, v in enumerate(dcv):
            acc = jnp.where(lin == n_param + jdx, v, acc)
        for kdx, v in enumerate(dmv):
            acc = jnp.where(lin == n_param + n_coeff + kdx, v, acc)

        @pl.when(g == 0)
        def _():
            dp_ref[:] = acc

        @pl.when(g > 0)
        def _():
            dp_ref[:] = dp_ref[:] + acc

    return kernel


@functools.partial(jax.jit, static_argnames=("spec", "poly", "bwd_tile"))
def _pallas_bwd(params, coeffs, mats, inputs, cotangents, spec, poly,
                bwd_tile=None):
    S = len(spec[0])
    nc, nm = spec[4], spec[7]
    rows_dp = _dp_rows(spec, poly)
    tile = _tile_rows(
        inputs[0].shape[0], bwd_tile or _bwd_cap(spec, poly)
    )
    arrs, R = _pad_ray_arrays(
        list(inputs) + list(cotangents), tile,
        ones_idx=(5, 8) if poly else (5,),
    )
    rows = arrs[0].shape[0]
    grid = (rows // tile,)
    dtype = arrs[0].dtype

    ray_spec = pl.BlockSpec(
        (tile, LANE), lambda g: (g, 0), memory_space=pltpu.VMEM
    )
    dp_spec = pl.BlockSpec(
        (rows_dp, LANE), lambda g: (0, 0), memory_space=pltpu.VMEM
    )
    out_shape = [jax.ShapeDtypeStruct((rows, LANE), dtype) for _ in range(8)]
    out_shape.append(jax.ShapeDtypeStruct((rows_dp, LANE), dtype))
    kernel = _make_bwd_kernel(spec, poly, tile)
    interpret = jax.default_backend() == "cpu"
    with mosaic_compile_ctx(interpret):
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ] + [ray_spec] * len(arrs),
            out_specs=[ray_spec] * 8 + [dp_spec],
            out_shape=out_shape,
            interpret=interpret,
        )(params, coeffs, mats, *arrs)
    ray_grads = tuple(o.reshape(-1)[:R] for o in outs[:8])
    flat = outs[8].reshape(-1)
    dparams = flat[: S * NUM_P].reshape(S, NUM_P)
    dcoeffs = flat[S * NUM_P : S * (NUM_P + nc)].reshape(S, nc)
    dmats = (
        flat[S * (NUM_P + nc) : S * (NUM_P + nc + nm)].reshape(S, nm)
        if poly else jnp.zeros_like(mats)
    )
    return ray_grads, dparams, dcoeffs, dmats


# ---------------------------------------------------------------------------
# Fused generate+trace kernels ("field" variant)
#
# For an infinite-conjugate system with angle fields (the reference's default
# configuration, rays/ray_aiming/paraxial.py:33-106), the entire launch
# bundle for one field is an affine map of the pupil samples:
#     x0 = sx*Px + x00,  y0 = sy*Py + y00,  z0/L/M/N constant scalars.
# These kernels take only (Px, Py) per ray plus an 8-scalar "aim" vector in
# SMEM and build the launch state in-kernel, removing every raygen HBM
# round-trip (8 arrays of launch state + the aiming intermediates). The
# backward kernel consequently emits NO per-ray gradients — pupil samples
# carry no cotangent — only the accumulated scalar block for
# params/coeffs/aim, making the adjoint write traffic ~zero.
# ---------------------------------------------------------------------------

N_AIM = 8
A_X0, A_Y0, A_Z0, A_L, A_M, A_N, A_SX, A_SY = range(N_AIM)


def aim_vector(system, Hx, Hy):
    """Differentiable 8-scalar launch descriptor for one (Hx, Hy) field of an
    infinite-conjugate angle-field system (the closed-form aim of
    core.raygen.aim_rays_paraxial specialized to scalar H)."""
    from optiland_tpu.core import paraxial, raygen
    from optiland_tpu.core.system import positions

    Hx = jnp.asarray(Hx)
    Hy = jnp.asarray(Hy)
    vxf, vyf = raygen.get_vig_factor(system, Hx, Hy)
    vx, vy = 1.0 - vxf, 1.0 - vyf
    epl, epd = paraxial.pupil_scalars(system)
    fx, fy = system.field_x, system.field_y
    max_field = jnp.max(jnp.sqrt(fx**2 + fy**2))
    pos = positions(system.stack)
    offset = epd - jnp.min(pos[1:-1])
    x00 = -jnp.tan(jnp.radians(max_field * Hx)) * (offset + epl)
    y00 = -jnp.tan(jnp.radians(max_field * Hy)) * (offset + epl)
    z0 = pos[1] - offset
    dz = epl - z0
    mag = jnp.sqrt(x00**2 + y00**2 + dz**2)
    bad = mag < 1e-9
    mag = jnp.where(bad, 1.0, mag)
    L = jnp.where(bad, 0.0, -x00 / mag)
    M = jnp.where(bad, 0.0, -y00 / mag)
    N = jnp.where(bad, 1.0, dz / mag)
    return jnp.stack(
        [x00, y00, z0, L, M, N, epd / 2 * vx, epd / 2 * vy]
    )


def _launch_from_pupil(geta, Px, Py):
    x = Px * geta(A_SX) + geta(A_X0)
    y = Py * geta(A_SY) + geta(A_Y0)
    z = jnp.full_like(Px, geta(A_Z0))
    L = jnp.full_like(Px, geta(A_L))
    M = jnp.full_like(Px, geta(A_M))
    N = jnp.full_like(Px, geta(A_N))
    return x, y, z, L, M, N, jnp.ones_like(Px), jnp.zeros_like(Px)


def _make_fwd_kernel_field(spec):
    def kernel(*refs):
        params_ref, coeffs_ref, mats_ref, aim_ref = refs[:4]
        px_ref, py_ref = refs[4], refs[5]
        out_refs = refs[6:]
        getp = lambda s, col: params_ref[s, col]
        getc = lambda s, ci: coeffs_ref[s, ci]
        getm = lambda s, mi: mats_ref[s, mi]
        geta = lambda j: aim_ref[j]
        launch = _launch_from_pupil(geta, px_ref[:], py_ref[:])
        out = _chain(spec, getp, getc, getm, *launch)
        for ref, val in zip(out_refs, out):
            ref[:] = val

    return kernel


@functools.partial(jax.jit, static_argnames=("spec",))
def _pallas_fwd_field(params, coeffs, mats, aim, Px, Py, spec):
    tile = _tile_rows(Px.shape[0], _fwd_cap(spec))
    arrs, R = _pad_ray_arrays([Px, Py], tile, ones_idx=())
    rows = arrs[0].shape[0]
    grid = (rows // tile,)
    dtype = arrs[0].dtype

    ray_spec = pl.BlockSpec(
        (tile, LANE), lambda g: (g, 0), memory_space=pltpu.VMEM
    )
    out_shape = [jax.ShapeDtypeStruct((rows, LANE), dtype) for _ in range(8)]
    kernel = _make_fwd_kernel_field(spec)
    interpret = jax.default_backend() == "cpu"
    with mosaic_compile_ctx(interpret):
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 4
            + [ray_spec] * 2,
            out_specs=[ray_spec] * 8,
            out_shape=out_shape,
            interpret=interpret,
        )(params, coeffs, mats, aim, *arrs)
    return tuple(o.reshape(-1)[:R] for o in outs)


def _make_bwd_kernel_field(spec, rows_dp):
    S = len(spec[0])
    nc = spec[4]
    n_param = S * NUM_P
    n_coeff = S * nc

    def kernel(*refs):
        params_ref, coeffs_ref, mats_ref, aim_ref = refs[:4]
        px_ref, py_ref = refs[4], refs[5]
        cot_refs = refs[6:14]
        dp_ref = refs[14]

        pvals = tuple(
            params_ref[s, c] for s in range(S) for c in range(NUM_P)
        )
        cvals = tuple(
            coeffs_ref[s, ci] for s in range(S) for ci in range(nc)
        )
        avals = tuple(aim_ref[j] for j in range(N_AIM))

        def fwd_vals(pv, cv, av, Px, Py):
            getp = lambda s, col: pv[s * NUM_P + col]
            getc = lambda s, ci: cv[s * nc + ci]
            geta = lambda j: av[j]
            launch = _launch_from_pupil(geta, Px, Py)
            return _chain(spec, getp, getc, lambda s, mi: 0.0, *launch)

        _, vjp = jax.vjp(fwd_vals, pvals, cvals, avals, px_ref[:], py_ref[:])
        cot = tuple(r[:] for r in cot_refs)
        dpv, dcv, dav, _dPx, _dPy = vjp(cot)

        g = pl.program_id(0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (rows_dp, LANE), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (rows_dp, LANE), 1)
        lin = rows * LANE + cols
        acc = jnp.zeros((rows_dp, LANE), dtype=cot[0].dtype)
        for idx, v in enumerate(dpv):
            acc = jnp.where(lin == idx, v, acc)
        for jdx, v in enumerate(dcv):
            acc = jnp.where(lin == n_param + jdx, v, acc)
        for kdx, v in enumerate(dav):
            acc = jnp.where(lin == n_param + n_coeff + kdx, v, acc)

        @pl.when(g == 0)
        def _():
            dp_ref[:] = acc

        @pl.when(g > 0)
        def _():
            dp_ref[:] = dp_ref[:] + acc

    return kernel


@functools.partial(jax.jit, static_argnames=("spec",))
def _pallas_bwd_field(params, coeffs, mats, aim, Px, Py, cotangents, spec):
    S = len(spec[0])
    nc = spec[4]
    total = S * (NUM_P + nc) + N_AIM
    rows_dp = max(8, -(-(-(-total // LANE)) // 8) * 8)  # ceil to 8-row block
    bwd_tile = _bwd_cap(spec)
    arrs, _R = _pad_ray_arrays(
        [Px, Py] + list(cotangents), bwd_tile, ones_idx=()
    )
    rows = arrs[0].shape[0]
    grid = (rows // bwd_tile,)
    dtype = arrs[0].dtype

    ray_spec = pl.BlockSpec(
        (bwd_tile, LANE), lambda g: (g, 0), memory_space=pltpu.VMEM
    )
    dp_spec = pl.BlockSpec(
        (rows_dp, LANE), lambda g: (0, 0), memory_space=pltpu.VMEM
    )
    kernel = _make_bwd_kernel_field(spec, rows_dp)
    interpret = jax.default_backend() == "cpu"
    with mosaic_compile_ctx(interpret):
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 4
            + [ray_spec] * len(arrs),
            out_specs=dp_spec,
            out_shape=jax.ShapeDtypeStruct((rows_dp, LANE), dtype),
            interpret=interpret,
        )(params, coeffs, mats, aim, *arrs)
    flat = out.reshape(-1)
    dparams = flat[: S * NUM_P].reshape(S, NUM_P)
    dcoeffs = flat[S * NUM_P : S * (NUM_P + nc)].reshape(S, nc)
    daim = flat[S * (NUM_P + nc) : S * (NUM_P + nc) + N_AIM]
    return dparams, dcoeffs, daim


def pallas_field_supported(system) -> bool:
    """True when trace_fast_field covers this system (fused gen+trace)."""
    cfg = system.cfg
    return (
        pallas_supported(system)
        and cfg.field_type == "angle"
        and bool(cfg.obj_infinite)
        and not getattr(cfg, "obj_telecentric", False)
    )


def trace_fast_field(system, Hx, Hy, Px, Py, wavelength,
                     newton_iters: int = 10):
    """Fused generate+trace Pallas kernel for one (Hx, Hy) field.

    Equivalent to generate_rays(...) followed by trace_fast(...) for
    infinite-conjugate angle-field systems (pallas_field_supported), but the
    launch state is built in-kernel from 8 SMEM scalars, so the only per-ray
    HBM inputs are the pupil samples and the adjoint writes no per-ray
    gradients at all (reference analog: the generation+trace pipeline of
    raytrace/real_ray_tracer.py:58-118).
    """
    from optiland_tpu.core.rays import RealRays

    spec = _spec_of(system, newton_iters, poly=False)
    params = build_param_table(system, wavelength)
    aim = aim_vector(system, Hx, Hy)

    dt = jnp.asarray(Px).dtype
    if jax.default_backend() != "cpu" and dt == jnp.float64:
        dt = jnp.float32
    S = system.cfg.num_surfaces
    coeffs = system.stack.coeffs.astype(dt)
    if coeffs.shape[1] == 0:
        coeffs = jnp.zeros((S, 1), dt)
    mats = jnp.zeros((S, 1), dt)
    params = params.astype(dt)
    aim = aim.astype(dt)
    Px = jnp.asarray(Px, dt)
    Py = jnp.asarray(Py, dt)

    @jax.custom_vjp
    def _traced(params, coeffs, aim, Px, Py):
        return _pallas_fwd_field(params, coeffs, mats, aim, Px, Py, spec=spec)

    def _fwd(params, coeffs, aim, Px, Py):
        out = _traced(params, coeffs, aim, Px, Py)
        return out, (params, coeffs, aim, Px, Py)

    def _bwd(res, g):
        params, coeffs, aim, Px, Py = res
        dparams, dcoeffs, daim = _pallas_bwd_field(
            params, coeffs, mats, aim, Px, Py, tuple(g), spec=spec
        )
        if dcoeffs.shape != coeffs.shape:
            dcoeffs = jnp.zeros_like(coeffs).at[
                :, : dcoeffs.shape[1]
            ].set(dcoeffs)
        return (dparams, dcoeffs, daim,
                jnp.zeros_like(Px), jnp.zeros_like(Py))

    _traced.defvjp(_fwd, _bwd)

    x, y, z, L, M, N, i, opd = _traced(params, coeffs, aim, Px, Py)
    w = jnp.full_like(x, wavelength)
    return RealRays(x=x, y=y, z=z, L=L, M=M, N=N, i=i, w=w, opd=opd)


# ---------------------------------------------------------------------------
# Fused merit kernels: RMS-spot value-and-grad entirely in VMEM
#
# The optimizer hot loop evaluates scalar merits, not ray dumps. For the
# RMS spot size of one field these kernels close the last HBM round-trips
# the "field" variant still pays:
#   * forward: pupil samples are drawn IN-KERNEL (pltpu PRNG -> uniform
#     disk), the tile is traced, and only 4 running sums
#     (Sx, Sy, Sx^2, Sy^2) leave the kernel — zero per-ray HBM traffic.
#     (The XLA threefry pupil generation alone measured 2.3 ms/step at
#     2^24 rays — 6% of the whole step; PROFILE.md device-op table.)
#   * backward: the cotangent dL/dx_r = 2(x_r - mean)/N is built in-kernel
#     from the two mean scalars, so no cotangent arrays are read either;
#     the VJP is taken of a tile-local SCALAR, which also dead-code
#     eliminates the opd/intensity adjoint chains the merit never uses.
# Gradient exactness: with L = mean((x - x̄)² + (y - ȳ)²), treating x̄, ȳ
# as constants gives the exact gradient because Σ(x - x̄) = 0.
# ---------------------------------------------------------------------------

TILE_ROWS_MERIT_BWD = 64
# PRNG seeding unit in rows: all PRNG-mode tile heights (fwd 512, bwd
# 64/32) are multiples, so the sample stream is tile-geometry-invariant.
SUB_ROWS = 32


def _bits_to_unit(bits, dtype):
    """Random 32-bit words -> uniform [0, 1) floats. Mosaic has no
    uint32->f32 cast; shift as uint32 (top 24 bits, so the int32
    reinterpretation is non-negative) and cast from int32."""
    scale = jnp.asarray(2.0 ** -24, dtype)
    return jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(bits, jnp.uint32) >> 8, jnp.int32
    ).astype(dtype) * scale


def _prng_disk(seed0, sub_base, nsub, dtype):
    """Uniform unit-disk samples, (nsub*SUB_ROWS, LANE), generated
    in-kernel: r = sqrt(u1), th = 2*pi*u2.

    The stream is keyed to the GLOBAL sub-block index (sub_base + k), not
    the grid step, so every tile geometry regenerates identical samples:
    the backward kernel (64/32-row tiles) reconstructs exactly the forward
    kernel's rays (512-row tiles) — which the gradient-exactness argument
    (sum(x - xbar) = 0 over the SAME sample set) requires — and a
    shard_map shard launched with a sub-block offset produces the same
    global sample set as the unsharded kernel."""
    u1s, u2s = [], []
    for k in range(nsub):
        pltpu.prng_seed(seed0, sub_base + k)
        u1s.append(
            _bits_to_unit(pltpu.prng_random_bits((SUB_ROWS, LANE)), dtype)
        )
        u2s.append(
            _bits_to_unit(pltpu.prng_random_bits((SUB_ROWS, LANE)), dtype)
        )
    u1 = u1s[0] if nsub == 1 else jnp.concatenate(u1s, axis=0)
    u2 = u2s[0] if nsub == 1 else jnp.concatenate(u2s, axis=0)
    r = jnp.sqrt(u1)
    th = u2 * jnp.asarray(2.0 * np.pi, dtype)
    return r * jnp.cos(th), r * jnp.sin(th)


def _valid_mask(g, tile, R):
    rowi = jax.lax.broadcasted_iota(jnp.int32, (tile, LANE), 0)
    lanei = jax.lax.broadcasted_iota(jnp.int32, (tile, LANE), 1)
    return (g * tile * LANE + rowi * LANE + lanei) < R


def _seed_vector(seed, sub_offset=0):
    """(2,) i32 SMEM vector for the PRNG-mode merit kernels: [seed,
    sub-block offset]. The offset shifts the global sub-block index —
    shard k of an R-ray bundle passes k * R_local/(SUB_ROWS*LANE) so the
    mesh jointly generates the identical sample set as one device."""
    return jnp.stack([
        jnp.asarray(seed, jnp.int32), jnp.asarray(sub_offset, jnp.int32)
    ])


def _chan_combine(s, R):
    """Chan merge of per-tile (mean_x, mean_y, M2x, M2y, n) stat rows into
    (loss, xbar, ybar), normalizing by the full ray count ``R`` (f32-safe:
    every term is centered, no mean^2-vs-variance cancellation)."""
    mx, my, m2x, m2y, n = (s[:, k] for k in range(5))
    xbar = jnp.sum(n * mx) / R
    ybar = jnp.sum(n * my) / R
    m2 = (
        jnp.sum(m2x) + jnp.sum(n * (mx - xbar) ** 2)
        + jnp.sum(m2y) + jnp.sum(n * (my - ybar) ** 2)
    )
    return m2 / R, xbar, ybar


def prng_pupil_samples(seed, num_rays, tile=None, sub_offset=0):
    """Materialize the exact unit-disk pupil samples the PRNG-mode merit
    kernels draw in-kernel (TPU only — pltpu.prng_* has no interpret-mode
    lowering). Test/debug aid: feeding the result back through the
    explicit-Px/Py path must reproduce the PRNG-mode loss and gradients
    bit-for-bit, which pins the forward/backward sample-regeneration
    contract of _prng_disk."""
    if jax.default_backend() == "cpu":
        raise NotImplementedError(
            "in-kernel pupil PRNG (pltpu.prng_*) has no interpret-mode "
            "lowering"
        )
    R = int(num_rays)
    tile = tile or _tile_rows(R, TILE_ROWS_FWD)
    if tile % SUB_ROWS:
        raise ValueError(f"tile must be a multiple of SUB_ROWS={SUB_ROWS}")
    rows = -(-R // (tile * LANE)) * tile
    grid = (rows // tile,)
    nsub = tile // SUB_ROWS
    seed_arr = _seed_vector(seed, sub_offset)

    def kernel(seed_ref, px_ref, py_ref):
        g = pl.program_id(0)
        Px, Py = _prng_disk(
            seed_ref[0], seed_ref[1] + g * nsub, nsub, px_ref.dtype
        )
        px_ref[:] = Px
        py_ref[:] = Py

    ray_spec = pl.BlockSpec(
        (tile, LANE), lambda g: (g, 0), memory_space=pltpu.VMEM
    )
    with mosaic_compile_ctx(False):
        px, py = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=[ray_spec, ray_spec],
            out_shape=[
                jax.ShapeDtypeStruct((rows, LANE), jnp.float32)
            ] * 2,
        )(seed_arr)
    return px.reshape(-1)[:R], py.reshape(-1)[:R]


def _make_merit_fwd_kernel(spec, tile, R, prng):
    """Per-tile spot statistics with LOCAL centering (Chan's parallel
    variance): raw ``sum(x**2) - sum(x)**2/N`` cancels catastrophically in
    f32 for off-axis fields (mean^2 ~ 1e6 x variance), so each tile emits
    (mean_x, mean_y, M2x, M2y, n_valid) about its own centroid and the
    host combines the per-tile rows in f64."""

    def kernel(*refs):
        params_ref, coeffs_ref, mats_ref, aim_ref = refs[:4]
        if prng:
            seed_ref = refs[4]
            acc_ref = refs[5]
        else:
            px_ref, py_ref = refs[4], refs[5]
            acc_ref = refs[6]
        g = pl.program_id(0)
        getp = lambda s, col: params_ref[s, col]
        getc = lambda s, ci: coeffs_ref[s, ci]
        getm = lambda s, mi: mats_ref[s, mi]
        geta = lambda j: aim_ref[j]
        dt = acc_ref.dtype
        if prng:
            nsub = tile // SUB_ROWS
            Px, Py = _prng_disk(
                seed_ref[0], seed_ref[1] + g * nsub, nsub, dt
            )
        else:
            Px, Py = px_ref[:], py_ref[:]
        launch = _launch_from_pupil(geta, Px, Py)
        x, y = _chain(spec, getp, getc, getm, *launch)[:2]
        valid = _valid_mask(g, tile, R)
        nt = jnp.sum(valid.astype(dt))
        ntc = jnp.maximum(nt, 1.0)
        xv = jnp.where(valid, x, 0.0)
        yv = jnp.where(valid, y, 0.0)
        mx = jnp.sum(xv) / ntc
        my = jnp.sum(yv) / ntc
        m2x = jnp.sum(jnp.where(valid, (x - mx) ** 2, 0.0))
        m2y = jnp.sum(jnp.where(valid, (y - my) ** 2, 0.0))
        stats = (mx, my, m2x, m2y, nt)
        rows = jax.lax.broadcasted_iota(jnp.int32, (8, LANE), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (8, LANE), 1)
        lin = rows * LANE + cols
        acc = jnp.zeros((8, LANE), dt)
        for k, v in enumerate(stats):
            acc = jnp.where(lin == k, v, acc)
        acc_ref[:] = acc

    return kernel


def _make_merit_bwd_kernel(spec, tile, R, prng, rows_dp):
    S = len(spec[0])
    nc = spec[4]
    n_param = S * NUM_P
    n_coeff = S * nc

    def kernel(*refs):
        params_ref, coeffs_ref, mats_ref, aim_ref, stats_ref = refs[:5]
        if prng:
            seed_ref = refs[5]
            dp_ref = refs[6]
        else:
            px_ref, py_ref = refs[5], refs[6]
            dp_ref = refs[7]
        g = pl.program_id(0)
        dt = dp_ref.dtype
        if prng:
            nsub = tile // SUB_ROWS
            Px, Py = _prng_disk(
                seed_ref[0], seed_ref[1] + g * nsub, nsub, dt
            )
        else:
            Px, Py = px_ref[:], py_ref[:]
        xbar = stats_ref[0]
        ybar = stats_ref[1]
        scale = stats_ref[2]
        valid = _valid_mask(g, tile, R)

        pvals = tuple(
            params_ref[s, c] for s in range(S) for c in range(NUM_P)
        )
        cvals = tuple(
            coeffs_ref[s, ci] for s in range(S) for ci in range(nc)
        )
        avals = tuple(aim_ref[j] for j in range(N_AIM))

        def f_scalar(pv, cv, av):
            getp = lambda s, col: pv[s * NUM_P + col]
            getc = lambda s, ci: cv[s * nc + ci]
            geta = lambda j: av[j]
            launch = _launch_from_pupil(geta, Px, Py)
            x, y = _chain(
                spec, getp, getc, lambda s, mi: 0.0, *launch
            )[:2]
            contrib = (x - xbar) ** 2 + (y - ybar) ** 2
            return jnp.sum(jnp.where(valid, contrib, 0.0)) * scale

        _, vjp = jax.vjp(f_scalar, pvals, cvals, avals)
        dpv, dcv, dav = vjp(jnp.asarray(1.0, dt))

        rows = jax.lax.broadcasted_iota(jnp.int32, (rows_dp, LANE), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (rows_dp, LANE), 1)
        lin = rows * LANE + cols
        acc = jnp.zeros((rows_dp, LANE), dt)
        for idx, v in enumerate(dpv):
            acc = jnp.where(lin == idx, v, acc)
        for jdx, v in enumerate(dcv):
            acc = jnp.where(lin == n_param + jdx, v, acc)
        for kdx, v in enumerate(dav):
            acc = jnp.where(lin == n_param + n_coeff + kdx, v, acc)

        @pl.when(g == 0)
        def _():
            dp_ref[:] = acc

        @pl.when(g > 0)
        def _():
            dp_ref[:] = dp_ref[:] + acc

    return kernel


@functools.partial(
    jax.jit, static_argnames=("spec", "R", "prng", "tile")
)
def _pallas_merit_fwd(params, coeffs, mats, aim, seed, Px, Py, spec, R,
                      prng, tile):
    rows = -(-R // (tile * LANE)) * tile
    grid = (rows // tile,)
    dtype = params.dtype
    ray_in = []
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] * 4
    if prng:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        ray_in.append(seed)
    else:
        arrs, _ = _pad_ray_arrays([Px, Py], tile, ones_idx=())
        ray_spec = pl.BlockSpec(
            (tile, LANE), lambda g: (g, 0), memory_space=pltpu.VMEM
        )
        in_specs += [ray_spec, ray_spec]
        ray_in += arrs
    acc_spec = pl.BlockSpec(
        (8, LANE), lambda g: (g, 0), memory_space=pltpu.VMEM
    )
    kernel = _make_merit_fwd_kernel(spec, tile, R, prng)
    interpret = jax.default_backend() == "cpu"
    with mosaic_compile_ctx(interpret):
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=acc_spec,
            out_shape=jax.ShapeDtypeStruct((grid[0] * 8, LANE), dtype),
            interpret=interpret,
        )(params, coeffs, mats, aim, *ray_in)
    # (grid, 5) per-tile rows: mean_x, mean_y, M2x, M2y, n
    return out.reshape(grid[0], 8, LANE)[:, 0, :5]


@functools.partial(
    jax.jit, static_argnames=("spec", "R", "prng", "tile")
)
def _pallas_merit_bwd(params, coeffs, mats, aim, stats, seed, Px, Py,
                      spec, R, prng, tile):
    S = len(spec[0])
    nc = spec[4]
    total = S * (NUM_P + nc) + N_AIM
    rows_dp = max(8, -(-(-(-total // LANE)) // 8) * 8)
    rows = -(-R // (tile * LANE)) * tile
    grid = (rows // tile,)
    dtype = params.dtype
    ray_in = []
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] * 5
    if prng:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        ray_in.append(seed)
    else:
        arrs, _ = _pad_ray_arrays([Px, Py], tile, ones_idx=())
        ray_spec = pl.BlockSpec(
            (tile, LANE), lambda g: (g, 0), memory_space=pltpu.VMEM
        )
        in_specs += [ray_spec, ray_spec]
        ray_in += arrs
    dp_spec = pl.BlockSpec(
        (rows_dp, LANE), lambda g: (0, 0), memory_space=pltpu.VMEM
    )
    kernel = _make_merit_bwd_kernel(spec, tile, R, prng, rows_dp)
    interpret = jax.default_backend() == "cpu"
    with mosaic_compile_ctx(interpret):
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=dp_spec,
            out_shape=jax.ShapeDtypeStruct((rows_dp, LANE), dtype),
            interpret=interpret,
        )(params, coeffs, mats, aim, stats, *ray_in)
    flat = out.reshape(-1)
    dparams = flat[: S * NUM_P].reshape(S, NUM_P)
    dcoeffs = flat[S * NUM_P : S * (NUM_P + nc)].reshape(S, nc)
    daim = flat[S * (NUM_P + nc) : S * (NUM_P + nc) + N_AIM]
    return dparams, dcoeffs, daim


def spot_rms_fast_field(system, Hx, Hy, wavelength, num_rays=None,
                        seed=0, Px=None, Py=None, newton_iters: int = 10,
                        bwd_tile: int | None = None):
    """Fused RMS-spot merit (mean squared distance to the centroid) for one
    infinite-conjugate angle field — the optimizer-step hot op.

    Equivalent to tracing ``num_rays`` uniform-disk pupil samples with
    ``trace_fast_field`` and computing
    ``mean((x - mean(x))**2 + (y - mean(y))**2)``, but the whole
    value-and-grad pipeline runs inside two Pallas kernels with zero
    per-ray HBM traffic (see section comment). With explicit ``Px/Py`` the
    samples are taken from HBM instead of the in-kernel PRNG (used by the
    CPU-interpret parity tests). jax.grad flows to every stack leaf via
    the in-kernel scalar VJP.

    (reference analog: the merit evaluations of
    optimization/batched_evaluator.py:277+ driving
    raytrace/real_ray_tracer.py:58-118)
    """
    spec = _spec_of(system, newton_iters, poly=False)
    params = build_param_table(system, wavelength)
    aim = aim_vector(system, Hx, Hy)

    prng = Px is None
    dt = jnp.float32 if jax.default_backend() != "cpu" else (
        jnp.float64 if jax.config.read("jax_enable_x64") else jnp.float32
    )
    if prng:
        if num_rays is None:
            raise ValueError("num_rays is required in PRNG mode")
        if jax.default_backend() == "cpu":
            raise NotImplementedError(
                "in-kernel pupil PRNG (pltpu.prng_*) has no interpret-mode "
                "lowering; pass explicit Px/Py on CPU"
            )
        R = int(num_rays)
        seed_arr = _seed_vector(seed)
        Px_in = Py_in = jnp.zeros((0,), dt)
    else:
        Px_in = jnp.asarray(Px, dt)
        Py_in = jnp.asarray(Py, dt)
        R = int(Px_in.shape[0])
        seed_arr = jnp.zeros((2,), jnp.int32)
    S = system.cfg.num_surfaces
    coeffs = system.stack.coeffs.astype(dt)
    if coeffs.shape[1] == 0:
        coeffs = jnp.zeros((S, 1), dt)
    mats = jnp.zeros((S, 1), dt)
    params = params.astype(dt)
    aim = aim.astype(dt)
    fwd_tile = _tile_rows(R, _fwd_cap(spec))
    bwd_tile = bwd_tile or _tile_rows(
        R, min(TILE_ROWS_MERIT_BWD, _bwd_cap(spec))
    )
    if prng and (fwd_tile % SUB_ROWS or bwd_tile % SUB_ROWS):
        raise ValueError(
            f"PRNG-mode tile heights must be multiples of SUB_ROWS="
            f"{SUB_ROWS} (got fwd {fwd_tile}, bwd {bwd_tile})"
        )

    def _combine(s):
        return _chan_combine(s, R)

    @jax.custom_vjp
    def _loss(params, coeffs, aim):
        s = _pallas_merit_fwd(
            params, coeffs, mats, aim, seed_arr, Px_in, Py_in,
            spec=spec, R=R, prng=prng, tile=fwd_tile,
        )
        return _combine(s)[0]

    def _fwd(params, coeffs, aim):
        s = _pallas_merit_fwd(
            params, coeffs, mats, aim, seed_arr, Px_in, Py_in,
            spec=spec, R=R, prng=prng, tile=fwd_tile,
        )
        loss, xbar, ybar = _combine(s)
        return loss, (params, coeffs, aim, xbar, ybar)

    def _bwd(res, gl):
        params, coeffs, aim, xbar, ybar = res
        stats = jnp.stack(
            [xbar, ybar, jnp.asarray(gl, params.dtype) / R, 0.0 * xbar]
        ).astype(params.dtype)
        dparams, dcoeffs, daim = _pallas_merit_bwd(
            params, coeffs, mats, aim, stats, seed_arr, Px_in, Py_in,
            spec=spec, R=R, prng=prng, tile=bwd_tile,
        )
        # dcoeffs matches the (possibly width-padded) coeffs argument; when
        # the system has no geometry coeffs the padded column is a local
        # constant and its cotangent is discarded by construction.
        return dparams, dcoeffs, daim

    _loss.defvjp(_fwd, _bwd)
    return _loss(params, coeffs, aim)


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------


def pallas_supported(system, poly: bool = False) -> bool:
    """True when the fast kernels cover this system's structure."""
    from optiland_tpu.physical_apertures import RadialAperture

    cfg = system.cfg

    def _inter_ok(i):
        # grating interactions run in-kernel (mono only: the m*wavelength
        # product is baked into the P_MLAM param column)
        return i is None or (
            not poly and isinstance(i, tuple) and i[0] == "grating"
        )

    if cfg.interactions is not None and not all(
        _inter_ok(i) for i in cfg.interactions
    ):
        return False
    if cfg.apertures is not None and any(
        a is not None and type(a) is not RadialAperture
        for a in cfg.apertures
    ):
        return False
    if cfg.coatings is not None and any(c is not None for c in cfg.coatings):
        return False
    if cfg.bsdfs is not None and any(b is not None for b in cfg.bsdfs):
        return False
    if cfg.polarized:
        return False
    if poly:
        if cfg.has_absorption:
            return False
        bad_formula = {dispersion.TABULATED_N}
        if any(f in bad_formula for f in cfg.mat_formulas):
            return False
    return all(c in OK_CODES for c in cfg.geom_codes)


def _aperture_columns(system):
    """(ap_max, ap_min) per surface: RadialAperture objects override the
    stack's circular semi-aperture (matching core.trace's clip dispatch)."""
    stack, cfg = system.stack, system.cfg
    ap_max = stack.ap_max
    ap_min = jnp.zeros_like(stack.ap_max)
    if cfg.apertures is not None:
        for s, a in enumerate(cfg.apertures):
            if a is not None:
                ap_max = ap_max.at[s].set(float(a.r_max))
                ap_min = ap_min.at[s].set(float(a.r_min))
    return ap_max, ap_min


def build_param_table(system, wavelength):
    """Precompute the (S, NUM_P) scalar table for a monochromatic trace."""
    from optiland_tpu.core.system import k_of, n_all, positions

    stack, cfg = system.stack, system.cfg
    S = cfg.num_surfaces
    n = n_all(stack, cfg, wavelength)
    pos = positions(stack)
    # k of the medium *before* each surface (material_post of s-1), folded
    # with 1/wavelength so the kernel's Beer-Lambert term needs no divide.
    # Row 0 of the k column stores the wavelength itself (object row never
    # applies absorption because k_pre[0] would be the pre-object medium).
    wl = jnp.asarray(wavelength, stack.radius.dtype)
    k_rows = [jnp.zeros((), stack.radius.dtype)]
    for s2 in range(1, S):
        k_rows.append(
            jnp.ravel(k_of(stack.ktab[s2 - 1], wl))[0] / wl
        )
    k_pre = jnp.stack(k_rows)
    ap_max, ap_min = _aperture_columns(system)
    mlam = jnp.asarray([
        float(i[1]) * float(wavelength)
        if (i is not None and isinstance(i, tuple) and i[0] == "grating")
        else 0.0
        for i in (cfg.interactions or (None,) * S)
    ], stack.radius.dtype)
    params = jnp.stack(
        [
            stack.radius, stack.conic, pos + stack.dz, n, ap_max,
            k_pre, stack.dx, stack.dy, stack.rx, stack.ry, stack.rz,
            stack.geo_p1, stack.geo_p2, ap_min, mlam,
        ],
        axis=1,
    )
    # reflective surfaces keep the incident medium
    refl = jnp.asarray(cfg.reflective)
    n_eff = jnp.where(refl, jnp.roll(n, 1), n)
    params = params.at[:, P_NPOST].set(n_eff)
    return params


def _poly_param_table(system):
    """Param table for the polychromatic kernel (index column unused)."""
    from optiland_tpu.core.system import positions

    stack = system.stack
    pos = positions(stack)
    zero = jnp.zeros_like(stack.radius)
    ap_max, ap_min = _aperture_columns(system)
    return jnp.stack(
        [
            stack.radius, stack.conic, pos + stack.dz, zero, ap_max,
            zero, stack.dx, stack.dy, stack.rx, stack.ry, stack.rz,
            stack.geo_p1, stack.geo_p2, ap_min, zero,
        ],
        axis=1,
    )


def _run_fast(system, rays, params, poly, newton_iters, bwd_tile=None):
    from optiland_tpu.core.rays import RealRays

    spec = _spec_of(system, newton_iters, poly)
    dt = rays.x.dtype
    if jax.default_backend() != "cpu" and dt == jnp.float64:
        # compiled Mosaic kernels are 32-bit only (see mosaic_compile_ctx);
        # the performance path runs f32 on TPU regardless of x64 mode
        dt = jnp.float32
    S = system.cfg.num_surfaces
    # zero-width blocks are not lowerable; keep >=1 (kernel reads only nc/nm)
    coeffs = system.stack.coeffs.astype(dt)
    if coeffs.shape[1] == 0:
        coeffs = jnp.zeros((S, 1), dt)
    mats = system.stack.mat_coeffs.astype(dt) if poly else jnp.zeros(
        (S, 1), dt
    )
    if poly and mats.shape[1] == 0:
        mats = jnp.zeros((S, 1), dt)
    params = params.astype(dt)

    @jax.custom_vjp
    def _traced(params, coeffs, mats, *ray_in):
        return _pallas_fwd(params, coeffs, mats, ray_in, spec=spec, poly=poly)

    def _fwd(params, coeffs, mats, *ray_in):
        out = _traced(params, coeffs, mats, *ray_in)
        return out, (params, coeffs, mats, ray_in)

    def _bwd(res, g):
        params, coeffs, mats, ray_in = res
        ray_grads, dparams, dcoeffs, dmats = _pallas_bwd(
            params, coeffs, mats, tuple(ray_in), tuple(g),
            spec=spec, poly=poly, bwd_tile=bwd_tile,
        )
        # kernel grads cover only the true nc/nm columns; pad to block width
        if dcoeffs.shape != coeffs.shape:
            dcoeffs = jnp.zeros_like(coeffs).at[
                :, : dcoeffs.shape[1]
            ].set(dcoeffs)
        if dmats.shape != mats.shape:
            dmats = jnp.zeros_like(mats).at[:, : dmats.shape[1]].set(dmats)
        if poly:
            # wavelength cotangent: not propagated (w is sampling data)
            ray_grads = ray_grads + (jnp.zeros_like(ray_in[8]),)
        return (dparams, dcoeffs, dmats) + ray_grads

    _traced.defvjp(_fwd, _bwd)

    ray_in = (rays.x, rays.y, rays.z, rays.L, rays.M, rays.N, rays.i, rays.opd)
    if poly:
        ray_in = ray_in + (rays.w,)
    ray_in = tuple(a.astype(dt) for a in ray_in)
    out = _traced(params, coeffs, mats, *ray_in)
    x, y, z, L, M, N, i, opd = out
    return RealRays(x=x, y=y, z=z, L=L, M=M, N=N, i=i, w=rays.w, opd=opd)


def trace_fast(system, rays, wavelength, newton_iters: int = 10,
               bwd_tile: int | None = None):
    """Fused Pallas trace, monochromatic (final state only; f32 recommended).

    Equivalent to optiland_tpu.core.trace.trace(..., record=False) for
    supported systems; jax.grad runs the fused backward kernel. params/
    coeffs are plain differentiable functions of the stack, so outer AD
    composes their VJP with the kernel's custom VJP automatically.
    ``bwd_tile`` overrides the adjoint tile height (shard_map callers use
    TILE_ROWS_BWD_SHARDED — the wrapped kernel gets less scoped VMEM).
    """
    params = build_param_table(system, wavelength)
    return _run_fast(system, rays, params, poly=False,
                     newton_iters=newton_iters, bwd_tile=bwd_tile)


def trace_fast_poly(system, rays, newton_iters: int = 10):
    """Fused Pallas trace with per-ray wavelengths (rays.w, um).

    Each surface's refractive index is evaluated in-kernel from its static
    dispersion-formula code and SMEM coefficient row — one kernel launch
    for an arbitrary wavelength mix (reference analog: per-ray n lookups in
    rays/real_rays.py:163-187 through the material objects).
    """
    params = _poly_param_table(system)
    return _run_fast(system, rays, params, poly=True,
                     newton_iters=newton_iters)
