"""Real-ray trace engine: unrolled surface loop, fully fused under XLA.

The reference traces rays with a Python loop over Surface objects
(reference: optiland/surfaces/surface_group.py:245-257 and
standard_surface.py:200-248). Here the loop unrolls at trace time with each
surface's geometry/material/mirror dispatch resolved *statically* (codes
live in SystemConfig), so XLA sees one elementwise DAG over the ray batch:
localize -> intersect -> propagate (+absorption) -> OPD accumulate ->
aperture clip -> surface normal -> refract/reflect -> globalize, repeated
per surface. No data-dependent branches means maximal fusion and minimal
HBM traffic on TPU.

Vignetted/TIR rays are masked by intensity, never removed: shapes stay
static for XLA.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from optiland_tpu.core import geometry as geom
from optiland_tpu.core.rays import RealRays
from optiland_tpu.core.system import (
    SurfaceStack,
    System,
    SystemConfig,
    k_of,
    n_of,
    positions,
)
from optiland_tpu.ops import kernels


def _surface_step(stack, cfg, s, pos_s, state):
    """Trace the ray bundle through surface ``s`` (static index)."""
    x, y, z, L, M, N, inten, opd, w, n_pre, p, key = state
    radius = stack.radius[s]
    conic = stack.conic[s]
    coeffs = stack.coeffs[s]
    p1 = stack.geo_p1[s]
    p2 = stack.geo_p2[s]
    code = cfg.geom_codes[s]
    aux = cfg.geom_aux[s] if cfg.geom_aux is not None else None

    # Localize (reference: coordinate_system.py:73-89; dz is the flattened
    # z-decenter of a chained CS on top of the cumulative-thickness vertex)
    x = x - stack.dx[s]
    y = y - stack.dy[s]
    z = z - (pos_s + stack.dz[s])
    if cfg.has_tilts:
        x, y, L, M = kernels.rotate_z(x, y, L, M, -stack.rz[s])
        x, z, L, N = kernels.rotate_y(x, z, L, N, -stack.ry[s])
        y, z, M, N = kernels.rotate_x(y, z, M, N, -stack.rx[s])

    # Intersect + propagate. NURBS and grid-sag surfaces fuse the
    # distance solve with the normal: the converged parameter point /
    # cell coefficients yield both, so a separate surface_normal call
    # (which would repeat the whole solve) is skipped.
    fused_normal = None
    if code == geom.NURBS:
        from optiland_tpu.core import nurbs as _nurbs

        t, fused_normal = _nurbs.intersect(coeffs, aux, x, y, z, L, M, N)
    elif code == geom.GRID_SAG:
        t, fused_normal = geom._intersect_grid(coeffs, x, y, z, L, M, N, aux)
    else:
        t = geom.distance_static(
            code, radius, conic, coeffs, x, y, z, L, M, N,
            p1=p1, p2=p2, aux=aux,
        )
    x = x + t * L
    y = y + t * M
    z = z + t * N

    # Absorption in the pre-surface medium (Beer-Lambert; t mm, w um)
    if cfg.has_absorption:
        k_pre = k_of(stack.ktab[s - 1], w)
        inten = inten * jnp.exp(-4 * jnp.pi * k_pre / w * t * 1e3)

    # OPD accumulation (reference: standard_surface.py:244)
    opd = opd + jnp.abs(t * n_pre)

    # Physical aperture clip (local frame)
    ap_obj = cfg.apertures[s] if cfg.apertures is not None else None
    if ap_obj is not None:
        inten = ap_obj.clip(inten, x, y)
    else:
        ap = stack.ap_max[s]
        inten = jnp.where(x**2 + y**2 > ap**2, 0.0, inten)

    # Normal + interaction
    if fused_normal is not None:
        nx, ny, nz = fused_normal
    else:
        nx, ny, nz = geom.surface_normal_static(
            code, radius, conic, coeffs, x, y, p1=p1, p2=p2, aux=aux
        )
    nx_raw, ny_raw, nz_raw = nx, ny, nz
    L0, M0, N0 = L, M, N  # pre-interaction directions
    inter = cfg.interactions[s] if cfg.interactions is not None else None
    if inter is not None and inter[0] == "thin_lens":
        # Ideal thin lens with focal length f = geo_p1
        # (reference: interactions/thin_lens_interaction_model.py:24+)
        f = p1
        n_post = (
            n_pre if cfg.reflective[s]
            else n_of(cfg.mat_formulas[s], stack.mat_coeffs[s], stack.ntab[s], w)
        )
        opd = opd - (x**2 + y**2) / (2 * f)
        Ln = L / jnp.abs(N)
        Mn = M / jnp.abs(N)
        Nn = N / jnp.abs(N)
        if cfg.reflective[s]:
            f1 = f2 = -f * jnp.sign(N)
        else:
            fs = f * jnp.sign(N)
            f1 = fs * n_pre
            f2 = fs * n_post
        Lb = Ln * f1 - x
        Mb = Mn * f1 - y
        Nb = jnp.where(N > 0, f2, -f2)
        neg = f < 0
        L = jnp.where(neg, -Lb, Lb)
        M = jnp.where(neg, -Mb, Mb)
        N = jnp.where(neg, -Nb, Nb)
        mag = jnp.sqrt(L**2 + M**2 + N**2)
        L, M, N = L / mag, M / mag, N / mag
        n_next = n_post
    elif inter is not None and inter[0] == "phase":
        # Generalized Snell's law via phase-profile gradient
        # (reference: interactions/phase_interaction_model.py:18-135)
        profile = inter[1]
        # The reference's Plane geometry reports a +z normal (plane.py:90-102)
        # while other geometries report -z at the vertex; the thin-sheet phase
        # model is defined on planes, so match that convention here.
        if code == geom.PLANE:
            nx, ny, nz = -nx, -ny, -nz
        n_post = (
            n_pre if cfg.reflective[s]
            else n_of(cfg.mat_formulas[s], stack.mat_coeffs[s], stack.ntab[s], w)
        )
        k0 = 2 * jnp.pi / (w * 1e-3)
        k_ix = n_pre * k0 * L
        k_iy = n_pre * k0 * M
        k_iz = n_pre * k0 * N
        phase_val = profile.get_phase(x, y, w)
        gx, gy, gz = profile.get_gradient(x, y, w)
        g_dot_n = gx * nx + gy * ny + gz * nz
        Gx, Gy, Gz = gx - g_dot_n * nx, gy - g_dot_n * ny, gz - g_dot_n * nz
        kin_dot_n = k_ix * nx + k_iy * ny + k_iz * nz
        px_ = k_ix - kin_dot_n * nx + Gx
        py_ = k_iy - kin_dot_n * ny + Gy
        pz_ = k_iz - kin_dot_n * nz + Gz
        R_sq = (n_post * k0) ** 2 - (px_**2 + py_**2 + pz_**2)
        inten = jnp.where(R_sq < 0.0, 0.0, inten)
        alpha = jnp.sqrt(jnp.maximum(R_sq, 0.0))
        alpha = jnp.where(cfg.reflective[s], -alpha, alpha)
        kx = px_ + alpha * nx
        ky = py_ + alpha * ny
        kz = pz_ + alpha * nz
        kmag = jnp.sqrt(kx**2 + ky**2 + kz**2)
        L, M, N = kx / kmag, ky / kmag, kz / kmag
        opd = opd - phase_val / k0
        inten = inten * profile.efficiency
        n_next = n_pre if cfg.reflective[s] else n_post
    elif inter is not None and inter[0] == "grating":
        # Vector grating diffraction: tangential momentum conservation with
        # the grating vector G = (m w / d) f
        # (reference: rays/real_rays.py:207-430 gratingdiffract,
        # interactions/diffractive_model.py:23-61; validated term-for-term
        # against the reference's expanded formula).
        m_ord = inter[1]
        d = p1  # grating period (um), differentiable via geo_p1
        alpha = p2  # groove orientation angle (rad) via geo_p2
        if code == geom.PLANE:
            # (reference: plane_grating.py:76-83)
            ones = jnp.ones_like(x)
            fx = -jnp.sin(alpha) * ones
            fy = jnp.cos(alpha) * ones
            fz = jnp.zeros_like(x)
        else:
            # f = -normalize(n x t), t the groove tangent
            # (reference: standard_grating.py:86-140, 208-231)
            r2 = x**2 + y**2
            denom = radius * jnp.sqrt(
                jnp.maximum(1 - (1 + conic) * r2 / radius**2, 1e-14)
            )
            ta = jnp.tan(alpha)
            dzd = (x + y * ta) / denom
            tmag = jnp.sqrt(1 + ta**2 + dzd**2)
            tx, ty, tz = 1.0 / tmag, ta / tmag, dzd / tmag
            gx = ny * tz - nz * ty
            gy = -nx * tz + nz * tx
            gz = nx * ty - ny * tx
            gmag = jnp.sqrt(gx**2 + gy**2 + gz**2)
            fx, fy, fz = -gx / gmag, -gy / gmag, -gz / gmag
        # projection-corrected period (reference: diffractive_model.py:51-52).
        # The transverse norm is clamped: a groove vector with no transverse
        # component (f along z) would otherwise divide by zero and NaN the
        # whole bundle (and, through the shared VJP, every parameter grad).
        d_eff = d / jnp.sqrt(jnp.maximum(fx**2 + fy**2, 1e-12))
        n_post = (
            n_pre if cfg.reflective[s]
            else n_of(cfg.mat_formulas[s], stack.mat_coeffs[s], stack.ntab[s], w)
        )
        sgn_n = jnp.sign(L * nx + M * ny + N * nz)
        nax, nay, naz = nx * sgn_n, ny * sgn_n, nz * sgn_n
        kn = L * nax + M * nay + N * naz
        fn = fx * nax + fy * nay + fz * naz
        Ptx = d_eff * n_pre * (L - kn * nax) + m_ord * w * (fx - fn * nax)
        Pty = d_eff * n_pre * (M - kn * nay) + m_ord * w * (fy - fn * nay)
        Ptz = d_eff * n_pre * (N - kn * naz) + m_ord * w * (fz - fn * naz)
        rad = (d_eff * n_post) ** 2 - (Ptx**2 + Pty**2 + Ptz**2)
        inten = jnp.where(rad < 0, 0.0, inten)  # evanescent orders
        root = jnp.sqrt(jnp.maximum(rad, 0.0))
        if cfg.reflective[s]:
            L = (-Ptx + nax * root) / (d_eff * n_post)
            M = (-Pty + nay * root) / (d_eff * n_post)
            N = (-Ptz + naz * root) / (d_eff * n_post)
        else:
            L = (Ptx + nax * root) / (d_eff * n_post)
            M = (Pty + nay * root) / (d_eff * n_post)
            N = (Ptz + naz * root) / (d_eff * n_post)
        n_next = n_post
    elif cfg.reflective[s]:
        L, M, N = kernels.reflect(L, M, N, nx, ny, nz)
        n_next = n_pre
    else:
        n_post = n_of(cfg.mat_formulas[s], stack.mat_coeffs[s], stack.ntab[s], w)
        L, M, N = kernels.refract(L, M, N, nx, ny, nz, n_pre, n_post)
        n_next = n_post

    # BSDF scatter then coating (reference: interactions/base.py:111-128)
    bsdf = cfg.bsdfs[s] if cfg.bsdfs is not None else None
    if bsdf is not None:
        import jax

        key, sub = jax.random.split(key)
        # scatter about the normal aligned with the outgoing hemisphere
        sgn_out = jnp.sign(L * nx_raw + M * ny_raw + N * nz_raw)
        L, M, N = bsdf.scatter(
            sub, L, M, N, nx_raw * sgn_out, ny_raw * sgn_out, nz_raw * sgn_out
        )

    coat = cfg.coatings[s] if cfg.coatings is not None else None
    refl_s = bool(cfg.reflective[s])
    if coat is not None:
        inten = inten * coat.intensity_factor(refl_s)
    if p is not None:
        from optiland_tpu.coatings import BaseCoating
        from optiland_tpu.polarization import update_p

        jones_model = coat.jones() if coat is not None else None
        if jones_model is not None:
            aoi = BaseCoating.compute_aoi(
                L0, M0, N0, nx_raw, ny_raw, nz_raw
            )
            jm = jones_model.calculate_matrix(
                L0, M0, N0, L, M, N, w, reflect=refl_s, aoi=aoi
            )
        else:
            jm = None
        p = update_p(p, L0, M0, N0, L, M, N, jm)

    # Globalize
    if cfg.has_tilts:
        y, z, M, N = kernels.rotate_x(y, z, M, N, stack.rx[s])
        x, z, L, N = kernels.rotate_y(x, z, L, N, stack.ry[s])
        x, y, L, M = kernels.rotate_z(x, y, L, M, stack.rz[s])
    x = x + stack.dx[s]
    y = y + stack.dy[s]
    z = z + pos_s + stack.dz[s]

    return (x, y, z, L, M, N, inten, opd, w, n_next, p, key)


# OPTILAND_TPU_TRACE_ENGINE: "auto" (default) picks the scan engine for
# deep scan-supported systems; "unrolled"/"scan" force a path. Read per
# call so it can be toggled after import (e.g. by tests).
_ENGINE_MODES = ("auto", "unrolled", "scan")
# Measured on this host (tools/measure_scan_threshold.py, table in
# docs/PROFILE.md): unrolled XLA compile grows ~0.5 s/surface while the
# scan engine compiles in a flat ~0.5 s, with scan RUNTIME equal-or-better
# only from 8 surfaces up (2.3x slower at 6 surfaces on cached-compile
# workloads). 8 is therefore the argmin of the committed table for both
# regimes; the TPU hot path is unaffected (Pallas dispatch precedes engine
# selection).
_AUTO_SCAN_MIN_SURFACES = 8


def _engine_mode() -> str:
    mode = os.environ.get("OPTILAND_TPU_TRACE_ENGINE", "auto").lower()
    if mode not in _ENGINE_MODES:
        raise ValueError(
            f"OPTILAND_TPU_TRACE_ENGINE={mode!r}; expected one of "
            f"{_ENGINE_MODES}"
        )
    return mode


def trace(system: System, rays: RealRays, record: bool = True, key=None,
          wavelength=None):
    """Trace a ray bundle through every surface of the system.

    Args:
        system: the compiled system.
        rays: launch bundle (global coordinates, object space).
        record: if True, also return per-surface history stacked with the
            launch state as row 0 (matching the reference's recorded arrays
            incl. the object-surface row,
            reference: surfaces/surface_group.py:108-153).
        key: PRNG key, required when any surface has a BSDF.
        wavelength: optional CONCRETE scalar (Python/NumPy float). When
            given on an accelerator backend with record=False, the trace
            dispatches to the fused Pallas kernels (monochromatic
            trace_fast, or trace_fast_pol for polarized systems) — the
            TPU hot path — with identical semantics for supported
            structures. A traced value or None keeps the XLA path.

    Returns:
        (final_rays, history) — history is a dict of (S, R) arrays
        (x, y, z, L, M, N, intensity, opd) or None when record=False. For
        polarized systems (cfg.polarized), history additionally carries the
        final per-ray polarization matrices under "p".
    """
    stack, cfg = system.stack, system.cfg
    mode = _engine_mode()
    # Pallas fast path: only on TPU (the kernels use Mosaic/pltpu memory
    # spaces and would fail to lower on GPU), only for f32 rays (the
    # kernels compute in f32; dispatching f64 rays would silently change
    # result precision under jax_enable_x64), and only when no engine is
    # explicitly forced via OPTILAND_TPU_TRACE_ENGINE.
    if (
        not record
        and key is None
        and mode == "auto"
        and isinstance(wavelength, (int, float, np.floating))
        and jax.default_backend() == "tpu"
        and rays.x.dtype == jnp.float32
    ):
        from optiland_tpu.ops import pallas_pol, pallas_trace

        if cfg.polarized and pallas_pol.pallas_pol_supported(
            system, float(wavelength)
        ):
            out, p = pallas_pol.trace_fast_pol(
                system, rays, float(wavelength)
            )
            out = out.replace(L0=rays.L, M0=rays.M, N0=rays.N)
            return out, {"p": p}
        if not cfg.polarized and pallas_trace.pallas_supported(system):
            out = pallas_trace.trace_fast(system, rays, float(wavelength))
            return out, None
    # Deep systems: the unrolled graph's XLA compile time is
    # O(num_surfaces) and dominates test/analysis wall-clock (a
    # 24-surface .zmx compiles for >60 s); the scan body compiles once
    # per distinct geometry family. Auto-selected on every backend (the
    # Pallas kernel still owns the TPU hot path via trace_fast).
    if mode == "scan":
        if not scan_supported(cfg):
            raise ValueError(
                "OPTILAND_TPU_TRACE_ENGINE=scan but this system is not "
                "scan-supported (custom interactions/coatings/BSDFs/"
                "polarization or non-array apertures)."
            )
        return trace_scan(system, rays, record=record)
    if (
        mode == "auto"
        and cfg.num_surfaces >= _AUTO_SCAN_MIN_SURFACES
        and scan_supported(cfg)
    ):
        return trace_scan(system, rays, record=record)
    n0 = n_of(cfg.mat_formulas[0], stack.mat_coeffs[0], stack.ntab[0], rays.w)
    has_bsdf = cfg.bsdfs is not None and any(b is not None for b in cfg.bsdfs)
    if has_bsdf and key is None:
        raise ValueError("A PRNG key is required to trace systems with BSDFs.")
    p = None
    if cfg.polarized:
        from optiland_tpu.polarization import complex_dtype

        R = rays.x.shape[0]
        p = jnp.broadcast_to(
            jnp.eye(3, dtype=complex_dtype(rays.x.dtype)), (R, 3, 3)
        )
    state = (
        rays.x, rays.y, rays.z, rays.L, rays.M, rays.N, rays.i, rays.opd,
        rays.w, n0, p, key,
    )
    pos = positions(stack)

    recs = []
    for s in range(1, cfg.num_surfaces):
        state = _surface_step(stack, cfg, s, pos[s], state)
        if record:
            recs.append(state[:8])

    x, y, z, L, M, N, inten, opd, w, _, p, _ = state
    out = RealRays(x=x, y=y, z=z, L=L, M=M, N=N, i=inten, w=w, opd=opd)
    if cfg.polarized:
        out = out.replace(L0=rays.L, M0=rays.M, N0=rays.N)

    history = None
    if record:
        launch = (
            rays.x, rays.y, rays.z, rays.L, rays.M, rays.N, rays.i, rays.opd
        )
        names = ("x", "y", "z", "L", "M", "N", "intensity", "opd")
        history = {
            name: jnp.stack([launch[k]] + [r[k] for r in recs], axis=0)
            for k, name in enumerate(names)
        }
        if cfg.polarized:
            history["p"] = p
    elif cfg.polarized:
        history = {"p": p}
    return out, history


# ---------------------------------------------------------------------------
# Scan-based trace: compile time independent of surface count
# ---------------------------------------------------------------------------

# Every sag family the Pallas kernel covers (ops/pallas_trace.py OK_CODES);
# aux-bearing families (Zernike sag, Forbes) compile one scan branch per
# distinct (code, aux) pair. Grid sag and NURBS stay on the unrolled path
# (their aux carries whole grids / knot vectors).
_SCAN_CODES = frozenset({
    geom.PLANE, geom.STANDARD, geom.EVEN_ASPHERE, geom.ODD_ASPHERE,
    geom.POLYNOMIAL_XY, geom.CHEBYSHEV, geom.ZERNIKE_SAG, geom.TOROIDAL,
    geom.BICONIC, geom.FORBES_QBFS, geom.FORBES_Q2D,
})


def scan_supported(cfg: SystemConfig) -> bool:
    """True when the system can be traced by the ``lax.scan`` engine: any
    closed-form/Newton sag family (one compiled ``lax.switch`` branch per
    distinct geometry family, so compile time is O(#families), not
    O(#surfaces)), plain refract/reflect interactions, array apertures.

    Addresses the unrolled loop's O(num_surfaces) compile time
    (deep systems like the reference's lithography sample,
    samples/lithography.py:8, compile in seconds instead of minutes).
    The Pallas kernel still owns the TPU hot path via trace_fast.
    """
    if any(c not in _SCAN_CODES for c in cfg.geom_codes[1:]):
        return False
    from optiland_tpu.physical_apertures import (
        OffsetRadialAperture, RadialAperture,
    )

    if cfg.interactions is not None and any(
        i is not None for i in cfg.interactions
    ):
        return False
    if cfg.apertures is not None and any(
        a is not None and type(a) not in (RadialAperture,
                                          OffsetRadialAperture)
        for a in cfg.apertures
    ):
        return False
    if cfg.coatings is not None and any(c is not None for c in cfg.coatings):
        return False
    if cfg.bsdfs is not None and any(b is not None for b in cfg.bsdfs):
        return False
    if cfg.polarized:
        return False
    return True


def trace_scan(system: System, rays: RealRays, record: bool = True):
    """``lax.scan`` over surfaces: the body is traced/compiled once per
    distinct geometry family present in the system.

    Semantics identical to the unrolled path for scan_supported systems —
    each surface dispatches through a ``lax.switch`` whose branch list is
    the (static) set of distinct (geometry code, aux) pairs, so a
    20-surface all-asphere system compiles one asphere branch, not 20
    unrolled steps (the reference's Python-polymorphic loop has no compile
    cost but ~100x the per-ray cost; surface_group.py:245-257).
    """
    from jax import lax

    stack, cfg = system.stack, system.cfg
    S = cfg.num_surfaces
    pos = positions(stack)

    # Branch table: one compiled geometry branch per distinct (code, aux)
    fams = []
    fam_idx = np.zeros(S, dtype=np.int32)
    for s_i in range(1, S):
        fam_key = (
            cfg.geom_codes[s_i],
            cfg.geom_aux[s_i] if cfg.geom_aux is not None else None,
        )
        if fam_key not in fams:
            fams.append(fam_key)
        fam_idx[s_i] = fams.index(fam_key)

    def _make_branch(code, aux):
        def branch(args):
            radius, conic, coeffs, p1, p2, x, y, z, L, M, N = args
            t = geom.distance_static(
                code, radius, conic, coeffs, x, y, z, L, M, N,
                p1=p1, p2=p2, aux=aux,
            )
            nx, ny, nz = geom.surface_normal_static(
                code, radius, conic, coeffs, x + t * L, y + t * M,
                p1=p1, p2=p2, aux=aux,
            )
            return t, nx, ny, nz

        return branch

    geo_branches = [_make_branch(c, a) for c, a in fams]

    # Per-surface per-ray media (tiny unrolled graphs; the heavy geometry
    # stays inside the scan body)
    n_all_s = jnp.stack([
        n_of(cfg.mat_formulas[s], stack.mat_coeffs[s], stack.ntab[s], rays.w)
        for s in range(S)
    ])
    if cfg.has_absorption:
        k_all_s = jnp.stack([
            k_of(stack.ktab[s], rays.w) for s in range(S)
        ])
    refl = jnp.asarray([float(r) for r in cfg.reflective])

    sl = slice(1, S)
    # Radial aperture objects (incl. offset/annular) fold into uniform
    # per-surface columns; plain semi-diameters (traced stack.ap_max) fill
    # the rest. Aperture OBJECTS are static config, so their columns are
    # concrete; only the fallback column is traced.
    has_ap = np.zeros(S, dtype=bool)
    obj_rmax = np.full(S, np.inf)
    ap_rmin = np.zeros(S)
    ap_ox = np.zeros(S)
    ap_oy = np.zeros(S)
    if cfg.apertures is not None:
        for s_i, a in enumerate(cfg.apertures):
            if a is not None:
                has_ap[s_i] = True
                obj_rmax[s_i] = float(a.r_max)
                ap_rmin[s_i] = float(a.r_min)
                ap_ox[s_i] = float(getattr(a, "offset_x", 0.0))
                ap_oy[s_i] = float(getattr(a, "offset_y", 0.0))
    ap_rmax = jnp.where(
        jnp.asarray(has_ap), jnp.asarray(obj_rmax), stack.ap_max
    )

    xs = {
        "radius": stack.radius[sl], "conic": stack.conic[sl],
        "coeffs": stack.coeffs[sl],
        "p1": stack.geo_p1[sl], "p2": stack.geo_p2[sl],
        "fam": jnp.asarray(fam_idx)[sl],
        "dx": stack.dx[sl], "dy": stack.dy[sl], "dz": stack.dz[sl],
        "rx": stack.rx[sl], "ry": stack.ry[sl], "rz": stack.rz[sl],
        "ap_rmax": ap_rmax[sl],
        "ap_rmin": jnp.asarray(ap_rmin)[sl],
        "ap_ox": jnp.asarray(ap_ox)[sl],
        "ap_oy": jnp.asarray(ap_oy)[sl],
        "pos": pos[sl],
        "n_mat": n_all_s[sl], "refl": refl[sl],
    }
    if cfg.has_absorption:
        xs["k_pre"] = k_all_s[:-1]  # medium BEFORE surface s is material s-1

    has_tilts = cfg.has_tilts
    has_absorption = cfg.has_absorption
    w = rays.w

    def body(carry, q):
        x, y, z, L, M, N, inten, opd, n_pre = carry

        x = x - q["dx"]
        y = y - q["dy"]
        z = z - (q["pos"] + q["dz"])
        if has_tilts:
            x, y, L, M = kernels.rotate_z(x, y, L, M, -q["rz"])
            x, z, L, N = kernels.rotate_y(x, z, L, N, -q["ry"])
            y, z, M, N = kernels.rotate_x(y, z, M, N, -q["rx"])

        geo_args = (
            q["radius"], q["conic"], q["coeffs"], q["p1"], q["p2"],
            x, y, z, L, M, N,
        )
        if len(geo_branches) == 1:
            t, nx, ny, nz = geo_branches[0](geo_args)
        else:
            t, nx, ny, nz = lax.switch(q["fam"], geo_branches, geo_args)
        x = x + t * L
        y = y + t * M
        z = z + t * N

        if has_absorption:
            inten = inten * jnp.exp(-4 * jnp.pi * q["k_pre"] / w * t * 1e3)

        opd = opd + jnp.abs(t * n_pre)
        r2_ap = (x - q["ap_ox"]) ** 2 + (y - q["ap_oy"]) ** 2
        inten = jnp.where(
            (r2_ap > q["ap_rmax"] ** 2) | (r2_ap < q["ap_rmin"] ** 2),
            0.0, inten,
        )

        n_post = jnp.where(q["refl"] > 0.5, n_pre, q["n_mat"])
        Lt, Mt, Nt = kernels.refract(L, M, N, nx, ny, nz, n_pre, n_post)
        Lr, Mr, Nr = kernels.reflect(L, M, N, nx, ny, nz)
        is_refl = q["refl"] > 0.5
        L = jnp.where(is_refl, Lr, Lt)
        M = jnp.where(is_refl, Mr, Mt)
        N = jnp.where(is_refl, Nr, Nt)

        if has_tilts:
            y, z, M, N = kernels.rotate_x(y, z, M, N, q["rx"])
            x, z, L, N = kernels.rotate_y(x, z, L, N, q["ry"])
            x, y, L, M = kernels.rotate_z(x, y, L, M, q["rz"])
        x = x + q["dx"]
        y = y + q["dy"]
        z = z + q["pos"] + q["dz"]

        carry = (x, y, z, L, M, N, inten, opd, n_post)
        out = (x, y, z, L, M, N, inten, opd) if record else None
        return carry, out

    # Promote the carry to the rays/params common dtype up front: with f32
    # rays under x64 (f64 stack params) the body promotes f32 -> f64, which
    # lax.scan rejects as a carry-type mismatch. The unrolled engine
    # produces f64 outputs for that mix, so this matches its semantics.
    cdt = jnp.result_type(rays.x.dtype, stack.radius.dtype)
    carry0 = tuple(
        jnp.asarray(a, cdt)
        for a in (rays.x, rays.y, rays.z, rays.L, rays.M, rays.N, rays.i,
                  rays.opd, n_all_s[0])
    )
    carry, ys = lax.scan(body, carry0, xs)
    x, y, z, L, M, N, inten, opd, _ = carry
    out = RealRays(x=x, y=y, z=z, L=L, M=M, N=N, i=inten, w=w, opd=opd)

    history = None
    if record:
        launch = (
            rays.x, rays.y, rays.z, rays.L, rays.M, rays.N, rays.i, rays.opd
        )
        names = ("x", "y", "z", "L", "M", "N", "intensity", "opd")
        history = {
            name: jnp.concatenate([launch[k][None], ys[k]], axis=0)
            for k, name in enumerate(names)
        }
    return out, history
