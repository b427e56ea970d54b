"""Pallas TPU kernels: fused multi-surface ray trace, forward and backward.

The XLA trace path round-trips the ray state through HBM between fused
kernels; these Pallas kernels keep a tile of rays resident in VMEM while
looping over *all* surfaces (localize -> intersect -> propagate -> OPD ->
clip -> refract/reflect), so each ray costs one HBM read and one write for
the entire trace — the speed-of-light regime for this memory-bound
workload on TPU.

Forward: one kernel, grid over ray tiles.
Backward: a second kernel that re-traces the tile and runs the VJP of the
identical step chain *inside* the kernel (jax.vjp at trace time unrolls the
adjoint into the kernel body), with the per-surface scalar parameter
gradients accumulated across the sequential grid into a single VMEM block.
This removes the HBM residual traffic and the dozens of full-array
reductions XLA's transpose emits for scalar-parameter gradients.

Scope (falls back to the XLA path otherwise): untilted systems,
plane/conic/even-asphere surfaces, monochromatic bundles (per-surface
indices precomputed at the trace wavelength), radial intensity-mask
vignetting, Beer-Lambert absorption. Physics matches
optiland_tpu.core.trace exactly (f32).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from optiland_tpu.core import geometry as geom

TILE_ROWS_FWD = 64  # rows of 128 lanes per program: 8192 rays/tile
TILE_ROWS_BWD = 16  # smaller tile for the adjoint (more live values)
LANE = 128

# param table columns
P_RADIUS, P_CONIC, P_POS, P_NPOST, P_APMAX, P_KPRE = range(6)
NUM_P = 6


def _step_tile(s, code, reflective, getp, getc, nc, state, newton_iters,
               wavelength_um):
    """One surface step on a ray tile (pure jnp; runs inside the kernels).

    ``getp(s, col)`` / ``getc(s, ci)`` return scalar surface parameters —
    SMEM reads in the forward kernel, traced values in the adjoint.
    """
    x, y, z, L, M, N, inten, opd, n_pre = state
    radius = getp(s, P_RADIUS)
    conic = getp(s, P_CONIC)
    pos = getp(s, P_POS)
    n_post = getp(s, P_NPOST)
    ap_max = getp(s, P_APMAX)
    k_pre = getp(s, P_KPRE)

    zl = z - pos

    # ---- intersect (static dispatch) ----
    if code == geom.PLANE:
        N_safe = jnp.where(jnp.abs(N) > 1e-14, N, 1e-14)
        t = -zl / N_safe
    else:
        k = conic
        a = k * N * N + L * L + M * M + N * N
        b = 2 * k * N * zl + 2 * L * x + 2 * M * y - 2 * N * radius + 2 * N * zl
        c = k * zl * zl - 2 * radius * zl + x * x + y * y + zl * zl
        d = b * b - 4 * a * c
        sq = jnp.sqrt(jnp.maximum(d, 0.0))
        sq = jnp.where(d < 0, jnp.nan, sq)
        a_safe = jnp.where(a == 0, 1.0, a)
        t1 = (-b + sq) / (2 * a_safe)
        t2 = (-b - sq) / (2 * a_safe)
        z1 = zl + t1 * N
        z2 = zl + t2 * N
        t = jnp.where(jnp.abs(z1) <= jnp.abs(z2), t1, t2)
        t = jnp.where(a == 0, -c / b, t)
        if code == geom.EVEN_ASPHERE:
            def sag(xx, yy):
                r2 = xx * xx + yy * yy
                zc = r2 / (
                    radius * (1 + jnp.sqrt(1 - (1 + k) * r2 / (radius * radius)))
                )
                acc = jnp.zeros_like(xx)
                for ci in range(nc - 1, -1, -1):
                    acc = acc * r2 + getc(s, ci)
                return zc + acc * r2

            for _ in range(newton_iters):
                xs, ys, zs = x + t * L, y + t * M, zl + t * N
                f_val = zs - sag(xs, ys)
                eps = 1e-4
                f_plus = (zl + (t + eps) * N) - sag(
                    x + (t + eps) * L, y + (t + eps) * M
                )
                dfdt = (f_plus - f_val) / eps
                dfdt = jnp.where(jnp.abs(dfdt) > 1e-14, dfdt, 1e-14)
                t = t - f_val / dfdt

    # ---- propagate + absorption + OPD + clip ----
    x = x + t * L
    y = y + t * M
    zl = zl + t * N
    inten = inten * jnp.exp(-4 * np.pi * k_pre / wavelength_um * t * 1e3)
    opd = opd + jnp.abs(t * n_pre)
    inten = jnp.where(x * x + y * y > ap_max * ap_max, 0.0, inten)

    # ---- normal ----
    if code == geom.PLANE:
        nx = jnp.zeros_like(x)
        ny = jnp.zeros_like(x)
        nz = -jnp.ones_like(x)
    else:
        r2 = x * x + y * y
        denom = radius * jnp.sqrt(1 - (1 + conic) * r2 / (radius * radius))
        dfdx = x / denom
        dfdy = y / denom
        if code == geom.EVEN_ASPHERE:
            dacc = jnp.zeros_like(x)
            for ci in range(nc - 1, -1, -1):
                dacc = dacc * r2 + getc(s, ci) * (ci + 1)
            dfdx = dfdx + 2 * x * dacc
            dfdy = dfdy + 2 * y * dacc
        mag = jnp.sqrt(dfdx * dfdx + dfdy * dfdy + 1)
        nx = dfdx / mag
        ny = dfdy / mag
        nz = -1.0 / mag

    # ---- interact ----
    dot = L * nx + M * ny + N * nz
    sgn = jnp.sign(dot)
    nx, ny, nz = nx * sgn, ny * sgn, nz * sgn
    adot = jnp.abs(dot)
    if reflective:
        L = L - 2 * adot * nx
        M = M - 2 * adot * ny
        N = N - 2 * adot * nz
        n_next = n_pre
    else:
        u = n_pre / n_post
        root = jnp.sqrt(1 - u * u * (1 - adot * adot))
        L = u * L + nx * (root - u * adot)
        M = u * M + ny * (root - u * adot)
        N = u * N + nz * (root - u * adot)
        n_next = n_post * jnp.ones_like(n_pre)

    return (x, y, zl + pos, L, M, N, inten, opd, n_next)


def _chain(codes, reflective, newton_iters, wavelength_um, nc,
           getp, getc, x, y, z, L, M, N, i, opd):
    """Run the full surface chain on a tile; returns the 8 output arrays."""
    S = len(codes)
    n0 = getp(0, P_NPOST)
    state = (x, y, z, L, M, N, i, opd, n0 * jnp.ones_like(x))
    for s in range(1, S):
        state = _step_tile(
            s, codes[s], reflective[s], getp, getc, nc, state,
            newton_iters, wavelength_um,
        )
    return state[:8]


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _make_fwd_kernel(codes, reflective, newton_iters, wavelength_um, nc):
    def kernel(params_ref, coeffs_ref, x_ref, y_ref, z_ref, L_ref, M_ref,
               N_ref, i_ref, opd_ref,
               xo_ref, yo_ref, zo_ref, Lo_ref, Mo_ref, No_ref, io_ref,
               opdo_ref):
        getp = lambda s, col: params_ref[s, col]
        getc = lambda s, ci: coeffs_ref[s, ci]
        out = _chain(
            codes, reflective, newton_iters, wavelength_um, nc, getp, getc,
            x_ref[:], y_ref[:], z_ref[:], L_ref[:], M_ref[:], N_ref[:],
            i_ref[:], opd_ref[:],
        )
        for ref, val in zip(
            (xo_ref, yo_ref, zo_ref, Lo_ref, Mo_ref, No_ref, io_ref, opdo_ref),
            out,
        ):
            ref[:] = val

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("codes", "reflective", "newton_iters", "wavelength_um"),
)
def _pallas_fwd(params, coeffs, x, y, z, L, M, N, i, opd,
                codes, reflective, newton_iters, wavelength_um):
    R = x.shape[0]
    tile = TILE_ROWS_FWD * LANE
    pad = (-R) % tile
    dtype = x.dtype

    def prep(a, fill=0.0):
        return jnp.pad(a, (0, pad), constant_values=fill).reshape(-1, LANE)

    # Padded lanes must be benign rays (N=1) so they cannot produce NaNs.
    arrs = [
        prep(a, 1.0 if k == 5 else 0.0)
        for k, a in enumerate((x, y, z, L, M, N, i, opd))
    ]
    rows = arrs[0].shape[0]
    grid = (rows // TILE_ROWS_FWD,)

    ray_spec = pl.BlockSpec(
        (TILE_ROWS_FWD, LANE), lambda g: (g, 0), memory_space=pltpu.VMEM
    )
    out_shape = [jax.ShapeDtypeStruct((rows, LANE), dtype) for _ in range(8)]
    kernel = _make_fwd_kernel(
        codes, reflective, newton_iters, wavelength_um, coeffs.shape[1]
    )
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # params table
            pl.BlockSpec(memory_space=pltpu.SMEM),  # asphere coeffs
        ] + [ray_spec] * 8,
        out_specs=[ray_spec] * 8,
        out_shape=out_shape,
        interpret=jax.default_backend() == "cpu",
    )(params, coeffs, *arrs)
    return tuple(o.reshape(-1)[:R] for o in outs)


# ---------------------------------------------------------------------------
# Backward kernel: in-kernel VJP with accumulated parameter gradients
# ---------------------------------------------------------------------------


def _make_bwd_kernel(codes, reflective, newton_iters, wavelength_um, nc):
    S = len(codes)
    n_param = S * NUM_P
    n_coeff = S * nc

    def kernel(params_ref, coeffs_ref,
               x_ref, y_ref, z_ref, L_ref, M_ref, N_ref, i_ref, opd_ref,
               gx_ref, gy_ref, gz_ref, gL_ref, gM_ref, gN_ref, gi_ref,
               gopd_ref,
               dx_ref, dy_ref, dz_ref, dL_ref, dM_ref, dN_ref, di_ref,
               dopd_ref, dp_ref):
        pvals = tuple(
            params_ref[s, c] for s in range(S) for c in range(NUM_P)
        )
        cvals = tuple(
            coeffs_ref[s, ci] for s in range(S) for ci in range(nc)
        )

        def fwd_vals(pv, cv, x, y, z, L, M, N, i, opd):
            getp = lambda s, col: pv[s * NUM_P + col]
            getc = lambda s, ci: cv[s * nc + ci]
            return _chain(
                codes, reflective, newton_iters, wavelength_um, nc,
                getp, getc, x, y, z, L, M, N, i, opd,
            )

        _, vjp = jax.vjp(
            fwd_vals, pvals, cvals,
            x_ref[:], y_ref[:], z_ref[:], L_ref[:], M_ref[:], N_ref[:],
            i_ref[:], opd_ref[:],
        )
        cot = (
            gx_ref[:], gy_ref[:], gz_ref[:], gL_ref[:], gM_ref[:],
            gN_ref[:], gi_ref[:], gopd_ref[:],
        )
        dpv, dcv, dx, dy, dz, dL, dM, dN, di, dopd = vjp(cot)

        for ref, val in zip(
            (dx_ref, dy_ref, dz_ref, dL_ref, dM_ref, dN_ref, di_ref, dopd_ref),
            (dx, dy, dz, dL, dM, dN, di, dopd),
        ):
            ref[:] = val

        # Accumulate scalar parameter gradients into a single shared block
        # (grid iterations run sequentially on a TPU core). Scatter is not
        # lowerable on TPU, so place each scalar with a masked select.
        g = pl.program_id(0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (8, LANE), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (8, LANE), 1)
        lin = rows * LANE + cols
        acc = jnp.zeros((8, LANE), dtype=dx.dtype)
        for idx, v in enumerate(dpv):
            acc = jnp.where(lin == idx, v, acc)
        for jdx, v in enumerate(dcv):
            acc = jnp.where(lin == n_param + jdx, v, acc)

        @pl.when(g == 0)
        def _():
            dp_ref[:] = acc

        @pl.when(g > 0)
        def _():
            dp_ref[:] = dp_ref[:] + acc

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("codes", "reflective", "newton_iters", "wavelength_um"),
)
def _pallas_bwd(params, coeffs, inputs, cotangents,
                codes, reflective, newton_iters, wavelength_um):
    S = len(codes)
    nc = coeffs.shape[1]
    if S * NUM_P + S * nc > 8 * LANE:
        raise ValueError("Parameter gradient block overflow; reduce coeffs.")
    R = inputs[0].shape[0]
    tile = TILE_ROWS_BWD * LANE
    pad = (-R) % tile
    dtype = inputs[0].dtype

    def prep(a, fill=0.0):
        return jnp.pad(a, (0, pad), constant_values=fill).reshape(-1, LANE)

    # Benign padded rays (N=1) with zero cotangents: contribute nothing to
    # the accumulated parameter gradients.
    arrs = [
        prep(a, 1.0 if k == 5 else 0.0) for k, a in enumerate(inputs)
    ] + [prep(a) for a in cotangents]
    rows = arrs[0].shape[0]
    grid = (rows // TILE_ROWS_BWD,)

    ray_spec = pl.BlockSpec(
        (TILE_ROWS_BWD, LANE), lambda g: (g, 0), memory_space=pltpu.VMEM
    )
    dp_spec = pl.BlockSpec((8, LANE), lambda g: (0, 0), memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((rows, LANE), dtype) for _ in range(8)]
    out_shape.append(jax.ShapeDtypeStruct((8, LANE), dtype))
    kernel = _make_bwd_kernel(codes, reflective, newton_iters, wavelength_um, nc)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ] + [ray_spec] * 16,
        out_specs=[ray_spec] * 8 + [dp_spec],
        out_shape=out_shape,
        interpret=jax.default_backend() == "cpu",
    )(params, coeffs, *arrs)
    ray_grads = tuple(o.reshape(-1)[:R] for o in outs[:8])
    flat = outs[8].reshape(-1)
    dparams = flat[: S * NUM_P].reshape(S, NUM_P)
    dcoeffs = flat[S * NUM_P : S * NUM_P + S * nc].reshape(S, nc)
    return ray_grads, dparams, dcoeffs


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------


def pallas_supported(system) -> bool:
    """True when the fast kernels cover this system's structure."""
    cfg = system.cfg
    if cfg.has_tilts:
        return False
    if cfg.interactions is not None and any(
        i is not None for i in cfg.interactions
    ):
        return False
    if cfg.apertures is not None and any(a is not None for a in cfg.apertures):
        return False
    ok_codes = {geom.PLANE, geom.STANDARD, geom.EVEN_ASPHERE}
    return all(c in ok_codes for c in cfg.geom_codes)


def build_param_table(system, wavelength):
    """Precompute the (S, NUM_P) scalar table for a monochromatic trace."""
    from optiland_tpu.core.system import k_of, n_all, positions

    stack, cfg = system.stack, system.cfg
    S = cfg.num_surfaces
    n = n_all(stack, cfg, wavelength)
    pos = positions(stack)
    # k of the medium *before* each surface (material_post of s-1)
    k_rows = [jnp.zeros(())]
    for s2 in range(1, S):
        k_rows.append(
            jnp.ravel(k_of(stack.ktab[s2 - 1], jnp.asarray(wavelength)))[0]
        )
    k_pre = jnp.stack(k_rows)
    params = jnp.stack(
        [stack.radius, stack.conic, pos, n, stack.ap_max, k_pre], axis=1
    )
    # reflective surfaces keep the incident medium
    refl = jnp.asarray(cfg.reflective)
    n_eff = jnp.where(refl, jnp.roll(n, 1), n)
    params = params.at[:, P_NPOST].set(n_eff)
    return params


def trace_fast(system, rays, wavelength, newton_iters: int = 10):
    """Fused Pallas trace (final state only; f32 recommended).

    Equivalent to optiland_tpu.core.trace.trace(..., record=False) for
    supported systems; jax.grad runs the fused backward kernel.
    """
    cfg = system.cfg
    codes = tuple(cfg.geom_codes)
    refl = tuple(cfg.reflective)

    @jax.custom_vjp
    def _traced(params, coeffs, x, y, z, L, M, N, i, opd):
        return _pallas_fwd(
            params, coeffs, x, y, z, L, M, N, i, opd,
            codes=codes, reflective=refl,
            newton_iters=newton_iters, wavelength_um=float(wavelength),
        )

    def _fwd(params, coeffs, x, y, z, L, M, N, i, opd):
        out = _traced(params, coeffs, x, y, z, L, M, N, i, opd)
        return out, (params, coeffs, x, y, z, L, M, N, i, opd)

    def _bwd(res, g):
        params, coeffs, *inputs = res
        ray_grads, dparams, dcoeffs = _pallas_bwd(
            params, coeffs, tuple(inputs), tuple(g),
            codes=codes, reflective=refl,
            newton_iters=newton_iters, wavelength_um=float(wavelength),
        )
        return (dparams, dcoeffs) + ray_grads

    _traced.defvjp(_fwd, _bwd)

    # params/coeffs are plain differentiable functions of the stack; outer AD
    # composes their VJP with the kernel's custom VJP automatically.
    dt = rays.x.dtype
    params = build_param_table(system, wavelength).astype(dt)
    coeffs = system.stack.coeffs.astype(dt)
    out = _traced(
        params, coeffs, rays.x, rays.y, rays.z, rays.L, rays.M, rays.N,
        rays.i, rays.opd,
    )
    from optiland_tpu.core.rays import RealRays

    x, y, z, L, M, N, i, opd = out
    return RealRays(x=x, y=y, z=z, L=L, M=M, N=N, i=i, w=rays.w, opd=opd)
