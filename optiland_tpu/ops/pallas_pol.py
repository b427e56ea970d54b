"""Pallas TPU kernels: fused polarized ray trace (Jones calculus in-kernel).

The XLA polarized path (core/trace.py + polarization.update_p) round-trips
the per-ray 3x3 complex polarization matrix through HBM at every surface:
18 extra (R,) channels of traffic per surface plus the einsum temporaries.
These kernels keep the ray state AND the polarization matrix resident in
VMEM for the whole surface chain, expanding complex arithmetic to real
pairs (complex dtypes do not lower to TPU Pallas).

The per-surface p-update is algebraically restructured from the reference's
O_out @ J @ O_in matrix product (reference: optiland/rays/
polarized_rays.py:136-199) into three rank-1 outer products

    surf = Js * outer(s, s) + Jp * outer(p1, p0) + Jz * outer(k1, k0)

where (s, p0, p1) is the local s/p basis bridging the pre/post interaction
directions k0/k1 and (Js, Jp, Jz) the (possibly complex) Jones diagonal —
identical result, but expressed as elementwise VPU ops with no per-ray
matrix materialization.

Coating models covered in-kernel (static per-surface dispatch):
  - no coating: pure basis rotation (Js = Jp = Jz = 1)
  - SimpleCoating: intensity factor + basis rotation
    (reference: coatings.py:164)
  - FresnelCoating: bare-interface Fresnel amplitude coefficients with the
    complex sqrt expanded to real pairs, so TIR phase is exact
    (reference: coatings.py:362, jones.py:56)
  - PolarizerCoating / RetarderCoating: full s/p-frame 2x2 Jones with
    cross terms from the global-axis projection (reference:
    coatings.py:418,450, jones.py:120,331)
  - ThinFilmCoating: per-ray transfer-matrix amplitudes computed in-kernel
    for absorption-free dielectric stacks (the real-index TMM reduces to 4
    real accumulators per polarization; reference: coatings.py:488-560,
    thin_film/core.py:84-149). Absorbing or internally-evanescent stacks
    fall back to the XLA path.

Backward: in-kernel VJP (same design as ops/pallas_trace._pallas_bwd) —
jax.vjp of the identical chain traced into the kernel body, scalar
parameter/coating gradients accumulated across the sequential grid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from optiland_tpu.ops.pallas_trace import (
    LANE,
    NUM_P,
    OK_CODES,
    P_NPOST,
    _pad_ray_arrays,
    _spec_of,
    _step_tile,
    _tile_rows,
    build_param_table,
    mosaic_compile_ctx,
)

# 26 output channels: smaller tile than the plain trace kernel. 256 rows
# exceeded the 16 MB scoped-VMEM budget by ~0.8 MB on a real v5e (measured
# r4: "Scoped allocation with size 16.75M and limit 16.00M"); 128 fits.
TILE_ROWS_POL_FWD = 128
TILE_ROWS_POL_BWD = 32  # 64 rows OOMs scoped VMEM (r4 sweep); 16 -> 32 gave +9%
# shard_map adds scoped-VMEM overhead (measured on the generic adjoint,
# r4: 64 rows OOMed at 17.35M/16M under shard_map while fitting bare).
# The polarized adjoint at 32 rows sits well below the limit (the r4
# sweep OOMed only at 64: 16.09M/16M), so the sharded wrapper keeps the
# same 32-row tile — no separate Mosaic compile for the sharded path.
TILE_ROWS_POL_BWD_SHARDED = 32

N_COAT = 4  # minimum per-surface coating-scalar columns:
#   fresnel   (n1, n2, 0, 0)    simple (T, R, 0, 0)
#   polarizer (ax, ay, az, 0)   retarder (d, ax, ay, az)
# ThinFilm ("tmm", L) kinds widen the table to 2 + 2L columns:
#   (n0, ns, n_1, 2*pi*d_1/lambda, ..., n_L, 2*pi*d_L/lambda)


def _kind_name(kind):
    return kind[0] if isinstance(kind, tuple) else kind


def _ncoat_of(coat_kinds):
    """Static coat-table width for a kinds tuple."""
    w = N_COAT
    for k in coat_kinds:
        if isinstance(k, tuple) and k[0] == "tmm":
            w = max(w, 2 + 2 * k[1])
    return w


# ---------------------------------------------------------------------------
# In-kernel Jones / p-matrix algebra (real-pair complex arithmetic)
# ---------------------------------------------------------------------------


def _cross3(a, b):
    ax, ay, az = a
    bx, by, bz = b
    return (ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)


def _local_basis_tile(k0, k1):
    """Local s/p basis on a ray tile (matches polarization.local_basis
    including the degenerate-direction fallback; reference:
    polarized_rays.py:136-175)."""
    s = _cross3(k0, k1)
    mag = jnp.sqrt(s[0] ** 2 + s[1] ** 2 + s[2] ** 2)
    degenerate = mag < 1e-12

    # fallback basis: p_fb = k0 x xhat, or k0 x yhat when k0 ~ +-xhat
    p_fb1 = (jnp.zeros_like(k0[0]), k0[2], -k0[1])
    n1 = jnp.sqrt(p_fb1[1] ** 2 + p_fb1[2] ** 2)
    p_fb2 = (-k0[2], jnp.zeros_like(k0[0]), k0[0])
    use2 = n1 < 1e-12
    p_fb = tuple(jnp.where(use2, b, a) for a, b in zip(p_fb1, p_fb2))
    s_fb = _cross3(p_fb, k0)

    s = tuple(jnp.where(degenerate, b, a) for a, b in zip(s, s_fb))
    mag = jnp.sqrt(s[0] ** 2 + s[1] ** 2 + s[2] ** 2)
    s = tuple(c / mag for c in s)
    p0 = _cross3(k0, s)
    p1 = _cross3(k1, s)
    return s, p0, p1


def _cdiv(ar, ai, br, bi):
    """(ar + i ai) / (br + i bi) as real pairs."""
    den = br * br + bi * bi
    return (ar * br + ai * bi) / den, (ai * br - ar * bi) / den


def _fresnel_diag(n1, n2, adot, reflect):
    """Fresnel Jones diagonal (Js, Jp, Jz) as real pairs.

    ``n1``/``n2`` are SMEM scalars, ``adot`` = cos(aoi) per ray. The
    complex sqrt of n^2 - sin^2(aoi) is expanded to real pairs so TIR
    (arg < 0) carries the exact phase (reference: jones.py:56-118).
    """
    n = n2 / n1
    arg = n * n - 1.0 + adot * adot  # n^2 - sin^2(aoi)
    # double-where sqrt guard: sqrt(max(-arg, 0)) has an inf * 0 = NaN
    # cotangent whenever arg > 0 (the common, non-TIR case)
    pos = arg >= 0
    root_re = jnp.where(pos, jnp.sqrt(jnp.where(pos, arg, 1.0)), 0.0)
    root_im = jnp.where(pos, 0.0, jnp.sqrt(jnp.where(pos, 1.0, -arg)))
    cos_i = adot
    one = jnp.ones_like(adot)
    zero = jnp.zeros_like(adot)
    if reflect:
        js = _cdiv(cos_i - root_re, -root_im, cos_i + root_re, root_im)
        p_re, p_im = _cdiv(
            n * n * cos_i - root_re, -root_im,
            n * n * cos_i + root_re, root_im,
        )
        return js, (-p_re, -p_im), (-one, zero)
    js = _cdiv(2 * cos_i, zero, cos_i + root_re, root_im)
    jp = _cdiv(2 * n * cos_i, zero, n * n * cos_i + root_re, root_im)
    return js, jp, (one, zero)


def _tmm_diag(getcoat, s, n_layers, adot, reflect):
    """Dielectric-stack TMM Jones diagonal (Js, Jp, Jz) as real pairs,
    evaluated per ray from the coat-table row
    (n0, ns, n_l, 2*pi*d_l/lambda, ...). Restricted to absorption-free
    stacks with min(n_l, ns) >= n0 (no internal evanescence), where the
    characteristic matrix keeps the form [[real, i*imag], [i*imag, real]]
    — 4 real accumulators per polarization instead of full complex 2x2
    (reference: thin_film/core.py:84-149 tmm_coherent; the admittance
    scale factor cancels in r and t).
    """
    n0 = getcoat(s, 0)
    ns = getcoat(s, 1)
    u2 = (n0 * n0) * (1.0 - adot * adot)  # (n0 sin theta0)^2
    cos0 = adot
    coss = jnp.sqrt(jnp.maximum(ns * ns - u2, 1e-30)) / ns

    one = jnp.ones_like(adot)
    zero = jnp.zeros_like(adot)

    outs = []
    for pol in ("s", "p"):
        if pol == "s":
            eta0 = n0 * cos0
            etas = ns * coss
        else:
            eta0 = n0 / cos0
            etas = ns / coss
        Ar, Bi, Ci, Dr = one, zero, zero, one
        for l in range(n_layers):
            nl = getcoat(s, 2 + 2 * l)
            dl = getcoat(s, 3 + 2 * l)  # pre-scaled: 2*pi*d_l/lambda
            cosl = jnp.sqrt(jnp.maximum(nl * nl - u2, 1e-30)) / nl
            etal = nl * cosl if pol == "s" else nl / cosl
            delta = nl * dl * cosl
            c = jnp.cos(delta)
            sn = jnp.sin(delta)
            # M_l = [[c, i sn/eta], [i eta sn, c]]
            Ar, Bi, Ci, Dr = (
                Ar * c - Bi * etal * sn,
                Ar * sn / etal + Bi * c,
                Ci * c + Dr * etal * sn,
                -Ci * sn / etal + Dr * c,
            )
        den_r = eta0 * Ar + etas * Dr
        den_i = eta0 * etas * Bi + Ci
        if reflect:
            num_r = eta0 * Ar - etas * Dr
            num_i = eta0 * etas * Bi - Ci
            outs.append(_cdiv(num_r, num_i, den_r, den_i))
        else:
            # t = conj(2 eta0 / denom)
            mag = den_r * den_r + den_i * den_i
            outs.append((2 * eta0 * den_r / mag, 2 * eta0 * den_i / mag))
    js, jp = outs
    if reflect:
        return js, (-jp[0], -jp[1]), (-one, zero)
    return js, jp, (one, zero)


def _axis_jones_tile(kind, getcoat, s, basis):
    """(s, p, z)-frame Jones 3x3 (real-pair nested list, None = zero) for
    the axis-based coatings, computed per ray from the local basis.

    polarizer: J = u_out u_in^T with u = normalized projection of the
    global transmission axis onto (s, p) (reference: jones.py:120 /
    polarization.JonesLinearPolarizer).
    retarder: J = e^{-id/2} diag rotated by the fast-axis projection
    (reference: jones.py:331 / polarization.JonesLinearRetarder).
    Coat-table columns: polarizer (ax, ay, az, 0); retarder
    (d, ax, ay, az)."""
    s_b, p0_b, p1_b = basis

    def dot_axis(ax, ay, az, v):
        return ax * v[0] + ay * v[1] + az * v[2]

    zero = jnp.zeros_like(s_b[0])
    one = jnp.ones_like(s_b[0])
    if kind == "polarizer":
        ax, ay, az = getcoat(s, 0), getcoat(s, 1), getcoat(s, 2)
        ts_in = dot_axis(ax, ay, az, s_b)
        tp_in = dot_axis(ax, ay, az, p0_b)
        nin = jnp.sqrt(ts_in**2 + tp_in**2)
        nin = jnp.where(nin == 0, 1.0, nin)
        tp_out = dot_axis(ax, ay, az, p1_b)
        nout = jnp.sqrt(ts_in**2 + tp_out**2)
        nout = jnp.where(nout == 0, 1.0, nout)
        us_in, up_in = ts_in / nin, tp_in / nin
        us_out, up_out = ts_in / nout, tp_out / nout
        return [
            [(us_out * us_in, zero), (us_out * up_in, zero), None],
            [(up_out * us_in, zero), (up_out * up_in, zero), None],
            [None, None, (one, zero)],
        ]
    # retarder: in-plane fast-axis projection uses (s, p0) only
    # (polarization._in_plane_axis)
    d = getcoat(s, 0)
    ax, ay, az = getcoat(s, 1), getcoat(s, 2), getcoat(s, 3)
    ts = dot_axis(ax, ay, az, s_b)
    tp = dot_axis(ax, ay, az, p0_b)
    norm = jnp.sqrt(ts**2 + tp**2)
    norm = jnp.where(norm == 0, 1.0, norm)
    us, up = ts / norm, tp / norm
    cd2 = jnp.cos(d / 2)
    sd2 = jnp.sin(d / 2)
    # e^{-id/2} us^2 + e^{+id/2} up^2 etc., expanded to real pairs
    j00 = (cd2 * (us * us + up * up), sd2 * (up * up - us * us))
    j0x = (zero, -2 * sd2 * us * up)
    j11 = (cd2 * (us * us + up * up), sd2 * (us * us - up * up))
    return [
        [j00, j0x, None],
        [j0x, j11, None],
        [None, None, (one, zero)],
    ]


def _identity_p(x):
    one = jnp.ones_like(x)
    zero = jnp.zeros_like(x)
    p_re = [[one if i == j else zero for j in range(3)] for i in range(3)]
    p_im = [[zero for _ in range(3)] for _ in range(3)]
    return p_re, p_im


def _update_p_tile(p_re, p_im, k0, k1, diag, jmat=None, basis=None):
    """p <- surf @ p with surf = sum of rank-1 outer products.

    ``diag`` is None (identity Jones: pure basis rotation) or a 3-tuple of
    (re, im) pairs (Js, Jp, Jz). ``jmat`` (overrides ``diag``) is a full
    3x3 nested list of (re, im) pairs in the (s, p, z) frame with ``None``
    marking structural zeros — used by the polarizer/retarder coatings
    whose Jones matrices have s/p cross terms. ``basis`` optionally passes
    a precomputed ``_local_basis_tile`` result (the caller needed it to
    build ``jmat``)."""
    if basis is None:
        basis = _local_basis_tile(k0, k1)
    s, p0, p1 = basis
    b_out = (s, p1, k1)
    b_in = (s, p0, k0)
    if jmat is None:
        if diag is None:
            one = jnp.ones_like(k0[0])
            zero = jnp.zeros_like(k0[0])
            diag = (((one, zero),) * 3)
        jmat = [
            [diag[a] if a == b else None for b in range(3)]
            for a in range(3)
        ]
    # surf[i][l] = sum_{a,b} b_out[a][i] * J[a][b] * b_in[b][l]
    surf_re = [[None] * 3 for _ in range(3)]
    surf_im = [[None] * 3 for _ in range(3)]
    for i in range(3):
        for l in range(3):
            sr = si = 0.0
            for a in range(3):
                for b in range(3):
                    if jmat[a][b] is None:
                        continue
                    coef = b_out[a][i] * b_in[b][l]
                    jr, ji = jmat[a][b]
                    sr = sr + coef * jr
                    si = si + coef * ji
            surf_re[i][l] = sr
            surf_im[i][l] = si
    new_re = [[None] * 3 for _ in range(3)]
    new_im = [[None] * 3 for _ in range(3)]
    for i in range(3):
        for l in range(3):
            ar = ai = 0.0
            for kk in range(3):
                ar = ar + (surf_re[i][kk] * p_re[kk][l]
                           - surf_im[i][kk] * p_im[kk][l])
                ai = ai + (surf_re[i][kk] * p_im[kk][l]
                           + surf_im[i][kk] * p_re[kk][l])
            new_re[i][l] = ar
            new_im[i][l] = ai
    return new_re, new_im


def _exit_intensity_tile(p_re, p_im, k0, i0, pol_scalars):
    """Polarized exit intensity on a tile (real-pair form of
    polarization.polarized_intensity; reference: polarized_rays.py:96-134).

    ``k0`` are the LAUNCH directions, ``i0`` the launch intensity,
    ``pol_scalars`` either None (unpolarized: average of the two
    orthogonal basis states) or the 4-tuple (Ex, Ey, phase_x, phase_y).
    """
    kx, ky, kz = k0
    # launch-space s/p basis (get_3d_electric_field): p = k x xhat
    px_, py_, pz_ = _cross3(k0, (jnp.ones_like(kx), jnp.zeros_like(kx),
                                 jnp.zeros_like(kx)))
    norm = jnp.sqrt(px_ * px_ + py_ * py_ + pz_ * pz_)
    inv = jnp.where(norm == 0, 1.0, norm)
    px_, py_, pz_ = px_ / inv, py_ / inv, pz_ / inv
    sx, sy, sz = _cross3((px_, py_, pz_), k0)

    if pol_scalars is None:
        states = [(1.0, 0.0, 0.0, 0.0), (0.0, 1.0, 0.0, 0.0)]
    else:
        states = [pol_scalars]
    total = jnp.zeros_like(i0)
    for Ex, Ey, phx, phy in states:
        # E0 = Ex e^{i phx} s + Ey e^{i phy} p  (real pairs)
        import math

        cx, sx_ph = math.cos(phx), math.sin(phx)
        cy, sy_ph = math.cos(phy), math.sin(phy)
        e_re = [Ex * cx * sx + Ey * cy * px_,
                Ex * cx * sy + Ey * cy * py_,
                Ex * cx * sz + Ey * cy * pz_]
        e_im = [Ex * sx_ph * sx + Ey * sy_ph * px_,
                Ex * sx_ph * sy + Ey * sy_ph * py_,
                Ex * sx_ph * sz + Ey * sy_ph * pz_]
        for row in range(3):
            ar = ai = 0.0
            for col in range(3):
                ar = ar + (p_re[row][col] * e_re[col]
                           - p_im[row][col] * e_im[col])
                ai = ai + (p_re[row][col] * e_im[col]
                           + p_im[row][col] * e_re[col])
            total = total + ar * ar + ai * ai
    return total * i0 / len(states)


def _chain_pol(spec, coat_kinds, getp, getc, getcoat,
               x, y, z, L, M, N, i, opd):
    """Full polarized surface chain on a tile: ray state + p matrix.

    Returns the 8 ray arrays followed by the 18 p channels (9 real then 9
    imaginary, row-major)."""
    codes, refl, tilted, auxes, nc = spec[:5]
    newton_iters = spec[5]
    has_abs = spec[8]
    inner = spec[9]
    S = len(codes)
    n0 = getp(0, P_NPOST)
    state = (x, y, z, L, M, N, i, opd, n0, None)
    p_re, p_im = _identity_p(x)
    for s in range(1, S):
        state, extras = _step_tile(
            s, codes[s], refl[s], tilted[s], auxes[s], getp, getc, nc,
            state, newton_iters, has_absorption=has_abs[s], inner=inner[s],
            want_extras=True,
        )
        L0, M0, N0, L1, M1, N1, adot = extras
        kind = _kind_name(coat_kinds[s])
        diag = None
        jmat = None
        basis = None
        if kind == "tmm":
            diag = _tmm_diag(
                getcoat, s, coat_kinds[s][1], adot, refl[s]
            )
        elif kind == "simple":
            # intensity factor after the interaction
            # (reference: coatings.py:164-200; T column 0, R column 1)
            factor = getcoat(s, 1 if refl[s] else 0)
            st = list(state)
            st[6] = st[6] * factor
            state = tuple(st)
        elif kind == "fresnel":
            diag = _fresnel_diag(
                getcoat(s, 0), getcoat(s, 1), adot, refl[s]
            )
        elif kind in ("polarizer", "retarder"):
            basis = _local_basis_tile((L0, M0, N0), (L1, M1, N1))
            jmat = _axis_jones_tile(kind, getcoat, s, basis)
        p_re, p_im = _update_p_tile(
            p_re, p_im, (L0, M0, N0), (L1, M1, N1), diag,
            jmat=jmat, basis=basis,
        )
    flat_p = [p_re[i][j] for i in range(3) for j in range(3)] + [
        p_im[i][j] for i in range(3) for j in range(3)
    ]
    return tuple(state[:8]) + tuple(flat_p)


def _chain_pol_intensity(spec, coat_kinds, pol_scalars, getp, getc, getcoat,
                         x, y, z, L, M, N, i, opd):
    """Polarized chain that folds the exit-intensity computation in-tile:
    returns the 8 ray arrays with ``i`` replaced by the polarized
    intensity — no p-matrix channels ever touch HBM."""
    k0 = (L, M, N)
    i0 = i
    out = _chain_pol(spec, coat_kinds, getp, getc, getcoat,
                     x, y, z, L, M, N, i, opd)
    ray_out = list(out[:8])
    p_flat = out[8:]
    p_re = [[p_flat[r * 3 + c] for c in range(3)] for r in range(3)]
    p_im = [[p_flat[9 + r * 3 + c] for c in range(3)] for r in range(3)]
    ray_out[6] = _exit_intensity_tile(p_re, p_im, k0, i0, pol_scalars)
    return tuple(ray_out)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _make_fwd_kernel_pol(spec, coat_kinds, pol_scalars=None,
                         intensity=False):
    def kernel(*refs):
        params_ref, coeffs_ref, coat_ref = refs[0], refs[1], refs[2]
        in_refs = refs[3:11]
        out_refs = refs[11:]
        getp = lambda s, col: params_ref[s, col]
        getc = lambda s, ci: coeffs_ref[s, ci]
        getcoat = lambda s, ci: coat_ref[s, ci]
        ins = [r[:] for r in in_refs]
        if intensity:
            out = _chain_pol_intensity(
                spec, coat_kinds, pol_scalars, getp, getc, getcoat, *ins
            )
        else:
            out = _chain_pol(spec, coat_kinds, getp, getc, getcoat, *ins)
        for ref, val in zip(out_refs, out):
            ref[:] = val

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("spec", "coat_kinds", "pol_scalars", "intensity"),
)
def _pallas_fwd_pol(params, coeffs, coat, ray_arrays, spec, coat_kinds,
                    pol_scalars=None, intensity=False):
    tile = _tile_rows(ray_arrays[0].shape[0], TILE_ROWS_POL_FWD)
    arrs, R = _pad_ray_arrays(ray_arrays, tile)
    rows = arrs[0].shape[0]
    grid = (rows // tile,)
    dtype = arrs[0].dtype
    n_out = 8 if intensity else 26

    ray_spec = pl.BlockSpec(
        (tile, LANE), lambda g: (g, 0), memory_space=pltpu.VMEM
    )
    out_shape = [
        jax.ShapeDtypeStruct((rows, LANE), dtype) for _ in range(n_out)
    ]
    kernel = _make_fwd_kernel_pol(spec, coat_kinds, pol_scalars, intensity)
    interpret = jax.default_backend() == "cpu"
    with mosaic_compile_ctx(interpret):
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3
            + [ray_spec] * len(arrs),
            out_specs=[ray_spec] * n_out,
            out_shape=out_shape,
            interpret=interpret,
        )(params, coeffs, coat, *arrs)
    return tuple(o.reshape(-1)[:R] for o in outs)


def _dp_rows_pol(spec, ncoat=N_COAT):
    S = len(spec[0])
    nc = spec[4]
    total = S * (NUM_P + nc + ncoat)
    rows = -(-total // LANE)
    return max(8, -(-rows // 8) * 8)


def _make_bwd_kernel_pol(spec, coat_kinds, pol_scalars=None,
                         intensity=False):
    S = len(spec[0])
    nc = spec[4]
    ncoat = _ncoat_of(coat_kinds)
    n_param = S * NUM_P
    n_coeff = S * nc
    rows_dp = _dp_rows_pol(spec, ncoat)
    n_cot = 8 if intensity else 26

    def kernel(*refs):
        params_ref, coeffs_ref, coat_ref = refs[0], refs[1], refs[2]
        in_refs = refs[3:11]
        cot_refs = refs[11 : 11 + n_cot]
        out_refs = refs[11 + n_cot : 11 + n_cot + 8]
        dp_ref = refs[11 + n_cot + 8]

        pvals = tuple(
            params_ref[s, c] for s in range(S) for c in range(NUM_P)
        )
        cvals = tuple(
            coeffs_ref[s, ci] for s in range(S) for ci in range(nc)
        )
        covals = tuple(
            coat_ref[s, ci] for s in range(S) for ci in range(ncoat)
        )
        ins = [r[:] for r in in_refs]

        def fwd_vals(pv, cv, cov, x, y, z, L, M, N, i, opd):
            getp = lambda s, col: pv[s * NUM_P + col]
            getc = lambda s, ci: cv[s * nc + ci]
            getcoat = lambda s, ci: cov[s * ncoat + ci]
            chain = _chain_pol_intensity if intensity else _chain_pol
            args = (spec, coat_kinds)
            if intensity:
                args = args + (pol_scalars,)
            return chain(
                *args, getp, getc, getcoat, x, y, z, L, M, N, i, opd,
            )

        _, vjp = jax.vjp(fwd_vals, pvals, cvals, covals, *ins)
        cot = tuple(r[:] for r in cot_refs)
        dpv, dcv, dcov, *dray = vjp(cot)

        for ref, val in zip(out_refs, dray):
            ref[:] = val

        g = pl.program_id(0)
        rows = jax.lax.broadcasted_iota(jnp.int32, (rows_dp, LANE), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (rows_dp, LANE), 1)
        lin = rows * LANE + cols
        acc = jnp.zeros((rows_dp, LANE), dtype=dray[0].dtype)
        for idx, v in enumerate(dpv):
            acc = jnp.where(lin == idx, v, acc)
        for jdx, v in enumerate(dcv):
            acc = jnp.where(lin == n_param + jdx, v, acc)
        for kdx, v in enumerate(dcov):
            acc = jnp.where(lin == n_param + n_coeff + kdx, v, acc)

        @pl.when(g == 0)
        def _():
            dp_ref[:] = acc

        @pl.when(g > 0)
        def _():
            dp_ref[:] = dp_ref[:] + acc

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("spec", "coat_kinds", "pol_scalars", "intensity",
                     "bwd_tile"),
)
def _pallas_bwd_pol(params, coeffs, coat, inputs, cotangents, spec,
                    coat_kinds, pol_scalars=None, intensity=False,
                    bwd_tile=None):
    S = len(spec[0])
    nc = spec[4]
    ncoat = _ncoat_of(coat_kinds)
    rows_dp = _dp_rows_pol(spec, ncoat)
    tile = _tile_rows(inputs[0].shape[0], bwd_tile or TILE_ROWS_POL_BWD)
    arrs, R = _pad_ray_arrays(list(inputs) + list(cotangents), tile)
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
    kernel = _make_bwd_kernel_pol(spec, coat_kinds, pol_scalars, intensity)
    interpret = jax.default_backend() == "cpu"
    with mosaic_compile_ctx(interpret):
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] * 3
            + [ray_spec] * len(arrs),
            out_specs=[ray_spec] * 8 + [dp_spec],
            out_shape=out_shape,
            interpret=interpret,
        )(params, coeffs, coat, *arrs)
    ray_grads = tuple(o.reshape(-1)[:R] for o in outs[:8])
    flat = outs[8].reshape(-1)
    dparams = flat[: S * NUM_P].reshape(S, NUM_P)
    dcoeffs = flat[S * NUM_P : S * (NUM_P + nc)].reshape(S, nc)
    dcoat = flat[
        S * (NUM_P + nc) : S * (NUM_P + nc + ncoat)
    ].reshape(S, ncoat)
    return ray_grads, dparams, dcoeffs, dcoat


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------


@jax.jit
def _assemble_p(p_flat):
    """(18 x (R,)) real channels -> complex (R, 3, 3). Jitted: the axon
    (tunneled TPU) backend rejects this complex binary op in eager mode but
    compiles it fine."""
    return (
        jnp.stack(p_flat[:9], axis=-1)
        + 1j * jnp.stack(p_flat[9:], axis=-1)
    ).reshape(p_flat[0].shape[0], 3, 3)


def _coat_kinds(system, wavelength=None):
    from optiland_tpu.coatings import (
        FresnelCoating,
        PolarizerCoating,
        RetarderCoating,
        SimpleCoating,
        ThinFilmCoating,
    )

    kinds = []
    for c in system.cfg.coatings or (None,) * system.cfg.num_surfaces:
        if c is None:
            kinds.append("none")
        elif type(c) is SimpleCoating:
            kinds.append("simple")
        elif type(c) is FresnelCoating:
            kinds.append("fresnel")
        elif type(c) is PolarizerCoating:
            kinds.append("polarizer")
        elif type(c) is RetarderCoating:
            kinds.append("retarder")
        elif type(c) is ThinFilmCoating and _tmm_eligible(
            c.stack, system, wavelength
        ):
            kinds.append(("tmm", len(c.stack.layers)))
        else:
            kinds.append("unsupported")
    return tuple(kinds)


def _tmm_eligible(stack, system, wavelength=None) -> bool:
    """True when the stack's TMM reduces to the in-kernel real-index form
    at the given wavelength (default: the system's primary line): every
    medium absorption-free and min(n_layer, n_substrate) >= n_incident (no
    internal evanescent waves at any real incidence). Eligibility is
    checked at the ACTUAL trace wavelength by trace_fast_pol — a dispersive
    stack that turns absorbing away from the primary line must fall back
    to the XLA path, not silently drop its imaginary part in-kernel."""
    import numpy as _np

    try:
        wl = float(
            system.primary_wavelength if wavelength is None else wavelength
        )
    except (TypeError, jax.errors.TracerArrayConversionError):
        return False
    try:
        media = (
            [stack.incident_material, stack.substrate_material]
            + [l.material for l in stack.layers]
        )
        # ensure_compile_time_eval: material n/k of CONSTANT stacks must
        # evaluate concretely even while an outer jit is tracing —
        # otherwise the jnp dispersion math stages to tracers, the
        # conversion below raises, and the stack silently degrades to
        # "unsupported" exactly when called from a jitted merit (which is
        # how every optimizer/bench step calls it; latent in round 4,
        # exposed by round 5's kernel-eligibility raise)
        with jax.ensure_compile_time_eval():
            ns_c = [complex(_np.ravel(_np.asarray(
                m.n(wl), dtype=complex))[0]) for m in media]
            ks = [float(_np.ravel(_np.asarray(m.k(wl)))[0]) for m in media]
    except (TypeError, jax.errors.TracerArrayConversionError):
        return False
    if any(abs(k) > 1e-12 for k in ks):
        return False
    if any(abs(n.imag) > 1e-12 for n in ns_c):
        return False
    n0 = ns_c[0].real
    return all(n.real >= n0 * 1.0001 for n in ns_c[1:])


def pallas_pol_supported(system, wavelength=None) -> bool:
    """True when trace_fast_pol covers this system's structure. Pass the
    trace ``wavelength`` so TMM-coating eligibility is judged where the
    stack will actually be evaluated (absorption can be dispersive)."""
    from optiland_tpu.physical_apertures import RadialAperture

    cfg = system.cfg
    if cfg.interactions is not None and any(
        i is not None for i in cfg.interactions
    ):
        return False
    if cfg.apertures is not None and any(
        a is not None and type(a) is not RadialAperture
        for a in cfg.apertures
    ):
        return False
    if cfg.bsdfs is not None and any(b is not None for b in cfg.bsdfs):
        return False
    if "unsupported" in _coat_kinds(system, wavelength):
        return False
    return all(c in OK_CODES for c in cfg.geom_codes)


def build_coat_table(system, wavelength):
    """(S, ncoat) coating scalar table (column layouts: see N_COAT note).
    The width is static per system: max(4, 2 + 2*L) over ThinFilm
    stacks."""
    import numpy as _np

    cfg = system.cfg
    S = cfg.num_surfaces
    dt = system.stack.radius.dtype
    kinds = _coat_kinds(system, wavelength)
    ncoat = _ncoat_of(kinds)
    rows = []
    for s in range(S):
        c = (cfg.coatings or (None,) * S)[s]
        kind = kinds[s]
        if kind == "fresnel":
            rows.append(jnp.stack([
                jnp.ravel(jnp.asarray(c.material_pre.n(wavelength), dt))[0],
                jnp.ravel(jnp.asarray(c.material_post.n(wavelength), dt))[0],
                jnp.zeros((), dt), jnp.zeros((), dt),
            ]))
        elif kind == "simple":
            rows.append(jnp.asarray(
                [c.transmittance, c.reflectance, 0.0, 0.0], dt
            ))
        elif kind == "polarizer":
            ax = np.asarray(c._jones.axis, float)
            rows.append(jnp.asarray([ax[0], ax[1], ax[2], 0.0], dt))
        elif kind == "retarder":
            ax = np.asarray(c._jones.axis, float)
            rows.append(jnp.asarray(
                [float(c._jones.retardance), ax[0], ax[1], ax[2]], dt
            ))
        elif _kind_name(kind) == "tmm":
            st = c.stack
            wlf = float(wavelength)
            # the stack's materials are constants outside the traced
            # pytree: evaluate their dispersion concretely even when an
            # outer jit is tracing (same rationale as _tmm_eligible)
            with jax.ensure_compile_time_eval():
                vals = [
                    float(_np.real(_np.ravel(_np.asarray(
                        st.incident_material.n(wlf), dtype=complex))[0])),
                    float(_np.real(_np.ravel(_np.asarray(
                        st.substrate_material.n(wlf), dtype=complex))[0])),
                ]
                for layer in st.layers:
                    vals.append(float(_np.real(_np.ravel(_np.asarray(
                        layer.material.n(wlf), dtype=complex))[0])))
                    # pre-fold 2*pi/lambda into the thickness column
                    vals.append(
                        2.0 * float(np.pi) * float(layer.thickness_um)
                        / wlf
                    )
            rows.append(jnp.asarray(vals, dt))
        else:
            rows.append(jnp.zeros((0,), dt))
    # pad every row to the common static width
    rows = [
        jnp.concatenate([r, jnp.zeros((ncoat - r.shape[0],), dt)])
        if r.shape[0] < ncoat else r
        for r in rows
    ]
    return jnp.stack(rows)


def trace_fast_pol(system, rays, wavelength, newton_iters: int = 10):
    """Fused polarized Pallas trace, monochromatic.

    Equivalent to core.trace.trace on a polarized system (final ray state
    plus the accumulated per-ray polarization matrix) for
    pallas_pol_supported structures, with the Jones update running in-kernel
    as real-pair arithmetic. Returns ``(RealRays, p)`` with ``p`` a complex
    (R, 3, 3) array; the final polarized intensity is
    ``polarization.polarized_intensity(p, state, rays.L, rays.M, rays.N,
    out.i)`` as in the XLA path (optic/optic.py _trace_jit).

    jax.grad composes through the in-kernel-VJP backward kernel.
    """
    from optiland_tpu.core.rays import RealRays

    spec = _spec_of(system, newton_iters, poly=False)
    coat_kinds = _coat_kinds(system, wavelength)
    if "unsupported" in coat_kinds:
        raise ValueError(
            "trace_fast_pol: a coating is not kernel-eligible at this "
            "trace wavelength (e.g. a ThinFilm stack absorbing away from "
            "the primary line); use the XLA trace path."
        )
    params = build_param_table(system, wavelength)
    coat = build_coat_table(system, wavelength)

    dt = rays.x.dtype
    if jax.default_backend() != "cpu" and dt == jnp.float64:
        dt = jnp.float32
    S = system.cfg.num_surfaces
    coeffs = system.stack.coeffs.astype(dt)
    if coeffs.shape[1] == 0:
        coeffs = jnp.zeros((S, 1), dt)
    params = params.astype(dt)
    coat = coat.astype(dt)

    @jax.custom_vjp
    def _traced(params, coeffs, coat, *ray_in):
        return _pallas_fwd_pol(
            params, coeffs, coat, ray_in, spec=spec, coat_kinds=coat_kinds
        )

    def _fwd(params, coeffs, coat, *ray_in):
        out = _traced(params, coeffs, coat, *ray_in)
        return out, (params, coeffs, coat, ray_in)

    def _bwd(res, g):
        params, coeffs, coat, ray_in = res
        ray_grads, dparams, dcoeffs, dcoat = _pallas_bwd_pol(
            params, coeffs, coat, tuple(ray_in), tuple(g),
            spec=spec, coat_kinds=coat_kinds,
        )
        if dcoeffs.shape != coeffs.shape:
            dcoeffs = jnp.zeros_like(coeffs).at[
                :, : dcoeffs.shape[1]
            ].set(dcoeffs)
        return (dparams, dcoeffs, dcoat) + ray_grads

    _traced.defvjp(_fwd, _bwd)

    ray_in = (rays.x, rays.y, rays.z, rays.L, rays.M, rays.N, rays.i,
              rays.opd)
    ray_in = tuple(a.astype(dt) for a in ray_in)
    out = _traced(params, coeffs, coat, *ray_in)
    x, y, z, L, M, N, i, opd = out[:8]
    p = _assemble_p(tuple(out[8:]))
    final = RealRays(x=x, y=y, z=z, L=L, M=M, N=N, i=i, w=rays.w, opd=opd)
    return final, p


def _pol_scalars_of(state):
    """Static scalar tuple from a PolarizationState (None = unpolarized)."""
    if state is None or not getattr(state, "is_polarized", False):
        return None
    return (float(state.Ex), float(state.Ey),
            float(state.phase_x), float(state.phase_y))


def trace_fast_pol_intensity(system, rays, wavelength, state=None,
                             newton_iters: int = 10,
                             bwd_tile: int | None = None):
    """Fused polarized trace with the exit intensity computed in-kernel.

    Equivalent to ``trace_fast_pol`` followed by
    ``polarization.polarized_intensity(p, state, rays.L, rays.M, rays.N,
    rays.i)`` — the Optic-level polarized trace contract
    (optic/optic.py _trace_jit; reference: polarized_rays.py:96-134) — but
    the 18 polarization-matrix channels never leave VMEM: the kernel
    returns the 8 ray arrays with ``i`` already polarized. jax.grad runs
    the in-kernel-VJP backward kernel through the same fused chain.
    """
    from optiland_tpu.core.rays import RealRays

    spec = _spec_of(system, newton_iters, poly=False)
    coat_kinds = _coat_kinds(system, wavelength)
    if "unsupported" in coat_kinds:
        raise ValueError(
            "trace_fast_pol_intensity: a coating is not kernel-eligible "
            "at this trace wavelength; use the XLA trace path."
        )
    pol_scalars = _pol_scalars_of(state)
    params = build_param_table(system, wavelength)
    coat = build_coat_table(system, wavelength)

    dt = rays.x.dtype
    if jax.default_backend() != "cpu" and dt == jnp.float64:
        dt = jnp.float32
    S = system.cfg.num_surfaces
    coeffs = system.stack.coeffs.astype(dt)
    if coeffs.shape[1] == 0:
        coeffs = jnp.zeros((S, 1), dt)
    params = params.astype(dt)
    coat = coat.astype(dt)

    @jax.custom_vjp
    def _traced(params, coeffs, coat, *ray_in):
        return _pallas_fwd_pol(
            params, coeffs, coat, ray_in, spec=spec, coat_kinds=coat_kinds,
            pol_scalars=pol_scalars, intensity=True,
        )

    def _fwd(params, coeffs, coat, *ray_in):
        out = _traced(params, coeffs, coat, *ray_in)
        return out, (params, coeffs, coat, ray_in)

    def _bwd(res, g):
        params, coeffs, coat, ray_in = res
        ray_grads, dparams, dcoeffs, dcoat = _pallas_bwd_pol(
            params, coeffs, coat, tuple(ray_in), tuple(g),
            spec=spec, coat_kinds=coat_kinds,
            pol_scalars=pol_scalars, intensity=True, bwd_tile=bwd_tile,
        )
        if dcoeffs.shape != coeffs.shape:
            dcoeffs = jnp.zeros_like(coeffs).at[
                :, : dcoeffs.shape[1]
            ].set(dcoeffs)
        return (dparams, dcoeffs, dcoat) + ray_grads

    _traced.defvjp(_fwd, _bwd)

    ray_in = (rays.x, rays.y, rays.z, rays.L, rays.M, rays.N, rays.i,
              rays.opd)
    ray_in = tuple(a.astype(dt) for a in ray_in)
    x, y, z, L, M, N, i, opd = _traced(params, coeffs, coat, *ray_in)
    return RealRays(x=x, y=y, z=z, L=L, M=M, N=N, i=i, w=rays.w, opd=opd)


__all__ = [
    "trace_fast_pol",
    "trace_fast_pol_intensity",
    "pallas_pol_supported",
    "build_coat_table",
]
