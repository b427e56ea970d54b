"""Functional paraxial engine.

Pure-function equivalents of the reference's Paraxial class and
ParaxialRayTracer (reference: optiland/paraxial.py:32-456,
raytrace/paraxial_ray_tracer.py:22-156): first-order properties (focal
lengths, cardinal points, pupils, F-number, invariant) and the generic
y/u paraxial trace with reverse/skip.

The surface count is small and static, so traces unroll as Python loops
over jnp scalars — fully differentiable and cheap under jit. These
functions run *inside* the jitted real-ray trace (ray aiming needs
EPL/EPD), making pupil locations differentiable parts of the compute graph
rather than cached Python attributes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from optiland_tpu.core.system import System, n_all, positions


def _paraxial_arrays(system: System, wavelength=None):
    """Radii, indices, positions, reflect flags for the paraxial trace."""
    stack, cfg = system.stack, system.cfg
    w = system.primary_wavelength if wavelength is None else wavelength
    R = stack.radius
    # toroidal surfaces: stack.radius holds R_rot (x); the meridional power
    # the reference's paraxial sees is R_yz, stored in geo_p1
    # (reference: geometries/toroidal.py:67 passes radius_y as the base radius)
    from optiland_tpu.core import geometry as geom

    if any(c == geom.TOROIDAL for c in cfg.geom_codes):
        tor = jnp.asarray(
            [c == geom.TOROIDAL for c in cfg.geom_codes], dtype=bool
        )
        R = jnp.where(tor, stack.geo_p1, R)
    n = n_all(stack, cfg, w)
    pos = positions(stack)
    refl = list(cfg.reflective)
    return R, n, pos, refl


def trace_generic(
    system: System,
    y,
    u,
    z,
    wavelength=None,
    reverse: bool = False,
    skip: int = 0,
):
    """Trace a generic paraxial ray; returns per-surface (heights, slopes).

    Semantics mirror reference trace_generic
    (raytrace/paraxial_ray_tracer.py:58-140): the object surface
    contributes its row without propagation; reverse flips the system
    (R -> -flip(R), n -> flip(roll(n,1)), pos -> pos[-1] - flip(pos)).
    """
    R, n, pos, refl = _paraxial_arrays(system, wavelength)
    cfg = system.cfg
    S = cfg.num_surfaces
    is_object = [i == 0 for i in range(S)]
    inter = list(cfg.interactions) if cfg.interactions is not None else [None] * S
    f_thin = system.stack.geo_p1

    if reverse:
        R = -jnp.flip(R)
        n = jnp.flip(jnp.roll(n, shift=1))
        pos = pos[-1] - jnp.flip(pos)
        refl = refl[::-1]
        is_object = is_object[::-1]
        inter = inter[::-1]
        f_thin = jnp.flip(f_thin)

    power = jnp.diff(n, prepend=n[:1]) / R

    y_ = jnp.asarray(y, dtype=R.dtype)
    u_ = jnp.asarray(u, dtype=R.dtype)
    z_ = jnp.asarray(z, dtype=R.dtype)
    y_, u_, z_ = jnp.broadcast_arrays(
        jnp.atleast_1d(y_), jnp.atleast_1d(u_), jnp.atleast_1d(z_)
    )

    heights, slopes = [], []
    for k in range(skip, S):
        if is_object[k]:
            heights.append(y_)
            slopes.append(u_)
            continue
        t = pos[k] - z_
        z_ = jnp.broadcast_to(pos[k], z_.shape)
        y_ = y_ + t * u_
        # NOTE: gratings are intentionally NOT applied here — the reference's
        # trace_generic (raytrace/paraxial_ray_tracer.py:105-135), which backs
        # every paraxial property, ignores the diffraction term; only its
        # ParaxialRays interaction path applies it.
        is_thin = inter[k] is not None and inter[k][0] == "thin_lens"
        if refl[k]:
            if is_thin:
                f = -f_thin[k] if reverse else f_thin[k]
                u_ = -u_ - y_ / f
            else:
                u_ = -u_ - 2 * y_ / R[k]
        else:
            if is_thin:
                u_ = (n[k - 1] * u_ - y_ / f_thin[k]) / n[k]
            else:
                u_ = (n[k - 1] * u_ - y_ * power[k]) / n[k]
        heights.append(y_)
        slopes.append(u_)

    return jnp.stack(heights), jnp.stack(slopes)


def _scan_trace(R, n, pos, refl_mask, obj_mask, y0, u0, z0, start,
                thin_mask=None, f_thin=None, reverse: bool = False):
    """Batched paraxial trace as a single lax.scan.

    All of (y0, u0, z0, start) are (B,) columns traced simultaneously;
    column b only starts updating at surface index >= start[b]. Returns the
    final (y, u) plus the stacked per-surface histories (S, B). One fused
    kernel per surface instead of one kernel per scalar op — critical on
    TPU where the unrolled scalar chain costs ~0.2 ms per op.
    """
    S = R.shape[0]
    power = jnp.diff(n, prepend=n[:1]) / R
    n_prev = jnp.roll(n, 1)
    ks = jnp.arange(S)
    if thin_mask is None:
        thin_mask = jnp.zeros((S,), bool)
        f_thin = jnp.ones((S,))
    f_sign = -1.0 if reverse else 1.0

    def body(carry, xs):
        y, u, z = carry
        k, Rk, nk, nk1, posk, powk, reflk, objk, think, fk = xs
        active = (k >= start) & (~objk)
        t = posk - z
        y_new = y + t * u
        u_refl = jnp.where(
            think, -u - y_new / (f_sign * fk), -u - 2 * y_new / Rk
        )
        u_refr = jnp.where(
            think,
            (nk1 * u - y_new / fk) / nk,
            (nk1 * u - y_new * powk) / nk,
        )
        u_new = jnp.where(reflk, u_refl, u_refr)
        y = jnp.where(active, y_new, y)
        u = jnp.where(active, u_new, u)
        z = jnp.where(active, posk, z)
        return (y, u, z), (y, u)

    (y, u, _), (ys, us) = jax.lax.scan(
        body, (y0, u0, z0),
        (ks, R, n, n_prev, pos, power, refl_mask, obj_mask, thin_mask, f_thin),
    )
    return y, u, ys, us


def abcd_prefix(system: System, wavelength=None):
    """Prefix products of per-surface ray-transfer (ABCD) matrices.

    The paraxial trace is a linear map, so the state at every surface is a
    2x2 matrix product — computed here with ``jax.lax.associative_scan`` in
    log2(S) batched matmul levels. This replaces sequential scalar chains
    (hundreds of tiny kernels) with ~15 fused vector ops, which matters
    enormously when per-kernel overhead dominates (remote/tunneled TPUs).

    Returns P of shape (S, 2, 2): P[k] maps (y, u) at the surface-1 vertex
    plane (object space) to (y, u) just after surface k. P[0] = identity.
    """
    cfg = system.cfg
    S = cfg.num_surfaces
    R, n, pos, _ = _paraxial_arrays(system, wavelength)
    refl = jnp.asarray(cfg.reflective)
    inter = cfg.interactions if cfg.interactions is not None else (None,) * S
    thin = jnp.asarray([i is not None and i[0] == "thin_lens" for i in inter])
    f_thin = system.stack.geo_p1

    n_prev = jnp.roll(n, 1)
    power = (n - n_prev) / R

    # Refraction/reflection matrix per surface:
    #   refract: [[1, 0], [-power/n, n_prev/n]]
    #   reflect: [[1, 0], [-2/R, -1]]
    #   thin lens: [[1, 0], [-1/(f n), n_prev/n]] (reflective: [[1,0],[-1/f,-1]])
    c_refr = jnp.where(thin, -1.0 / (f_thin * n), -power / n)
    d_refr = n_prev / n
    c_refl = jnp.where(thin, -1.0 / f_thin, -2.0 / R)
    d_refl = -jnp.ones_like(R)
    C = jnp.where(refl, c_refl, c_refr)
    D = jnp.where(refl, d_refl, d_refr)

    # Translation from the previous surface (surface 1: zero)
    t = pos - jnp.roll(pos, 1)
    t = t.at[1].set(0.0)

    ones = jnp.ones_like(R)
    zeros = jnp.zeros_like(R)
    # step = refraction @ translation
    #      = [[1, t], [C, C t + D]]
    step = jnp.stack(
        [
            jnp.stack([ones, t], axis=-1),
            jnp.stack([C, C * t + D], axis=-1),
        ],
        axis=-2,
    )  # (S, 2, 2)
    eye = jnp.broadcast_to(jnp.eye(2, dtype=R.dtype), (S, 2, 2))
    # object surface (row 0) contributes nothing
    step = jnp.where(jnp.arange(S)[:, None, None] == 0, eye, step)

    def combine(a, b):
        return jnp.einsum("...ij,...jk->...ik", b, a)

    return jax.lax.associative_scan(combine, step, axis=0)


def pupil_scalars(system: System):
    """(EPL, EPD) from ABCD prefix products (fast path for raygen).

    Mathematically identical to EPL(system)/EPD(system); compiles to a
    handful of fused ops instead of hundreds of sequential scalar kernels.
    """
    cfg = system.cfg
    stack = system.stack
    stop_index = cfg.stop_index
    pos = positions(stack)
    P = abcd_prefix(system)

    # EPL: the entrance pupil is the object-space image of the stop —
    # rays through the stop center satisfy A y1 + B u1 = 0 with
    # y1 = -u1 z_EP, so z_EP = B/A (relative to surface 1).
    if stop_index == 1:
        epl = pos[1]
    else:
        epl = P[stop_index, 0, 1] / P[stop_index, 0, 0]

    ap = cfg.aperture_type
    v = system.aperture_value
    if ap == "EPD":
        epd = v
    elif ap == "imageFNO":
        # EFL = -1/C of the full system matrix
        f2v = -1.0 / P[-1, 1, 0]
        epd = f2v / v
    elif ap == "objectNA":
        from optiland_tpu.core.system import n_of

        n0 = n_of(
            cfg.mat_formulas[0], stack.mat_coeffs[0], stack.ntab[0],
            system.primary_wavelength,
        )
        u0 = jnp.arcsin(v / n0)
        epd = 2 * (epl - pos[0]) * jnp.tan(u0)
    elif ap == "float_by_stop_size":
        if cfg.obj_infinite:
            # marginal ray y=1, u=0: y_stop = A_stop
            epd = v / P[stop_index, 0, 0]
        else:
            obj_z = pos[0]
            # ray y=0, u=0.1 from the object: y1 = -0.1 obj_z at surface 1
            y_stop = P[stop_index, 0, 0] * (-0.1 * obj_z) + P[stop_index, 0, 1] * 0.1
            u0 = 0.1 * v / y_stop
            epd = u0 * (epl - obj_z)
    else:
        raise ValueError(f"Unknown aperture type: {ap}")

    return epl, epd


def f1(system: System):
    """Front focal length (reference: paraxial.py:61-72)."""
    y, u = trace_generic(system, 1.0, 0.0, -1.0, reverse=True, skip=1)
    return (y[0] / u[-1])[0]


def f2(system: System):
    """Back (effective) focal length (reference: paraxial.py:74-86)."""
    pos = positions(system.stack)
    y, u = trace_generic(system, 1.0, 0.0, pos[1] - 1)
    return (-y[0] / u[-1])[0]


def F1(system: System):
    """Front focal point location relative to surface 1."""
    y, u = trace_generic(system, 1.0, 0.0, -1.0, reverse=True, skip=1)
    return (y[-1] / u[-1])[0]


def F2(system: System):
    """Back focal point location relative to the image surface."""
    pos = positions(system.stack)
    y, u = trace_generic(system, 1.0, 0.0, pos[1] - 1)
    return (-y[-1] / u[-1])[0]


def P1(system: System):
    return F1(system) - f1(system)


def P2(system: System):
    return F2(system) - f2(system)


def P1anti(system: System):
    return F1(system) + f1(system)


def P2anti(system: System):
    return F2(system) + f2(system)


def N1(system: System):
    return F1(system) + f2(system)


def N2(system: System):
    return F2(system) + f1(system)


def N1anti(system: System):
    return F1(system) - f2(system)


def N2anti(system: System):
    return F2(system) - f1(system)


def EPL(system: System):
    """Entrance pupil location (reference: paraxial.py:206-229)."""
    stop_index = system.cfg.stop_index
    pos = positions(system.stack)
    if stop_index == 1:
        return pos[1]
    z0 = pos[-1] - pos[stop_index]
    skip = system.cfg.num_surfaces - stop_index
    y, u = trace_generic(system, 0.0, 0.1, z0, reverse=True, skip=skip)
    return (y[-1] / u[-1])[0]


def XPL(system: System):
    """Exit pupil location relative to the image surface."""
    stop_index = system.cfg.stop_index
    pos = positions(system.stack)
    y, u = trace_generic(
        system, 0.0, 0.1, pos[stop_index], skip=stop_index + 1
    )
    return (-y[-1] / u[-1])[0]


def EPD(system: System):
    """Entrance pupil diameter, dispatched on the system aperture type
    (reference: optiland/aperture/{epd,image_fno,object_na,float_by_stop}.py)."""
    ap = system.cfg.aperture_type
    v = system.aperture_value
    if ap == "EPD":
        return v
    if ap == "imageFNO":
        return f2(system) / v
    if ap == "objectNA":
        pos = positions(system.stack)
        stack, cfg = system.stack, system.cfg
        from optiland_tpu.core.system import n_of

        n0 = n_of(
            cfg.mat_formulas[0], stack.mat_coeffs[0], stack.ntab[0],
            system.primary_wavelength,
        )
        u0 = jnp.arcsin(v / n0)
        z = EPL(system) - pos[0]
        return 2 * z * jnp.tan(u0)
    if ap == "float_by_stop_size":
        stop_index = system.cfg.stop_index
        pos = positions(system.stack)
        if system.cfg.obj_infinite:
            y, _ = trace_generic(system, 1.0, 0.0, -1.0)
            return (v / y[stop_index])[0]
        obj_z = pos[0]
        epl = EPL(system)
        y, _ = trace_generic(system, 0.0, 0.1, obj_z)
        u0 = 0.1 * v / y[stop_index]
        return (u0 * (epl - obj_z))[0]
    raise ValueError(f"Unknown aperture type: {ap}")


def XPD(system: System):
    """Exit pupil diameter (reference: paraxial.py:258-275)."""
    ya, ua = marginal_ray(system)
    yxp = ya[-1] + ua[-1] * XPL(system)
    return (2 * yxp)[0]


def FNO(system: System):
    """Image-space F-number (reference: paraxial.py:277-289)."""
    if system.cfg.aperture_type == "imageFNO":
        return system.aperture_value
    return f2(system) / EPD(system)


def magnification(system: System):
    """Transverse magnification (reference: paraxial.py:291-301)."""
    _, ua = marginal_ray(system)
    n = n_all(system.stack, system.cfg, system.primary_wavelength)
    return (n[0] * ua[0] / (n[-1] * ua[-1]))[0]


def invariant(system: System):
    """Lagrange invariant (reference: paraxial.py:303-314)."""
    ya, ua = marginal_ray(system)
    yb, ub = chief_ray(system)
    n = n_all(system.stack, system.cfg, system.primary_wavelength)
    return (yb[1] * n[1] * ua[1] - ya[1] * n[1] * ub[1])[0]


def trace(system: System, Hy, Py, wavelength=None):
    """Paraxial field/pupil trace: per-surface (heights, slopes) for
    normalized field Hy and pupil Py coordinates (reference:
    paraxial.py:412-426 + raytrace/paraxial_ray_tracer.py:33-56 + the
    field definitions' get_paraxial_object_position)."""
    epl, epd = pupil_scalars(system)
    y1 = jnp.atleast_1d(jnp.asarray(Py, jnp.result_type(float))) * epd / 2
    pos = positions(system.stack)
    ft = system.cfg.field_type
    max_field = jnp.max(
        jnp.sqrt(system.field_x**2 + system.field_y**2)
    )
    field_y = max_field * jnp.asarray(Hy)
    if ft == "angle":
        # infinite-field rays all share slope tan(theta) — computing the
        # slope directly (rather than (y1-y0)/(epl-z0)) stays finite when
        # the entrance pupil coincides with surface 1 (front-stop systems)
        u0 = jnp.tan(jnp.radians(field_y)) * jnp.ones_like(y1)
        z0 = jnp.ones_like(y1) * pos[1]
        y0 = y1 - u0 * (epl - z0)
    elif ft == "object_height":
        y0 = jnp.ones_like(y1) * (-field_y)
        z0 = jnp.ones_like(y1) * pos[0]
        denom = jnp.where(epl == z0, 1.0, epl - z0)
        u0 = (y1 - y0) / denom
    elif ft in ("paraxial_image_height", "real_image_height"):
        from optiland_tpu.core.raygen import _unit_chief

        y_img_unit, y_obj_unit, u_obj_unit = _unit_chief(system)
        if system.cfg.obj_infinite:
            u_obj = u_obj_unit * (field_y / y_img_unit)
            z0 = jnp.ones_like(y1) * pos[1]
            u0 = u_obj * jnp.ones_like(y1)
            y0 = y1 - u0 * (epl - z0)
        else:
            y0 = jnp.ones_like(y1) * (y_obj_unit * (field_y / y_img_unit))
            z0 = jnp.ones_like(y1) * pos[0]
            denom = jnp.where(epl == z0, 1.0, epl - z0)
            u0 = (y1 - y0) / denom
    else:
        raise NotImplementedError(f"Field type {ft} not supported")
    return trace_generic(system, y0, u0, z0, wavelength=wavelength)


def marginal_ray(system: System):
    """Marginal ray heights/slopes at every surface
    (reference: paraxial.py:316-345)."""
    epd = EPD(system)
    pos = positions(system.stack)
    if system.cfg.obj_infinite:
        ya, ua = epd / 2, jnp.zeros_like(epd)
        obj_z = pos[1] - 10.0
    else:
        obj_z = pos[0]
        z = EPL(system) - obj_z
        ya, ua = jnp.zeros_like(epd), epd / (2 * z)
    return trace_generic(system, ya, ua, obj_z)


def chief_ray(system: System):
    """Chief ray heights/slopes at every surface
    (reference: paraxial.py:347-410). Currently supports angle and
    object-height field definitions."""
    cfg = system.cfg
    stop_index = cfg.stop_index
    pos = positions(system.stack)
    num_surf = cfg.num_surfaces
    y0, u0 = 0.0, 0.1

    # Unit ray forward from the stop to the image
    y_fwd, _ = trace_generic(system, y0, u0, pos[stop_index], skip=stop_index)
    y_img_unit = y_fwd[-1]

    # Same unit ray backward from the stop to the object
    z_rev = pos[-1] - pos[stop_index]
    skip_rev = num_surf - stop_index
    y_rev, u_rev = trace_generic(
        system, y0, u0, z_rev, reverse=True, skip=skip_rev
    )
    y_obj_unit, u_obj_unit = y_rev[-1], u_rev[-1]

    scaling = _scale_chief_ray(system, y_obj_unit, u_obj_unit, y_img_unit)

    y_obj_start = -(y_obj_unit * scaling)
    u_obj_start = u_obj_unit * scaling

    if cfg.obj_infinite:
        epl = EPL(system)
        z1 = pos[1]
        y1 = u_obj_start * (z1 - epl)
        return trace_generic(system, y1, u_obj_start, z1)
    return trace_generic(system, y_obj_start, u_obj_start, pos[0])


def _scale_chief_ray(system: System, y_obj_unit, u_obj_unit, y_img_unit):
    """Field-definition-specific chief-ray scaling
    (reference: fields/field_types/*.py scale_chief_ray_for_field)."""
    ft = system.cfg.field_type
    max_y_field = jnp.max(system.field_y)
    if ft == "angle":
        target_slope = jnp.tan(jnp.deg2rad(max_y_field))
        return target_slope / u_obj_unit
    if ft == "object_height":
        return max_y_field / y_obj_unit
    if ft in ("paraxial_image_height", "real_image_height"):
        # (reference: fields/field_types/paraxial_image_height.py:104-122)
        return max_y_field / y_img_unit
    raise NotImplementedError(f"Field type {ft} not yet supported")
