"""Ray generation: field definitions, vignetting, and paraxial ray aiming.

Pure-function equivalents of the reference's RayGenerator + field-type
classes + ParaxialRayAimer (reference: optiland/rays/ray_generator.py:22-99,
fields/field_types/angle.py, object_height.py,
rays/ray_aiming/paraxial.py:23-118). Everything here runs inside jit: pupil
locations come from the differentiable paraxial engine, so gradients flow
from spot positions back to lens parameters through the aiming itself.
"""

from __future__ import annotations

import jax.numpy as jnp

from optiland_tpu.core import paraxial
from optiland_tpu.core.rays import RealRays
from optiland_tpu.core.system import System, positions


def get_vig_factor(system: System, Hx, Hy):
    """Nearest-neighbor interpolation of per-field vignetting factors
    (reference: fields/field_group.py:93-123)."""
    fx, fy = system.field_x, system.field_y
    max_field = jnp.max(jnp.sqrt(fx**2 + fy**2))
    scale = jnp.where(max_field == 0, 1.0, max_field)
    nx = fx / scale
    ny = fy / scale
    d2 = (Hx[..., None] - nx) ** 2 + (Hy[..., None] - ny) ** 2
    idx = jnp.argmin(d2, axis=-1)
    return system.vig_x[idx], system.vig_y[idx]


def _starting_z_offset(system: System):
    """Launch-plane offset for infinite-conjugate systems
    (reference: fields/field_types/angle.py:103-117)."""
    pos = positions(system.stack)
    z = pos[1:-1]
    return paraxial.EPD(system) - jnp.min(z)


def get_ray_origins(system: System, Hx, Hy, Px, Py, vx, vy,
                    epl=None, epd=None):
    """Ray origin positions for the configured field definition."""
    ft = system.cfg.field_type
    fx, fy = system.field_x, system.field_y
    max_field = jnp.max(jnp.sqrt(fx**2 + fy**2))
    field_x = max_field * Hx
    field_y = max_field * Hy
    pos = positions(system.stack)

    if ft == "angle":
        if epl is None:
            epl, epd = paraxial.pupil_scalars(system)
        if system.cfg.obj_infinite:
            offset = epd - jnp.min(pos[1:-1])
            x = -jnp.tan(jnp.radians(field_x)) * (offset + epl)
            y = -jnp.tan(jnp.radians(field_y)) * (offset + epl)
            z = pos[1] - offset
            x0 = Px * epd / 2 * vx + x
            y0 = Py * epd / 2 * vy + y
            z0 = jnp.full_like(Px, z)
        else:
            z0 = jnp.broadcast_to(pos[0], Px.shape)
            x0 = jnp.broadcast_to(
                -jnp.tan(jnp.radians(field_x)) * (epl - pos[0]), Px.shape
            )
            y0 = jnp.broadcast_to(
                -jnp.tan(jnp.radians(field_y)) * (epl - pos[0]), Px.shape
            )
        return x0, y0, z0

    if ft == "object_height":
        if system.cfg.obj_infinite:
            raise ValueError(
                'Field type "object_height" is invalid for an object at infinity.'
            )
        from optiland_tpu.core import geometry as geom

        x0 = jnp.broadcast_to(field_x, Px.shape)
        y0 = jnp.broadcast_to(field_y, Px.shape)
        sag = geom.sag_static(
            system.cfg.geom_codes[0],
            system.stack.radius[0],
            system.stack.conic[0],
            system.stack.coeffs[0],
            x0,
            y0,
        )
        z0 = sag + pos[0]
        return x0, y0, z0

    if ft in ("paraxial_image_height", "real_image_height"):
        x0, y0, z0 = _image_height_origins(
            system, field_x, field_y, Px, Py, vx, vy, epl, epd,
            real=(ft == "real_image_height"),
        )
        return x0, y0, z0

    raise NotImplementedError(f"Field type {ft} not yet supported")


def _unit_chief(system: System):
    """(y_img_unit, y_obj_unit, u_obj_unit) from unit traces launched at the
    stop (reference: fields/field_types/paraxial_image_height.py:142-160)."""
    cfg = system.cfg
    pos = positions(system.stack)
    stop = cfg.stop_index
    S = cfg.num_surfaces
    y_im, _ = paraxial.trace_generic(
        system, 0.0, 1.0, pos[stop], skip=stop
    )
    y_ob, u_ob = paraxial.trace_generic(
        system, 0.0, 1.0, pos[-1] - pos[stop], reverse=True, skip=S - stop
    )
    return y_im[-1][0], y_ob[-1][0], u_ob[-1][0]


def _image_height_origins(system, field_x, field_y, Px, Py, vx, vy,
                          epl=None, epd=None, real=False):
    """Ray origins for image-height field definitions
    (reference: fields/field_types/paraxial_image_height.py:20-100,
    real_image_height.py:14-140). The real variant refines the chief-ray
    parameters with a fixed-count masked secant iteration on real traces."""
    cfg = system.cfg
    pos = positions(system.stack)
    if epl is None:
        epl, epd = paraxial.pupil_scalars(system)
    y_img_unit, y_obj_unit, u_obj_unit = _unit_chief(system)

    if cfg.obj_infinite:
        val_x = u_obj_unit * (field_x / y_img_unit)
        val_y = u_obj_unit * (field_y / y_img_unit)
        jac = y_img_unit / u_obj_unit
    else:
        val_x = y_obj_unit * (field_x / y_img_unit)
        val_y = y_obj_unit * (field_y / y_img_unit)
        jac = y_img_unit / y_obj_unit

    def origins(vx_, vy_, Px_, Py_, fvx, fvy):
        if cfg.obj_infinite:
            offset = epd - jnp.min(pos[1:-1])
            x = -vx_ * (offset + epl)
            y = -vy_ * (offset + epl)
            z = pos[1] - offset
            x0, y0 = jnp.broadcast_arrays(
                Px_ * epd / 2 * fvx + x, Py_ * epd / 2 * fvy + y
            )
            z0 = jnp.broadcast_to(z, x0.shape)
            return x0, y0, z0
        from optiland_tpu.core import geometry as geom

        x0 = vx_ + 0.0 * Px_
        y0 = vy_ + 0.0 * Py_
        sag = geom.sag_static(
            cfg.geom_codes[0], system.stack.radius[0],
            system.stack.conic[0], system.stack.coeffs[0], x0, y0,
            p1=system.stack.geo_p1[0], p2=system.stack.geo_p2[0],
            aux=cfg.geom_aux[0] if cfg.geom_aux is not None else None,
        )
        return x0, y0, sag + pos[0]

    if real:
        # Secant-refined real chief aiming (fixed 10 iterations, masked)
        # (reference: real_image_height.py:60-140)
        from optiland_tpu.core import trace as trace_core
        from optiland_tpu.core.rays import RealRays

        z_pupil = pos[1] + epl
        target_x, target_y = field_x, field_y
        prev_val_x = prev_val_y = prev_cur_x = prev_cur_y = None
        zeros = jnp.zeros_like(val_x)
        for _ in range(10):
            x0, y0, z0 = origins(val_x, val_y, zeros, zeros, 0.0, 0.0)
            mag = jnp.sqrt(x0**2 + y0**2 + (z_pupil - z0) ** 2)
            rays = RealRays.create(
                x0, y0, z0, -x0 / mag, -y0 / mag, (z_pupil - z0) / mag,
                jnp.ones_like(x0),
                jnp.full_like(x0, system.primary_wavelength),
            )
            fin, _ = trace_core.trace(system, rays, record=False)
            cur_x, cur_y = fin.x, fin.y
            err_x = cur_x - target_x
            err_y = cur_y - target_y
            if prev_val_x is None:
                new_val_x = val_x - err_x / jac
                new_val_y = val_y - err_y / jac
            else:
                d_vx = val_x - prev_val_x
                d_vy = val_y - prev_val_y
                jx = jnp.where(
                    jnp.abs(d_vx) > 1e-12, (cur_x - prev_cur_x) /
                    jnp.where(jnp.abs(d_vx) > 1e-12, d_vx, 1.0), jac,
                )
                jy = jnp.where(
                    jnp.abs(d_vy) > 1e-12, (cur_y - prev_cur_y) /
                    jnp.where(jnp.abs(d_vy) > 1e-12, d_vy, 1.0), jac,
                )
                new_val_x = val_x - err_x / jx
                new_val_y = val_y - err_y / jy
            prev_val_x, prev_val_y = val_x, val_y
            prev_cur_x, prev_cur_y = cur_x, cur_y
            val_x, val_y = new_val_x, new_val_y

    return origins(val_x, val_y, Px, Py, vx, vy)


def aim_rays_paraxial(system: System, Hx, Hy, Px, Py):
    """Paraxial ray aiming at the entrance pupil
    (reference: rays/ray_aiming/paraxial.py:33-106)."""
    Hx = jnp.atleast_1d(Hx)
    Hy = jnp.atleast_1d(Hy)
    Px = jnp.atleast_1d(Px)
    Py = jnp.atleast_1d(Py)

    vxf, vyf = get_vig_factor(system, Hx, Hy)
    vx = 1 - vxf
    vy = 1 - vyf

    epl, epd = paraxial.pupil_scalars(system)
    x0, y0, z0 = get_ray_origins(system, Hx, Hy, Px, Py, vx, vy,
                                 epl=epl, epd=epd)

    if system.cfg.obj_telecentric:
        sin = system.aperture_value
        z = jnp.sqrt(1 - sin**2) / sin + z0
        z1 = z
        x1 = Px * vx + x0
        y1 = Py * vy + y0
    else:
        x1 = Px * epd * vx / 2
        y1 = Py * epd * vy / 2
        z1 = jnp.full_like(Px, epl)

    mag = jnp.sqrt((x1 - x0) ** 2 + (y1 - y0) ** 2 + (z1 - z0) ** 2)
    is_zero = mag < 1e-9
    mag = jnp.where(is_zero, 1.0, mag)
    L = jnp.where(is_zero, 0.0, (x1 - x0) / mag)
    M = jnp.where(is_zero, 0.0, (y1 - y0) / mag)
    N = jnp.where(is_zero, 1.0, (z1 - z0) / mag)
    return x0, y0, z0, L, M, N


def generate_rays(
    system: System, Hx, Hy, Px, Py, wavelength, apodization=None
) -> RealRays:
    """Generate a launch bundle for tracing
    (reference: rays/ray_generator.py:47-99). ``apodization`` is a static
    BaseApodization applied to the launch intensities
    (reference: rays/ray_generator.py:81-85)."""
    x0, y0, z0, L, M, N = aim_rays_paraxial(system, Hx, Hy, Px, Py)
    Px = jnp.atleast_1d(Px)
    Py = jnp.atleast_1d(Py)
    if apodization is not None:
        intensity = apodization.get_intensity(Px, Py)
    else:
        intensity = jnp.ones_like(Px)
    wl = jnp.ones_like(x0) * wavelength
    return RealRays.create(x0, y0, z0, L, M, N, intensity, wl)
