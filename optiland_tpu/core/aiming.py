"""Real ray aiming: iterative (Broyden), robust (continuation), cached.

The reference solves the stop-targeting inverse problem with a host-side
Newton loop over a shrinking active set (reference:
optiland/rays/ray_aiming/iterative.py:23-367, robust.py:28-171,
cached.py:1-147, initialization.py:173-189). The TPU-native version runs a
FIXED number of Broyden iterations over the whole batch with masked
updates — no data-dependent control flow, so the partial trace to the stop
stays a single fused XLA program evaluated ``max_iter`` times.
"""

from __future__ import annotations

import functools
import hashlib

import jax
from jax import lax
import jax.numpy as jnp
import numpy as np

from optiland_tpu.core import geometry as geom
from optiland_tpu.core import paraxial, raygen
from optiland_tpu.core import trace as trace_core
from optiland_tpu.core.rays import RealRays
from optiland_tpu.core.system import System, n_of, positions
from optiland_tpu.ops import kernels


def trace_to_stop_local(system: System, x, y, z, L, M, N, wavelength):
    """Trace to the stop surface; return LOCAL (x, y) on the stop
    (reference: iterative.py:300-367 _trace_subset + _get_local_stop_coords).
    """
    stack, cfg = system.stack, system.cfg
    stop = cfg.stop_index
    pos = positions(stack)
    w = jnp.ones_like(x) * wavelength
    n0 = n_of(cfg.mat_formulas[0], stack.mat_coeffs[0], stack.ntab[0], w)
    inten = jnp.ones_like(x)
    opd = jnp.zeros_like(x)
    state = (x, y, z, L, M, N, inten, opd, w, n0, None, None)
    for s in range(1, stop):
        state = trace_core._surface_step(stack, cfg, s, pos[s], state)
    x, y, z, L, M, N = state[:6]

    # Localize to the stop frame and intersect (no interaction needed)
    x = x - stack.dx[stop]
    y = y - stack.dy[stop]
    z = z - (pos[stop] + stack.dz[stop])
    if cfg.has_tilts:
        x, y, L, M = kernels.rotate_z(x, y, L, M, -stack.rz[stop])
        x, z, L, N = kernels.rotate_y(x, z, L, N, -stack.ry[stop])
        y, z, M, N = kernels.rotate_x(y, z, M, N, -stack.rx[stop])
    aux = cfg.geom_aux[stop] if cfg.geom_aux is not None else None
    t = geom.distance_static(
        cfg.geom_codes[stop], stack.radius[stop], stack.conic[stop],
        stack.coeffs[stop], x, y, z, L, M, N,
        p1=stack.geo_p1[stop], p2=stack.geo_p2[stop], aux=aux,
    )
    return x + t * L, y + t * M


_trace_to_stop_jit = jax.jit(trace_to_stop_local, static_argnames=())


def stop_radius(system: System, mode: str = "iterative") -> float:
    """Physical stop semi-diameter for aiming targets
    (reference: initialization.py:173-189 get_stop_radius_strategy).

    float_by_stop apertures use the user-set semi-diameter; iterative/robust
    modes trace a real marginal ray to the stop (paraxial fallback); the
    paraxial mode uses the paraxial marginal height.
    """
    stop = system.cfg.stop_index
    if system.cfg.aperture_type == "float_by_stop_size":
        return float(system.stack.ap_max[stop])

    ym, _ = paraxial.marginal_ray(system)
    y_par = float(abs(np.ravel(np.asarray(ym))[stop]))
    if mode not in ("iterative", "robust"):
        return y_par

    # Real marginal ray from object center to the entrance-pupil edge
    # (reference: initialization.py:60-130 RealReferenceStrategy)
    try:
        wl = float(system.primary_wavelength)
        epl = float(paraxial.EPL(system))
        epd = float(paraxial.EPD(system))
        pos = positions(system.stack)
        if system.cfg.obj_infinite:
            z0 = float(pos[1]) - 100.0
            x = jnp.array([0.0])
            y = jnp.array([epd / 2.0])
            z = jnp.array([z0])
            L = jnp.array([0.0])
            M = jnp.array([0.0])
            N = jnp.array([1.0])
        else:
            obj_z = float(pos[0])
            dy = epd / 2.0
            dz = epl - obj_z
            mag = float(np.hypot(dy, dz))
            x = jnp.array([0.0])
            y = jnp.array([0.0])
            z = jnp.array([obj_z])
            L = jnp.array([0.0])
            M = jnp.array([dy / mag])
            N = jnp.array([dz / mag])
        lx, ly = _trace_to_stop_jit(system, x, y, z, L, M, N, wl)
        r = float(jnp.abs(ly)[0])
        if not np.isfinite(r) or r <= 0:
            return y_par
        return r
    except Exception:
        return y_par


def _paraxial_jacobian(system: System, wavelength: float) -> float:
    """dy_stop / d(launch parameter) from a unit paraxial trace
    (reference: iterative.py:254-276)."""
    stop = system.cfg.stop_index
    pos = positions(system.stack)
    if system.cfg.obj_infinite:
        y, _ = paraxial.trace_generic(
            system, 1.0, 0.0, float(pos[1]), wavelength, skip=1
        )
    else:
        y, _ = paraxial.trace_generic(
            system, 0.0, 1.0, float(pos[0]), wavelength
        )
    J = float(np.ravel(np.asarray(y))[stop])
    if abs(J) < 1e-12:
        J = 1e-12
    return J


@functools.partial(
    jax.jit, static_argnames=("max_iter", "obj_infinite")
)
def _broyden_aim(system, x, y, z, L, M, N, tx, ty, wavelength, J_factor,
                 tol, max_iter: int, obj_infinite: bool):
    """Fixed-count batched Broyden iteration with masked per-ray updates."""
    tol_sq = tol * tol
    lx, ly = trace_to_stop_local(system, x, y, z, L, M, N, wavelength)
    ex, ey = lx - tx, ly - ty
    J11 = jnp.full_like(x, J_factor)
    J12 = jnp.zeros_like(x)
    J21 = jnp.zeros_like(x)
    J22 = jnp.full_like(x, J_factor)

    def body(carry, _):
        x, y, L, M, ex, ey, J11, J12, J21, J22 = carry
        active = (ex**2 + ey**2) >= tol_sq
        det = J11 * J22 - J12 * J21
        det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
        dp1 = jnp.where(active, -(J22 * ex - J12 * ey) / det, 0.0)
        dp2 = jnp.where(active, -(-J21 * ex + J11 * ey) / det, 0.0)
        if obj_infinite:
            x = x + dp1
            y = y + dp2
        else:
            L = L + dp1
            M = M + dp2
        lx, ly = trace_to_stop_local(system, x, y, z, L, M, N, wavelength)
        ex_new, ey_new = lx - tx, ly - ty
        # Broyden rank-1 update on active rays
        dEx = ex_new - ex
        dEy = ey_new - ey
        Rx = dEx - (J11 * dp1 + J12 * dp2)
        Ry = dEy - (J21 * dp1 + J22 * dp2)
        norm_sq = jnp.maximum(dp1**2 + dp2**2, 1e-20)
        J11 = J11 + jnp.where(active, Rx * dp1 / norm_sq, 0.0)
        J12 = J12 + jnp.where(active, Rx * dp2 / norm_sq, 0.0)
        J21 = J21 + jnp.where(active, Ry * dp1 / norm_sq, 0.0)
        J22 = J22 + jnp.where(active, Ry * dp2 / norm_sq, 0.0)
        return (x, y, L, M, ex_new, ey_new, J11, J12, J21, J22), None

    # lax.scan traces the stop-trace body ONCE instead of max_iter times —
    # on CPU/f64 this cuts the aiming compile from minutes to seconds for
    # deep systems. On TPU the remote-compile relay handles unrolled
    # graphs far better than scans (see the project compile notes), so the
    # scan is fully unrolled there — identical math either way.
    unroll = max_iter if jax.default_backend() != "cpu" else 1
    carry0 = (x, y, L, M, ex, ey, J11, J12, J21, J22)
    (x, y, L, M, ex, ey, *_), _ = lax.scan(
        body, carry0, None, length=max_iter, unroll=unroll
    )

    err_sq = ex**2 + ey**2
    return x, y, z, L, M, N, err_sq


class ParaxialAimer:
    """Paraxial entrance-pupil aiming (the jit-traced default)
    (reference: rays/ray_aiming/paraxial.py:23)."""

    name = "paraxial"

    def __init__(self, optic, **kwargs):
        self.optic = optic

    def aim_rays(self, fields, wavelengths, pupil_coords, initial_guess=None):
        Hx, Hy = fields
        Px, Py = pupil_coords
        return raygen.aim_rays_paraxial(
            self.optic.system, jnp.asarray(Hx), jnp.asarray(Hy),
            jnp.asarray(Px), jnp.asarray(Py),
        )


class IterativeAimer:
    """Broyden-accelerated Newton aiming onto the stop surface
    (reference: rays/ray_aiming/iterative.py:23)."""

    name = "iterative"

    def __init__(self, optic, max_iter: int = 20, tol: float = 1e-8, **kwargs):
        self.optic = optic
        self.max_iter = max_iter
        self.tol = tol

    def aim_rays(self, fields, wavelengths, pupil_coords, initial_guess=None):
        system = self.optic.system
        Hx, Hy = fields
        Px = jnp.atleast_1d(jnp.asarray(pupil_coords[0], float))
        Py = jnp.atleast_1d(jnp.asarray(pupil_coords[1], float))
        wl = (
            float(np.mean(wavelengths))
            if hasattr(wavelengths, "__len__")
            else float(wavelengths)
        )
        if initial_guess is not None:
            x, y, z, L, M, N = (jnp.atleast_1d(jnp.asarray(v, float))
                                for v in initial_guess)
        else:
            x, y, z, L, M, N = raygen.aim_rays_paraxial(
                system, jnp.asarray(Hx), jnp.asarray(Hy), Px, Py
            )
        r_stop = stop_radius(system, "iterative")
        tx = Px * r_stop * jnp.ones_like(x)
        ty = Py * r_stop * jnp.ones_like(y)

        lx0, _ = _trace_to_stop_jit(system, x, y, z, L, M, N, wl)
        if bool(jnp.any(jnp.isnan(lx0))):
            raise ValueError(
                "Initial ray aiming guess produced NaNs. "
                "Consider using the 'robust' method instead."
            )

        J = _paraxial_jacobian(system, wl)
        x, y, z, L, M, N, err_sq = _broyden_aim(
            system, x, y, z, L, M, N, tx, ty, wl, J, self.tol,
            max_iter=self.max_iter, obj_infinite=system.cfg.obj_infinite,
        )
        if not bool(jnp.all(err_sq < self.tol**2)):
            raise ValueError("Iterative aimer failed to converge.")
        return x, y, z, L, M, N


class RobustAimer:
    """Continuation aiming: deform the paraxial solution from t=0 to t=1,
    recursively bisecting on failure (reference: rays/ray_aiming/robust.py:28).
    """

    name = "robust"

    def __init__(self, optic, max_iter: int = 20, tol: float = 1e-8,
                 scale_fields: bool = True, **kwargs):
        self.optic = optic
        self.scale_fields = scale_fields
        self._iterative = IterativeAimer(optic, max_iter=max_iter, tol=tol)

    def _paraxial(self, fields, pupil):
        return raygen.aim_rays_paraxial(
            self.optic.system,
            jnp.asarray(fields[0]), jnp.asarray(fields[1]),
            jnp.atleast_1d(jnp.asarray(pupil[0], float)),
            jnp.atleast_1d(jnp.asarray(pupil[1], float)),
        )

    def aim_rays(self, fields, wavelengths, pupil_coords, initial_guess=None):
        if initial_guess is not None:
            try:
                return self._iterative.aim_rays(
                    fields, wavelengths, pupil_coords,
                    initial_guess=initial_guess,
                )
            except ValueError:
                pass
        Hx = jnp.asarray(fields[0], float)
        Hy = jnp.asarray(fields[1], float)
        Px = jnp.atleast_1d(jnp.asarray(pupil_coords[0], float))
        Py = jnp.atleast_1d(jnp.asarray(pupil_coords[1], float))
        p0 = (Px * 0.0, Py * 0.0)
        f0 = (Hx * 0.0, Hy * 0.0) if self.scale_fields else (Hx, Hy)
        sol0 = self._paraxial(f0, p0)
        return self._solve(
            0.0, 1.0, sol0, sol0, (Hx, Hy), wavelengths, (Px, Py)
        )

    def _solve(self, t0, t1, sol0, par0, fields, wl, pup):
        if (t1 - t0) < 1e-3:
            return sol0
        pt = (pup[0] * t1, pup[1] * t1)
        ft = (
            (fields[0] * t1, fields[1] * t1)
            if self.scale_fields else fields
        )
        par1 = self._paraxial(ft, pt)
        x0, y0, z0, L0, M0, N0 = sol0
        px0, py0, pz0, pL0, pM0, pN0 = par0
        px1, py1, pz1, pL1, pM1, pN1 = par1
        xg = px1 + (x0 - px0)
        yg = py1 + (y0 - py0)
        zg = pz1 + (z0 - pz0)
        Lg = pL1 + (L0 - pL0)
        Mg = pM1 + (M0 - pM0)
        sq = Lg**2 + Mg**2
        f = jnp.sqrt(jnp.maximum(sq, 1.0))
        Lg, Mg = Lg / f, Mg / f
        sq = Lg**2 + Mg**2
        Ng = jnp.sqrt(jnp.maximum(1.0 - sq, 0.0))
        Ng = jnp.where(pN1 >= 0, Ng, -Ng)
        if self.optic.system.cfg.obj_infinite:
            Lg, Mg, Ng = pL1, pM1, pN1
        guess = (xg, yg, zg, Lg, Mg, Ng)
        try:
            return self._iterative.aim_rays(ft, wl, pt, initial_guess=guess)
        except ValueError:
            tm = (t0 + t1) / 2.0
            sol_m = self._solve(t0, tm, sol0, par0, fields, wl, pup)
            par_m = self._paraxial(
                ((fields[0] * tm, fields[1] * tm)
                 if self.scale_fields else fields),
                (pup[0] * tm, pup[1] * tm),
            )
            return self._solve(tm, t1, sol_m, par_m, fields, wl, pup)


class CachedAimer:
    """Caching wrapper: identical inputs + unchanged system return the cached
    aim; a changed system reuses the stale result as the starting guess
    (reference: rays/ray_aiming/cached.py:16-147)."""

    def __init__(self, optic, wrapped, max_cache_size: int = 128, **kwargs):
        self.optic = optic
        self.wrapped_aimer = wrapped
        self.max_cache_size = max_cache_size
        self._cache: dict = {}
        self.name = wrapped.name

    def aim_rays(self, fields, wavelengths, pupil_coords, initial_guess=None):
        if initial_guess is not None:
            return self.wrapped_aimer.aim_rays(
                fields, wavelengths, pupil_coords, initial_guess
            )
        key = self._input_hash(fields, wavelengths, pupil_coords)
        sys_hash = self._system_hash()
        entry = self._cache.get(key)
        guess = None
        if entry is not None:
            cached_sys, cached_result = entry
            if cached_sys == sys_hash:
                return cached_result
            guess = cached_result
        result = self.wrapped_aimer.aim_rays(
            fields, wavelengths, pupil_coords, initial_guess=guess
        )
        self._cache[key] = (sys_hash, result)
        if len(self._cache) > self.max_cache_size:
            del self._cache[next(iter(self._cache))]
        return result

    def clear_cache(self):
        self._cache.clear()

    def _input_hash(self, fields, wavelengths, pupil_coords):
        h = hashlib.md5()
        for part in (*fields, wavelengths, *pupil_coords):
            h.update(np.asarray(part, float).tobytes())
        return h.hexdigest()

    def _system_hash(self):
        h = hashlib.md5()
        stack = self.optic.system.stack
        for leaf in jax.tree_util.tree_leaves(stack):
            h.update(np.asarray(leaf).tobytes())
        return h.hexdigest()


_AIMERS = {
    "paraxial": ParaxialAimer,
    "iterative": IterativeAimer,
    "robust": RobustAimer,
}


def create_ray_aimer(method: str, optic, cache: bool = False, **kwargs):
    """Aimer factory (reference: rays/ray_aiming/registry.py)."""
    if method not in _AIMERS:
        raise ValueError(
            f"Unknown ray aiming method {method!r}; "
            f"choose from {sorted(_AIMERS)}"
        )
    aimer = _AIMERS[method](optic, **kwargs)
    if cache and method != "paraxial":
        aimer = CachedAimer(optic, aimer, **kwargs)
    return aimer
