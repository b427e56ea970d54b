"""Wavefront analysis: OPD relative to a reference sphere/plane at the exit
pupil.

Functional, jit/grad-compatible strategies mirroring the reference
(reference: optiland/wavefront/strategy.py:155 ChiefRayStrategy,
:287 CentroidStrategy, :520 BestFitStrategy, reference_geometry.py:43,87,
wavefront.py:26-176). Invalid rays are handled by weight-masking instead of
boolean compression, keeping shapes static for XLA.

OPD is returned in waves; wavelengths are micrometers, lengths millimeters.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from flax import struct

from optiland_tpu.core import paraxial, raygen, trace as trace_core
from optiland_tpu.core.distributions import create_distribution
from optiland_tpu.core.system import System, n_all, positions


@struct.dataclass
class WavefrontData:
    """Computed wavefront samples at the exit pupil
    (reference: wavefront/wavefront_data.py:16)."""

    pupil_x: jnp.ndarray
    pupil_y: jnp.ndarray
    pupil_z: jnp.ndarray
    opd: jnp.ndarray  # waves
    intensity: jnp.ndarray
    radius: jnp.ndarray  # reference sphere radius (inf for plane)
    # For polarized systems: tuple of (R, 3) complex exit E-fields (one for
    # polarized light, two incoherent for unpolarized); else None.
    E_exits: tuple = None
    # Reference geometry center (cx, cy, cz) for centroid/best_fit
    # strategies; None for chief_ray (reference exposes strategy.center).
    center: tuple = None


def _sphere_path_length(x, y, z, L, M, N, center, R, n_medium):
    """Optical path from image-surface ray positions back to a reference
    sphere (reference: wavefront/reference_geometry.py:56-80)."""
    xc, yc, zc = center
    Lb, Mb, Nb = -L, -M, -N
    a = Lb**2 + Mb**2 + Nb**2
    b = 2 * (Lb * (x - xc) + Mb * (y - yc) + Nb * (z - zc))
    c = (
        x**2 + y**2 + z**2
        - 2 * (x * xc + y * yc + z * zc)
        + xc**2 + yc**2 + zc**2
        - R**2
    )
    d = jnp.maximum(b**2 - 4 * a * c, 0.0)
    sq = jnp.sqrt(d)
    t1 = (-b - sq) / (2 * a)
    t2 = (-b + sq) / (2 * a)
    t = jnp.where(t1 < 0, t2, t1)
    return n_medium * t


def _plane_path_length(x, y, z, L, M, N, point, normal, n_medium):
    """Optical path back to a reference plane
    (reference: wavefront/reference_geometry.py:87-125)."""
    px, py, pz = point
    nx, ny, nz = normal
    Lb, Mb, Nb = -L, -M, -N
    num = (x - px) * nx + (y - py) * ny + (z - pz) * nz
    den = Lb * nx + Mb * ny + Nb * nz
    den = jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)
    return n_medium * (-num / den)


def _tilt_correction(system: System, Hx, Hy, Px, Py):
    """Launch-plane tilt term for infinite-conjugate angle fields
    (reference: wavefront/strategy.py:88-140)."""
    if system.cfg.field_type != "angle" or not system.cfg.obj_infinite:
        return 0.0
    max_field = jnp.max(jnp.sqrt(system.field_x**2 + system.field_y**2))
    fx = jnp.deg2rad(Hx * max_field)
    fy = jnp.deg2rad(Hy * max_field)
    tx, ty = jnp.tan(fx), jnp.tan(fy)
    uz = 1.0 / jnp.sqrt(1.0 + tx**2 + ty**2)
    ux, uy = tx * uz, ty * uz
    epd = paraxial.EPD(system)
    return ux * Px * epd / 2 + uy * Py * epd / 2


def _trace_field(system: System, Hx, Hy, Px, Py, wavelength):
    Px = jnp.atleast_1d(jnp.asarray(Px, jnp.result_type(float)))
    Py = jnp.atleast_1d(jnp.asarray(Py, jnp.result_type(float)))
    rays = raygen.generate_rays(
        system,
        jnp.full_like(Px, Hx),
        jnp.full_like(Px, Hy),
        Px,
        Py,
        wavelength,
    )
    final, history = trace_core.trace(system, rays, record=False)
    p = history["p"] if (history is not None and "p" in history) else None
    return final, p, rays.i


def compute_wavefront_data(
    system: System,
    Hx,
    Hy,
    wavelength,
    Px,
    Py,
    strategy: str = "chief_ray",
    reference_type: str = "sphere",
    robust_trim_std: float = 3.0,
    pol_state=None,
) -> WavefrontData:
    """Compute exit-pupil wavefront samples for one field and wavelength.

    Jittable and differentiable. ``strategy`` in {"chief_ray", "centroid",
    "best_fit"}; ``reference_type`` in {"sphere", "plane"}.
    """
    n_image = n_all(system.stack, system.cfg, system.primary_wavelength)[-1]
    pos = positions(system.stack)

    def pol_kwargs(rays, p, i0):
        """E_exits for polarized systems (reference: strategy.py:203-211)."""
        if p is None:
            return {}
        from optiland_tpu.polarization import exit_fields

        return {
            "E_exits": tuple(
                exit_fields(p, pol_state, rays.L0, rays.M0, rays.N0, i0)
            )
        }

    def pol_intensity(rays, p, i0):
        """Image-surface intensity; polarization-resolved when p is carried
        (reference records surfaces.intensity[-1], strategy.py:188)."""
        if p is None:
            return rays.i
        from optiland_tpu.polarization import polarized_intensity

        return polarized_intensity(
            p, pol_state, rays.L0, rays.M0, rays.N0, i0
        )

    if strategy == "chief_ray":
        chief, _, _ = _trace_field(system, Hx, Hy, 0.0, 0.0, wavelength)
        xc, yc, zc = chief.x[0], chief.y[0], chief.z[0]
        pupil_z = paraxial.XPL(system) + pos[-1]
        if reference_type == "sphere":
            R = jnp.sqrt(xc**2 + yc**2 + (zc - pupil_z) ** 2)
            ref_pl = lambda r: _sphere_path_length(
                r.x, r.y, r.z, r.L, r.M, r.N, (xc, yc, zc), R, n_image
            )
        else:
            normal = (chief.L[0], chief.M[0], chief.N[0])
            R = jnp.asarray(jnp.inf)
            ref_pl = lambda r: _plane_path_length(
                r.x, r.y, r.z, r.L, r.M, r.N, (xc, yc, zc), normal, n_image
            )

        opd_img_ref = ref_pl(chief)
        opd_ref = chief.opd - opd_img_ref
        opd_ref = opd_ref + _tilt_correction(system, Hx, Hy, 0.0, 0.0)

        rays, p_mat, i0 = _trace_field(system, Hx, Hy, Px, Py, wavelength)
        opd_img = ref_pl(rays)
        opd = rays.opd - opd_img
        opd = opd + _tilt_correction(system, Hx, Hy, jnp.asarray(Px), jnp.asarray(Py))

        opd_wv = (opd_ref[0] - opd) / (wavelength * 1e-3)
        t = opd_img / n_image
        return WavefrontData(
            pupil_x=rays.x - t * rays.L,
            pupil_y=rays.y - t * rays.M,
            pupil_z=rays.z - t * rays.N,
            opd=opd_wv,
            intensity=pol_intensity(rays, p_mat, i0),
            radius=R,
            **pol_kwargs(rays, p_mat, i0),
        )

    if strategy in ("centroid", "best_fit"):
        rays, p_mat, i0 = _trace_field(system, Hx, Hy, Px, Py, wavelength)
        inten = pol_intensity(rays, p_mat, i0)
        rays = rays.replace(i=inten)
        opd0 = rays.opd + _tilt_correction(
            system, Hx, Hy, jnp.asarray(Px), jnp.asarray(Py)
        )

        finite = (
            jnp.isfinite(rays.x) & jnp.isfinite(rays.y) & jnp.isfinite(rays.z)
            & jnp.isfinite(rays.L) & jnp.isfinite(rays.M) & jnp.isfinite(rays.N)
            & jnp.isfinite(opd0) & (rays.i != 0)
        )
        w = jnp.where(finite, jnp.maximum(rays.i, 0.0), 0.0)
        zero = jnp.zeros_like(rays.x)

        def mclean(a):
            return jnp.where(finite, a, 0.0)

        x, y, z = mclean(rays.x), mclean(rays.y), mclean(rays.z)
        L, M, N = mclean(rays.L), mclean(rays.M), mclean(rays.N)
        s = mclean(opd0) / n_image
        wx, wy, wz = x - s * L, y - s * M, z - s * N  # wavefront points

        tw = jnp.sum(w)
        tw = jnp.where(tw == 0, 1.0, tw)
        cx = jnp.sum(x * w) / tw
        cy = jnp.sum(y * w) / tw
        cz = jnp.sum(z * w) / tw

        if robust_trim_std and robust_trim_std > 0 and strategy == "centroid":
            d_img = jnp.sqrt((x - cx) ** 2 + (y - cy) ** 2 + (z - cz) ** 2)
            mean_d = jnp.sum(d_img * w) / tw
            # unweighted mean/std over valid rays (reference uses plain stats)
            nv = jnp.maximum(jnp.sum(finite), 1)
            mean_d = jnp.sum(jnp.where(finite, d_img, 0.0)) / nv
            var_d = jnp.sum(jnp.where(finite, (d_img - mean_d) ** 2, 0.0)) / nv
            std_d = jnp.sqrt(var_d)
            keep = d_img <= mean_d + robust_trim_std * std_d
            w = jnp.where(std_d > 0, w * keep, w)
            tw = jnp.sum(w)
            tw = jnp.where(tw == 0, 1.0, tw)
            cx = jnp.sum(x * w) / tw
            cy = jnp.sum(y * w) / tw
            cz = jnp.sum(z * w) / tw

        center_out = (cx, cy, cz)
        if strategy == "centroid":
            if reference_type == "sphere":
                d_wf = jnp.sqrt((wx - cx) ** 2 + (wy - cy) ** 2 + (wz - cz) ** 2)
                R = jnp.sum(w * d_wf) / tw
                center = (cx, cy, cz)
                opd_img = _sphere_path_length(
                    rays.x, rays.y, rays.z, rays.L, rays.M, rays.N,
                    center, R, n_image,
                )
            else:
                ml = jnp.sum(L * w) / tw
                mm = jnp.sum(M * w) / tw
                mn = jnp.sum(N * w) / tw
                norm = jnp.sqrt(ml**2 + mm**2 + mn**2)
                norm = jnp.where(norm == 0, 1.0, norm)
                R = jnp.asarray(jnp.inf)
                opd_img = _plane_path_length(
                    rays.x, rays.y, rays.z, rays.L, rays.M, rays.N,
                    (cx, cy, cz), (ml / norm, mm / norm, mn / norm), n_image,
                )
        else:  # best_fit: algebraic least-squares sphere/plane through
            # wavefront points (reference: strategy.py:520+)
            if reference_type == "sphere":
                # Solve |p - c|^2 = R^2 -> 2 p.c + (R^2 - |c|^2) = |p|^2
                A = jnp.stack([2 * wx, 2 * wy, 2 * wz, jnp.ones_like(wx)], axis=1)
                b = wx**2 + wy**2 + wz**2
                Aw = A * w[:, None]
                AtA = Aw.T @ A + 1e-12 * jnp.eye(4)
                Atb = Aw.T @ b
                sol = jnp.linalg.solve(AtA, Atb)
                cx, cy, cz = sol[0], sol[1], sol[2]
                R = jnp.sqrt(sol[3] + cx**2 + cy**2 + cz**2)
                center_out = (cx, cy, cz)
                opd_img = _sphere_path_length(
                    rays.x, rays.y, rays.z, rays.L, rays.M, rays.N,
                    (cx, cy, cz), R, n_image,
                )
            else:
                # Best-fit plane via weighted centroid + normal from mean dirs
                ml = jnp.sum(L * w) / tw
                mm = jnp.sum(M * w) / tw
                mn = jnp.sum(N * w) / tw
                norm = jnp.sqrt(ml**2 + mm**2 + mn**2)
                norm = jnp.where(norm == 0, 1.0, norm)
                pcx = jnp.sum(wx * w) / tw
                pcy = jnp.sum(wy * w) / tw
                pcz = jnp.sum(wz * w) / tw
                center_out = (pcx, pcy, pcz)
                R = jnp.asarray(jnp.inf)
                opd_img = _plane_path_length(
                    rays.x, rays.y, rays.z, rays.L, rays.M, rays.N,
                    (pcx, pcy, pcz), (ml / norm, mm / norm, mn / norm), n_image,
                )

        opd = opd0 - opd_img
        mean_opd = jnp.sum(jnp.where(finite, opd, 0.0) * w) / tw
        # reference uses unweighted mean over valid rays
        nv = jnp.maximum(jnp.sum(finite), 1)
        mean_opd = jnp.sum(jnp.where(finite, opd, 0.0)) / nv
        opd_wv = (mean_opd - opd) / (wavelength * 1e-3)
        t = opd_img / n_image
        return WavefrontData(
            pupil_x=rays.x - t * rays.L,
            pupil_y=rays.y - t * rays.M,
            pupil_z=rays.z - t * rays.N,
            opd=opd_wv,
            intensity=rays.i,
            radius=R,
            center=center_out,
            **pol_kwargs(rays, p_mat, i0),
        )

    raise ValueError(f"Unknown wavefront strategy: {strategy}")


def fit_and_remove_tilt(data: WavefrontData, remove_piston: bool = False,
                        ridge: float = 1e-12):
    """Weighted least-squares removal of tilt (and optionally piston)
    (reference: wavefront/wavefront.py:104-150)."""
    x, y = data.pupil_x, data.pupil_y
    w = jnp.sqrt(jnp.maximum(data.intensity, 0.0))
    X = jnp.stack([jnp.ones_like(x), x, y], axis=1)
    Xw = X * w[:, None]
    yw = data.opd * w
    XtX = Xw.T @ Xw + ridge * jnp.eye(3)
    Xty = Xw.T @ yw
    coeffs = jnp.linalg.solve(XtX, Xty)
    if not remove_piston:
        coeffs = coeffs.at[0].set(0.0)
    return data.opd - X @ coeffs


class Wavefront:
    """Wavefront analysis controller (reference: wavefront/wavefront.py:26).

    Computes WavefrontData for each (field, wavelength) pair.
    """

    def __init__(
        self,
        optic,
        fields="all",
        wavelengths="all",
        num_rays: int = 12,
        distribution="hexapolar",
        strategy: str = "chief_ray",
        afocal: bool = False,
        remove_tilt: bool = False,
        **kwargs,
    ):
        self.optic = optic
        if fields == "all":
            fields = optic.fields.get_field_coords()
        if wavelengths == "all":
            wavelengths = optic.wavelengths.get_wavelengths()
        elif wavelengths == "primary":
            wavelengths = [optic.primary_wavelength]
        self.fields = fields
        self.wavelengths = wavelengths
        if isinstance(distribution, str):
            distribution = create_distribution(distribution)
            distribution.generate_points(num_rays)
        self.distribution = distribution
        self.strategy = strategy
        self.reference_type = "plane" if afocal else "sphere"
        self.remove_tilt = remove_tilt
        self.data = {}
        self._generate_data()

    def _generate_data(self):
        system = self.optic.system
        Px = np.asarray(self.distribution.x, float)
        Py = np.asarray(self.distribution.y, float)
        for field in self.fields:
            for wl in self.wavelengths:
                data = compute_wavefront_data(
                    system, field[0], field[1], wl, Px, Py,
                    strategy=self.strategy,
                    reference_type=self.reference_type,
                    pol_state=getattr(self.optic, "polarization_state", None),
                )
                if self.remove_tilt:
                    data = data.replace(opd=fit_and_remove_tilt(data))
                self.data[(tuple(field), wl)] = data

    def get_data(self, field, wl) -> WavefrontData:
        return self.data[(tuple(field), wl)]
