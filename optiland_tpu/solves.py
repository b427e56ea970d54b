"""Solves: constraints resolved by adjusting system parameters.

(reference: optiland/solves/base.py:13, thickness.py, curvature.py,
quick_focus.py:14-45, solve_manager.py:14, factory.py:21)
"""

from __future__ import annotations

import numpy as np


class BaseSolve:
    _registry: dict[str, type] = {}

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        BaseSolve._registry[cls.__name__] = cls

    def apply(self):
        raise NotImplementedError


class QuickFocusSolve(BaseSolve):
    """Move the image plane to the RMS-minimizing axial position
    (reference: solves/quick_focus.py:14-45)."""

    def __init__(self, optic, *args):
        self.optic = optic
        if optic.surfaces.num_surfaces <= 2:
            raise ValueError("Cannot optimize an empty optical system")

    def optimal_focus_distance(self, Hx=0, Hy=0, wavelength=None, num_rays=5,
                               distribution="hexapolar"):
        if wavelength is None:
            wavelength = self.optic.primary_wavelength
        rays = self.optic.trace(
            Hx=Hx, Hy=Hy, wavelength=wavelength, num_rays=num_rays,
            distribution=distribution,
        )
        L = np.asarray(rays.L)
        M = np.asarray(rays.M)
        N = np.asarray(rays.N)
        x = np.asarray(rays.x)
        y = np.asarray(rays.y)
        z = np.asarray(rays.z)
        A = L**2 + M**2
        B = L * x + M * y
        with np.errstate(divide="ignore", invalid="ignore"):
            t_opt = np.where(A != 0, -B / A, np.nan)
        return float(np.nanmean(z + t_opt * N))

    def apply(self):
        z_focus = self.optimal_focus_distance()
        surfs = self.optic.surfaces.surfaces
        from optiland_tpu.core.system import positions

        pos = np.asarray(positions(self.optic.system.stack))
        # adjust thickness before the image plane
        surfs[-2].thickness = float(
            surfs[-2].thickness + (z_focus - pos[-1])
        )
        self.optic._invalidate()


class MarginalRayHeightSolve(BaseSolve):
    """Adjust a surface's preceding thickness so the marginal ray has the
    target height there (reference: solves/thickness.py:119)."""

    ray = "marginal"

    def __init__(self, optic, surface_idx: int, height: float = 0.0):
        self.optic = optic
        self.surface_idx = surface_idx
        self.height = height

    def _ray(self):
        if self.ray == "marginal":
            return self.optic.paraxial.marginal_ray()
        return self.optic.paraxial.chief_ray()

    def apply(self):
        y, u = self._ray()
        y = np.ravel(np.asarray(y))
        u = np.ravel(np.asarray(u))
        u_in = u[0] if self.surface_idx == 0 else u[self.surface_idx - 1]
        if u_in == 0:
            return
        offset = (self.height - y[self.surface_idx]) / u_in
        surfs = self.optic.surfaces.surfaces
        surfs[self.surface_idx - 1].thickness = float(
            surfs[self.surface_idx - 1].thickness + offset
        )
        self.optic._invalidate()


class ChiefRayHeightSolve(MarginalRayHeightSolve):
    """Same, for the chief ray (reference: solves/thickness.py:127)."""

    ray = "chief"


class MarginalRayAngleCurvatureSolve(BaseSolve):
    """Set curvature for a target marginal ray exit angle
    (reference: solves/curvature.py:71)."""

    ray = "marginal"

    def __init__(self, optic, surface_idx: int, angle: float):
        self.optic = optic
        self.surface_idx = surface_idx
        self.angle = angle

    def apply(self):
        from optiland_tpu.core.system import n_all

        # Iterative: changing the curvature moves the ray path itself (the
        # chief ray must still pass through the stop; the marginal ray is
        # re-normalized to the system aperture), so one Newton step of the
        # paraxial refraction equation is not exact
        # (reference: solves/curvature.py:183-220 iterates 50x).
        i = self.surface_idx
        for _ in range(50):
            if self.ray == "marginal":
                y, u = self.optic.paraxial.marginal_ray()
            else:
                y, u = self.optic.paraxial.chief_ray()
            y = np.ravel(np.asarray(y))
            u = np.ravel(np.asarray(u))
            u_in = u[0] if i == 0 else u[i - 1]
            if abs(u[i] - self.angle) < 1e-12:
                break
            system = self.optic.system
            n = np.asarray(
                n_all(system.stack, system.cfg, system.primary_wavelength)
            )
            n_pre, n_post = n[i - 1], n[i]
            delta_n = n_post - n_pre
            if delta_n == 0 or y[i] == 0:
                return
            c = (n_pre * u_in - n_post * self.angle) / (y[i] * delta_n)
            self.optic.surfaces.surfaces[i].radius = (
                float(1.0 / c) if c != 0 else np.inf
            )
            self.optic._invalidate()


class ChiefRayAngleCurvatureSolve(MarginalRayAngleCurvatureSolve):
    """Same, for the chief ray (reference: solves/curvature.py:157)."""

    ray = "chief"


class SolveFactory:
    """Name -> solve class mapping (reference: solves/factory.py:21)."""

    _solve_map = {
        "quick_focus": QuickFocusSolve,
        "marginal_ray_height": MarginalRayHeightSolve,
        "marginal_ray_height_thickness": MarginalRayHeightSolve,
        "chief_ray_height": ChiefRayHeightSolve,
        "chief_ray_height_thickness": ChiefRayHeightSolve,
        "marginal_ray_angle": MarginalRayAngleCurvatureSolve,
        "marginal_ray_angle_curvature": MarginalRayAngleCurvatureSolve,
        "chief_ray_angle": ChiefRayAngleCurvatureSolve,
        "chief_ray_angle_curvature": ChiefRayAngleCurvatureSolve,
    }

    @staticmethod
    def create_solve(optic, solve_type: str, *args, **kwargs):
        cls = SolveFactory._solve_map.get(solve_type)
        if cls is None:
            raise ValueError(f"Unknown solve type {solve_type!r}")
        return cls(optic, *args, **kwargs)


class SolveManager:
    """Solve collection on an optic (reference: solves/solve_manager.py:14)."""

    def __init__(self, optic):
        self.optic = optic
        self.solves: list[BaseSolve] = []

    def __len__(self):
        return len(self.solves)

    def add(self, solve_type: str, *args, **kwargs):
        solve = SolveFactory.create_solve(self.optic, solve_type, *args, **kwargs)
        solve.apply()
        self.solves.append(solve)
        return solve

    def apply(self):
        for s in self.solves:
            s.apply()

    def clear(self):
        self.solves.clear()
