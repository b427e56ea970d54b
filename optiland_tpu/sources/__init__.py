"""Extended sources: physical ray bundles decoupled from field/pupil aiming.

(reference: optiland/sources/base.py:1-128 BaseSource, smf.py:1-201
SMFSource, visualization.py SourceViewer, optic/extended_source_optic.py
ExtendedSourceOptic)
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from optiland_tpu.core.rays import RealRays


class BaseSource:
    """Abstract source: produces a RealRays bundle in global coordinates
    (reference: sources/base.py:20).

    ``position`` is a GLOBAL coordinate (surface 1 sits at z = 0); it is
    unrelated to the object-surface thickness used by field-based tracing.
    To collimate a fiber, place the source at the front focal point
    (z = optic.paraxial.F1()).
    """

    def __init__(self, position=(0.0, 0.0, 0.0)):
        self.position = tuple(float(v) for v in position)

    def generate_rays(self, num_rays: int) -> RealRays:
        raise NotImplementedError

    def _globalize(self, x, y, z):
        px, py, pz = self.position
        return x + px, y + py, z + pz

    def draw(self, num_rays: int = 5000, propagation_distance: float = 0.1,
             figsize=(18, 8), **kwargs):
        return SourceViewer(self).view(
            num_rays=num_rays, propagation_distance=propagation_distance,
            figsize=figsize,
        )


class SMFSource(BaseSource):
    """Single-mode fiber source: Gaussian spatial + angular phase space
    sampled with scrambled Sobol sequences, non-paraxial tangent-mapped
    direction cosines (reference: sources/smf.py:28-201).

    num_rays is rounded UP to the next power of two (Sobol requirement).
    """

    def __init__(self, mfd_um: float, wavelength_um: float,
                 divergence_deg_1e2: float | None = None,
                 total_power: float = 1.0, position=(0.0, 0.0, 0.0),
                 is_point_source: bool = False, seed: int | None = None):
        super().__init__(position=position)
        self.wavelength = wavelength_um
        self.total_power = total_power
        self.mfd_um = mfd_um
        self.is_point_source = is_point_source
        self.seed = seed
        if divergence_deg_1e2 is None:
            w0 = mfd_um / 2.0
            theta_half_rad = wavelength_um / (math.pi * w0)
            self.divergence_deg_1e2 = 2 * math.degrees(theta_half_rad)
        else:
            self.divergence_deg_1e2 = divergence_deg_1e2
        w0_um = mfd_um / 2.0
        self.sigma_spatial_mm = (w0_um * 1e-3) / 2.0
        self.sigma_angular_rad = math.radians(self.divergence_deg_1e2 / 2) / 2

    def generate_rays(self, num_rays: int) -> RealRays:
        if num_rays <= 0:
            raise ValueError("num_rays must be a positive integer.")
        from scipy.stats import qmc

        num_samples = 1 << (num_rays - 1).bit_length()
        sampler = qmc.Sobol(d=4, scramble=True, seed=self.seed)
        u = jnp.asarray(sampler.random(num_samples))
        sqrt2 = math.sqrt(2.0)
        erfinv = jax.scipy.special.erfinv
        if self.is_point_source:
            x = jnp.zeros(num_samples)
            y = jnp.zeros(num_samples)
        else:
            x = self.sigma_spatial_mm * sqrt2 * erfinv(2 * u[:, 0] - 1)
            y = self.sigma_spatial_mm * sqrt2 * erfinv(2 * u[:, 1] - 1)
        theta_x = self.sigma_angular_rad * sqrt2 * erfinv(2 * u[:, 2] - 1)
        theta_y = self.sigma_angular_rad * sqrt2 * erfinv(2 * u[:, 3] - 1)
        tau_x, tau_y = jnp.tan(theta_x), jnp.tan(theta_y)
        N = 1.0 / jnp.sqrt(1.0 + tau_x**2 + tau_y**2)
        L, M = tau_x * N, tau_y * N
        z = jnp.zeros_like(x)
        x, y, z = self._globalize(x, y, z)
        power = self.total_power / num_samples
        return RealRays.create(
            x, y, z, L, M, N,
            jnp.full((num_samples,), power),
            jnp.full((num_samples,), self.wavelength),
        )

    def __repr__(self):
        mode = "point" if self.is_point_source else "extended"
        return (
            f"SMFSource(mfd={self.mfd_um}um, "
            f"divergence={self.divergence_deg_1e2}deg, "
            f"wavelength={self.wavelength}um, power={self.total_power}W, "
            f"mode={mode}, position={self.position})"
        )


class SourceViewer:
    """Six-panel phase-space visualization of a source
    (reference: sources/visualization.py:1-341)."""

    def __init__(self, source: BaseSource):
        self.source = source

    def view(self, num_rays: int = 5000, propagation_distance: float = 0.1,
             figsize=(18, 8), **kwargs):
        import matplotlib.pyplot as plt

        rays = self.source.generate_rays(num_rays)
        x = np.asarray(rays.x)
        y = np.asarray(rays.y)
        z = np.asarray(rays.z)
        L = np.asarray(rays.L)
        M = np.asarray(rays.M)
        N = np.asarray(rays.N)
        i = np.asarray(rays.i)

        fig, axs = plt.subplots(2, 3, figsize=figsize)
        axs[0, 0].scatter(x * 1e3, y * 1e3, c=i, s=2, cmap="viridis")
        axs[0, 0].set_xlabel("x (um)")
        axs[0, 0].set_ylabel("y (um)")
        axs[0, 0].set_title("Spatial distribution")
        axs[1, 0].scatter(L, M, c=i, s=2, cmap="viridis")
        axs[1, 0].set_xlabel("L")
        axs[1, 0].set_ylabel("M")
        axs[1, 0].set_title("Angular distribution")
        axs[0, 1].hist(x * 1e3, bins=60, alpha=0.6, label="x")
        axs[0, 1].hist(y * 1e3, bins=60, alpha=0.6, label="y")
        axs[0, 1].legend()
        axs[0, 1].set_title("Spatial cross-sections (um)")
        axs[1, 1].hist(L, bins=60, alpha=0.6, label="L")
        axs[1, 1].hist(M, bins=60, alpha=0.6, label="M")
        axs[1, 1].legend()
        axs[1, 1].set_title("Angular cross-sections")
        n_show = min(200, x.shape[0])
        t = propagation_distance
        for k in range(n_show):
            axs[0, 2].plot([z[k], z[k] + t * N[k]], [x[k], x[k] + t * L[k]],
                           lw=0.3, alpha=0.4, color="C0")
            axs[1, 2].plot([z[k], z[k] + t * N[k]], [y[k], y[k] + t * M[k]],
                           lw=0.3, alpha=0.4, color="C1")
        axs[0, 2].set_title("XZ propagation")
        axs[1, 2].set_title("YZ propagation")
        fig.tight_layout()
        return fig, list(axs.ravel())


class ExtendedSourceOptic:
    """Optic wrapper that traces rays from an attached extended source
    instead of field/pupil aiming (reference: optic/extended_source_optic.py).
    """

    def __init__(self, optic, source: BaseSource):
        object.__setattr__(self, "optic", optic)
        object.__setattr__(self, "source", source)

    def __getattr__(self, name):
        return getattr(self.optic, name)

    def __setattr__(self, name, value):
        if name in ("optic", "source"):
            object.__setattr__(self, name, value)
        else:
            setattr(self.optic, name, value)

    def __repr__(self):
        optic_name = self.optic.name or "Unnamed"
        return (
            f"ExtendedSourceOptic(optic='{optic_name}', "
            f"source={type(self.source).__name__})"
        )

    def trace(self, num_rays: int = 1000):
        """Generate-and-trace: returns (final rays, per-surface path dict)."""
        from optiland_tpu.core import trace as trace_core

        rays = self.source.generate_rays(num_rays)
        final, history = trace_core.trace(self.optic.system, rays, record=True)
        path = {k: history[k] for k in ("x", "y", "z")}
        return final, path

    def draw(self, num_rays: int = 100, figsize=(10, 4), xlim=None, ylim=None,
             title=None, projection: str = "YZ", ax=None):
        import matplotlib.pyplot as plt

        from optiland_tpu.visualization import OpticViewer

        if ax is None:
            fig, ax = plt.subplots(figsize=figsize)
        else:
            fig = ax.figure
        OpticViewer(self.optic).view(ax=ax, num_rays=0)
        _, path = self.trace(num_rays)
        a, b = {"YZ": ("z", "y"), "XZ": ("z", "x"), "XY": ("x", "y")}[
            projection
        ]
        A = np.asarray(path[a])
        B = np.asarray(path[b])
        n_show = min(num_rays, A.shape[1])
        for k in range(n_show):
            ax.plot(A[:, k], B[:, k], lw=0.4, alpha=0.5, color="C3")
        if xlim:
            ax.set_xlim(xlim)
        if ylim:
            ax.set_ylim(ylim)
        if title:
            ax.set_title(title)
        return fig, ax


__all__ = ["BaseSource", "SMFSource", "SourceViewer", "ExtendedSourceOptic"]
