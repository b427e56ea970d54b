"""Gradient-index (SELFOC) fiber-lens ray paths and pitch optimization.

Run: python examples/06_grin_selfoc.py

Goes beyond the reference implementation (whose GRIN propagation is an
unimplemented placeholder): rays integrate the curved-ray equation with a
fixed-step RK4 under lax.scan, so the whole propagation is one compiled
program and fully differentiable — here jax.grad tunes the gradient
constant so a quarter pitch lands exactly at the rod's exit face.
"""

import os

os.environ.setdefault("MPLBACKEND", "Agg")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import matplotlib.pyplot as plt
import numpy as np

from optiland_tpu.core.rays import RealRays
from optiland_tpu.propagation import GRINMedium, GRINPropagation


def make_rays(n=9, r_max=0.08):
    x = np.linspace(-r_max, r_max, n)
    return RealRays.create(x, 0.0, 0.0, 0.0, 0.0, 1.0, 1.0, 0.55)


def main():
    n0, A = 1.6, 0.25  # base index, gradient constant (1/mm^2)
    length = 8.0  # rod length (mm)
    medium = GRINMedium(n0=n0, nr2=-n0 * A / 2)
    prop = GRINPropagation(medium, num_steps=256)

    # 1. Ray paths through the rod (sample intermediate states)
    rays = make_rays()
    zs = np.linspace(0, length, 33)
    paths = np.stack(
        [np.asarray(prop.propagate(rays, float(z)).x) for z in zs]
    )

    fig, ax = plt.subplots(figsize=(8, 3.5))
    for k in range(paths.shape[1]):
        ax.plot(zs, paths[:, k], lw=1)
    quarter = (np.pi / 2) / np.sqrt(A)
    ax.axvline(quarter, color="k", ls="--", lw=0.8,
               label=f"quarter pitch = {quarter:.3f} mm")
    ax.set_xlabel("z (mm)")
    ax.set_ylabel("ray height x (mm)")
    ax.set_title("SELFOC rod: sinusoidal ray paths")
    ax.legend()
    fig.tight_layout()
    fig.savefig("grin_selfoc_paths.png", dpi=120)
    print(f"quarter pitch (analytic): {quarter:.4f} mm; "
          "wrote grin_selfoc_paths.png")

    # 2. Differentiable design: find the gradient constant A whose quarter
    # pitch equals the rod length (all rays focused at the exit face)
    rays = make_rays(n=17)

    def exit_spot(A_var):
        med = GRINMedium(n0=n0, nr2=-n0 * A_var / 2)
        out = GRINPropagation(med, num_steps=256).propagate(rays, length)
        return jnp.mean(out.x**2)

    A_var = jnp.asarray(0.02)
    vg = jax.jit(jax.value_and_grad(exit_spot))
    for i in range(60):
        v, g = vg(A_var)
        A_var = A_var - 2e-2 * g / (jnp.abs(g) + 1e-12) * jnp.maximum(
            jnp.abs(A_var), 1e-3
        )
    A_target = (np.pi / (2 * length)) ** 2
    print(f"optimized A = {float(A_var):.6f} 1/mm^2 "
          f"(analytic quarter-pitch-at-exit: {A_target:.6f}); "
          f"exit RMS x = {float(jnp.sqrt(v)):.2e} mm")


if __name__ == "__main__":
    main()
