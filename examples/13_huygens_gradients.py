"""Huygens-Fresnel PSF with exact gradients through the summation.

Run: python examples/13_huygens_gradients.py

The direct Huygens-Fresnel summation is the reference's #1 native hot
spot (a Numba parallel loop with NO gradient path). Here the summation
is a Pallas kernel pair whose adjoint runs INSIDE the kernels with
O(P + Q) memory — so you can differentiate an image-plane metric with
respect to every pupil amplitude/OPD (or, composed with the trace, any
lens parameter). On CPU the kernels run in interpret mode; on TPU the
same code measured 6.96e9 pairwise terms/s fwd+adjoint
(docs/PROFILE.md).
"""

import os

os.environ.setdefault("OPTILAND_TPU_X64", "0")

import jax
import jax.numpy as jnp
import numpy as np

from optiland_tpu.ops.pallas_huygens import huygens_field_pallas

FAST = os.environ.get("OPTILAND_TPU_EXAMPLE_FAST") == "1"


def main():
    # a converging spherical wavefront sampled on a disk pupil
    Q = 512 if FAST else 4096           # pupil points
    P = 24 * 24 if FAST else 64 * 64    # image points
    wavelength_mm = 0.55e-3
    Rp, a = 100.0, 10.0

    rng = np.random.default_rng(0)
    r = a * np.sqrt(rng.uniform(size=Q))
    th = rng.uniform(0, 2 * np.pi, size=Q)
    px = jnp.asarray(r * np.cos(th), jnp.float32)
    py = jnp.asarray(r * np.sin(th), jnp.float32)
    pz = -jnp.sqrt(Rp**2 - px**2 - py**2)
    amp = jnp.ones((Q,), jnp.float32)

    side = int(np.sqrt(P))
    g = np.linspace(-0.02, 0.02, side).astype(np.float32)
    IX, IY = np.meshgrid(g, g)
    ix, iy = jnp.asarray(IX.ravel()), jnp.asarray(IY.ravel())
    iz = jnp.zeros_like(ix)

    def psf(opd):
        E = huygens_field_pallas(
            ix, iy, iz, px, py, pz, amp, opd, wavelength_mm, Rp
        )
        return jnp.real(E) ** 2 + jnp.imag(E) ** 2

    # Strehl-style metric: on-axis intensity over total energy
    def strehl_proxy(opd):
        I = psf(opd)
        return I[P // 2] / jnp.sum(I)

    opd0 = jnp.zeros((Q,), jnp.float32)
    s0 = float(strehl_proxy(opd0))
    print(f"perfect sphere: on-axis share = {s0:.4e}")

    # perturb the wavefront with a coma-like OPD and DIFFERENTIATE the
    # metric w.r.t. every pupil OPD sample — the adjoint kernels at work
    coma = 2e-4 * (px / a) * ((px / a) ** 2 + (py / a) ** 2)
    s1, grad = jax.value_and_grad(strehl_proxy)(coma)
    print(f"with coma:     on-axis share = {float(s1):.4e}")
    g = np.asarray(grad)
    print(f"dStrehl/dOPD: finite={np.isfinite(g).all()}, "
          f"|g|max={np.abs(g).max():.3e} per mm of OPD")

    # gradient ASCENT on the metric: one step of wavefront correction
    # (note the sign — we maximize the on-axis share)
    step = 0.5 * float(s1) / float(np.abs(g).max()) ** 2
    corrected = jnp.asarray(coma + step * grad)
    s2 = float(strehl_proxy(corrected))
    print(f"after 1 ascent step: {s2:.4e} (was {float(s1):.4e})")
    assert s2 > float(s1), "gradient step must improve the metric"


if __name__ == "__main__":
    main()
