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
    if jax.default_backend() != "cpu":
        # C128 does not exist on TPU: force f32 inputs so every complex
        # intermediate is complex64 even when x64 mode is on
        f32 = jnp.float32
        image_x, image_y, image_z = (
            image_x.astype(f32), image_y.astype(f32), image_z.astype(f32)
        )
        pupil_x, pupil_y, pupil_z = (
            pupil_x.astype(f32), pupil_y.astype(f32), pupil_z.astype(f32)
        )
        pupil_amp = pupil_amp.astype(f32)
        pupil_opd_mm = pupil_opd_mm.astype(f32)
        wavelength_mm = jnp.asarray(wavelength_mm, f32)
        Rp = jnp.asarray(Rp, f32)
    k = 2.0 * jnp.pi / wavelength_mm
    # lax.complex keeps the complex width tied to the real inputs (c64 on
    # TPU where C128 does not exist; c128 in x64 CPU parity runs)
    ph = -k * pupil_opd_mm
    phase_p = pupil_amp * jax.lax.complex(jnp.cos(ph), jnp.sin(ph))  # (Q,)

    def one_chunk(img):
        xi, yi, zi = img
        dx = xi[:, None] - pupil_x[None, :]
        dy = yi[:, None] - pupil_y[None, :]
        dz = zi[:, None] - pupil_z[None, :]
        R = jnp.sqrt(dx * dx + dy * dy + dz * dz)
        kR = k * R
        wave = jax.lax.complex(jnp.cos(kR), jnp.sin(kR)) / R
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


def _native_eligible(*arrays):
    """True when the native C++/OpenMP kernel may be used: CPU backend,
    concrete (non-traced) inputs, library available, not disabled."""
    import os

    if os.environ.get("OPTILAND_TPU_NATIVE", "1") == "0":
        return False
    if jax.default_backend() != "cpu":
        return False
    if any(isinstance(a, jax.core.Tracer) for a in arrays):
        return False
    from optiland_tpu import _native

    return _native.available()


def huygens_psf_from_data(
    data, image_x, image_y, image_z, wavelength_um, chunk: int = 4096
):
    """|field|^2 over an image grid given WavefrontData.

    On the CPU backend with concrete inputs this dispatches to the native
    C++/OpenMP kernel (the runtime analogue of the reference's numba
    strategy); traced/jitted/TPU evaluation uses the jnp path so
    differentiation and fusion are unaffected.
    """
    wl_mm = wavelength_um * 1e-3
    amp = jnp.sqrt(jnp.maximum(data.intensity, 0.0))
    opd_mm = data.opd * wl_mm
    shape = image_x.shape
    if _native_eligible(image_x, data.pupil_x, amp, opd_mm, data.radius):
        from optiland_tpu import _native

        psf = _native.huygens_psf_native(
            np.asarray(image_x).ravel(), np.asarray(image_y).ravel(),
            np.asarray(image_z).ravel(), data.pupil_x, data.pupil_y,
            data.pupil_z, amp, opd_mm, float(wl_mm), float(data.radius),
        )
        return jnp.asarray(psf.reshape(shape))
    import os

    if (
        jax.default_backend() != "cpu"
        and os.environ.get("OPTILAND_TPU_PALLAS_HUYGENS", "1") != "0"
    ):
        # fused Pallas reduction on TPU (SURVEY 2.24 native site #1)
        from optiland_tpu.ops.pallas_huygens import huygens_field_pallas

        f = huygens_field_pallas(
            image_x.ravel(), image_y.ravel(), image_z.ravel(),
            data.pupil_x, data.pupil_y, data.pupil_z,
            amp, opd_mm, wl_mm, data.radius,
        )
        return jnp.abs(f.reshape(shape)) ** 2
    f = huygens_field(
        image_x.ravel(), image_y.ravel(), image_z.ravel(),
        data.pupil_x, data.pupil_y, data.pupil_z,
        amp, opd_mm, wl_mm, data.radius, chunk=chunk,
    )
    return jnp.abs(f.reshape(shape)) ** 2


def vectorial_huygens_psf_from_data(
    data, image_x, image_y, image_z, wavelength_um, chunk: int = 4096
):
    """Incoherent sum of |field|^2 over the Cartesian E-components of each
    incoherent polarization state (reference: psf/vectorial_huygens.py:51-106)."""
    wl_mm = wavelength_um * 1e-3
    opd_mm = data.opd * wl_mm
    is_valid = data.intensity > 0
    shape = image_x.shape
    use_native = _native_eligible(
        image_x, data.pupil_x, data.E_exits[0], opd_mm, data.radius
    )
    psf = jnp.zeros(shape)
    for E_exit in data.E_exits:
        for comp in range(3):
            amp = jnp.where(is_valid, E_exit[:, comp], 0.0)
            if use_native:
                from optiland_tpu import _native

                psf = psf + jnp.asarray(
                    _native.huygens_psf_native(
                        np.asarray(image_x).ravel(),
                        np.asarray(image_y).ravel(),
                        np.asarray(image_z).ravel(),
                        data.pupil_x, data.pupil_y, data.pupil_z,
                        amp, opd_mm, float(wl_mm), float(data.radius),
                    ).reshape(shape)
                )
                continue
            f = huygens_field(
                image_x.ravel(), image_y.ravel(), image_z.ravel(),
                data.pupil_x, data.pupil_y, data.pupil_z,
                amp, opd_mm, wl_mm, data.radius, chunk=chunk,
            )
            psf = psf + jnp.abs(f.reshape(shape)) ** 2
    return psf


def _image_grid(
    system, Hx, Hy, wavelength, image_size,
    oversample=None, pixel_pitch=None,
):
    """Image-plane sample grid centered on the beam centroid.

    Half-extent comes from (in priority order) an explicit pixel pitch, the
    oversampled optical cutoff, or the geometric/Airy footprint
    (reference: psf/huygens_fresnel.py:147-210).
    Returns (gx, gy, gz, pixel_pitch_mm).
    """
    from optiland_tpu.core import raygen, trace as trace_core
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

    if pixel_pitch is not None:
        extent = 0.5 * image_size * pixel_pitch
    elif oversample is not None:
        fno = working_FNO(system, Hx, Hy, wavelength)
        f_cutoff = 1.0 / (fno * wavelength * 1e-3)
        pixel_pitch = 1.0 / (2 * oversample * f_cutoff)
        extent = 0.5 * image_size * pixel_pitch
    else:
        extent_geom = jnp.max(
            jnp.where(valid, jnp.hypot(final.x - cx, final.y - cy), 0.0)
        )
        fno = working_FNO(system, Hx, Hy, wavelength)
        extent_ideal = 5.0 * fno * 1.22 * wavelength * 1e-3
        extent = jnp.maximum(extent_geom, extent_ideal)
        pixel_pitch = 2 * extent / image_size

    lin = jnp.linspace(-1.0, 1.0, image_size)
    gx = cx + extent * lin[None, :] * jnp.ones((image_size, 1))
    gy = cy + extent * lin[:, None] * jnp.ones((1, image_size))
    gz = jnp.full_like(gx, positions(system.stack)[-1])
    return gx, gy, gz, pixel_pitch


def huygens_psf(
    system: System,
    Hx,
    Hy,
    wavelength,
    num_rays: int = 128,
    image_size: int = 128,
    strategy: str = "chief_ray",
    chunk: int = 4096,
    oversample=None,
    pixel_pitch=None,
    normalization=None,
    pol_state=None,
    vectorial: bool = False,
):
    """Functional Huygens PSF on an auto-sized image grid.

    Returns (psf, pixel_pitch_mm, normalization). Normalized so a
    diffraction-limited system peaks at 100. ``vectorial=True`` integrates
    the three Cartesian exit-field components per incoherent polarization
    state (requires a polarized system).
    """
    from optiland_tpu.psf.fft import pupil_grid_coords

    xg, yg, mask = pupil_grid_coords(num_rays)
    data = compute_wavefront_data(
        system, Hx, Hy, wavelength, xg[mask], yg[mask], strategy=strategy,
        pol_state=pol_state,
    )
    if vectorial and data.E_exits is None:
        raise ValueError(
            "E_exits must be populated in WavefrontData for the vectorial "
            "Huygens PSF. Enable polarization on the optic."
        )

    gx, gy, gz, pixel_pitch = _image_grid(
        system, Hx, Hy, wavelength, image_size,
        oversample=oversample, pixel_pitch=pixel_pitch,
    )

    if vectorial:
        psf = vectorial_huygens_psf_from_data(
            data, gx, gy, gz, wavelength, chunk=chunk
        )
    else:
        psf = huygens_psf_from_data(data, gx, gy, gz, wavelength, chunk=chunk)

    if normalization is None:
        # On-axis zero-OPD pupil, single image point at the origin
        if (Hx, Hy) != (0.0, 0.0):
            data0 = compute_wavefront_data(
                system, 0.0, 0.0, wavelength, xg[mask], yg[mask],
                strategy=strategy, pol_state=pol_state,
            )
        else:
            data0 = data
        z_img = jnp.full((1, 1), positions(system.stack)[-1])
        if vectorial:
            # actual exit-field amplitudes, zero OPD
            # (reference: psf/vectorial_huygens.py:108-169)
            ideal = data0.replace(opd=jnp.zeros_like(data0.opd))
            normalization = vectorial_huygens_psf_from_data(
                ideal, jnp.zeros((1, 1)), jnp.zeros((1, 1)), z_img, wavelength
            )[0, 0]
        else:
            ideal = data0.replace(
                opd=jnp.zeros_like(data0.opd),
                intensity=jnp.ones_like(data0.intensity),
            )
            normalization = huygens_psf_from_data(
                ideal, jnp.zeros((1, 1)), jnp.zeros((1, 1)), z_img, wavelength
            )[0, 0]
    return psf / normalization * 100.0, pixel_pitch, normalization


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


class ScalarHuygensPSF:
    """Huygens PSF analysis (reference: psf/huygens_fresnel.py:31,351)."""

    _vectorial = False

    def __init__(
        self,
        optic,
        field,
        wavelength="primary",
        num_rays: int = 128,
        image_size: int = 128,
        strategy: str = "chief_ray",
        oversample=None,
        pixel_pitch=None,
        normalization=None,
        **kwargs,
    ):
        if wavelength == "primary":
            wavelength = optic.primary_wavelength
        self.optic = optic
        self.field = field
        self.wavelength = wavelength
        self.image_size = image_size
        self.psf, self.pixel_pitch, self.normalization = huygens_psf(
            optic.system, field[0], field[1], wavelength,
            num_rays=num_rays, image_size=image_size, strategy=strategy,
            oversample=oversample, pixel_pitch=pixel_pitch,
            normalization=normalization,
            pol_state=getattr(optic, "polarization_state", None),
            vectorial=self._vectorial,
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


class HuygensPSF(ScalarHuygensPSF):
    """Huygens PSF factory: vectorial when the optic carries a polarization
    state, scalar otherwise (reference: psf/huygens_fresnel.py:351+ factory)."""

    def __new__(cls, optic, *args, **kwargs):
        if cls is HuygensPSF and getattr(optic, "polarization_state", None) is not None:
            from optiland_tpu.psf.vectorial import VectorialHuygensPSF

            return VectorialHuygensPSF(optic, *args, **kwargs)
        return super().__new__(cls)
