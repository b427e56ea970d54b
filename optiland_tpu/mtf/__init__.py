"""Modulation transfer function analyses.

FFTMTF: |FFT(PSF)| slices normalized at DC, with working-F/# frequency
calibration (reference: optiland/mtf/fft.py:19-238).
GeometricMTF: spot-histogram Fourier projection scaled by the diffraction
limit (reference: optiland/mtf/geometric.py:27-205, after Smith, Modern
Optical Engineering section 11.9).
SampledMTF: arbitrary-frequency OTF sampling from wavefront data
(reference: optiland/mtf/sampled.py:17).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from optiland_tpu.core import paraxial as paraxial_core
from optiland_tpu.psf.fft import calculate_grid_size, fft_psf, vectorial_fft_psf
from optiland_tpu.psf.huygens_fresnel import huygens_psf, working_FNO
from optiland_tpu.wavefront import compute_wavefront_data


def mtf_from_psf(psf):
    """Tangential and sagittal MTF slices of a PSF grid, DC-normalized
    (reference: mtf/fft.py:155-193)."""
    data = jnp.abs(jnp.fft.fftshift(jnp.fft.fft2(psf)))
    n = psf.shape[0]
    center = n // 2
    tangential = data[center:, center][:center]
    sagittal = data[center, center:][:center]
    dc = data[center, center]
    dc = jnp.where(dc == 0, 1.0, dc)
    return (
        jnp.clip(tangential / dc, 0.0, 1.0),
        jnp.clip(sagittal / dc, 0.0, 1.0),
    )


class FFTMTF:
    """FFT-based MTF (reference: mtf/fft.py:19 ScalarFFTMTF, :238 factory).

    Acts as the reference's factory: uses the vectorial FFT PSF when the
    optic carries a polarization state, the scalar one otherwise.
    """

    _force_vectorial = None  # subclasses pin True/False

    def __init__(
        self,
        optic,
        fields="all",
        wavelength="primary",
        num_rays: int = 128,
        grid_size: int | None = None,
        max_freq="cutoff",
        strategy: str = "chief_ray",
        remove_tilt: bool = False,
        **kwargs,
    ):
        if wavelength == "primary":
            wavelength = optic.primary_wavelength
        if grid_size is None:
            num_rays, grid_size = calculate_grid_size(num_rays)
        if fields == "all":
            fields = optic.fields.get_field_coords()
        self.optic = optic
        self.fields = fields
        self.wavelength = wavelength
        self.num_rays = num_rays
        self.grid_size = grid_size

        system = optic.system
        self.FNO = [
            float(working_FNO(system, f[0], f[1], wavelength)) for f in fields
        ]
        self.on_axis_fno = float(working_FNO(system, 0.0, 0.0, wavelength))

        if max_freq == "cutoff":
            self.max_freq = 1 / (wavelength * 1e-3 * self.on_axis_fno)
        else:
            self.max_freq = max_freq

        vectorial = self._force_vectorial
        if vectorial is None:
            vectorial = getattr(optic, "polarization_state", None) is not None
        if vectorial:
            self.psf = [
                vectorial_fft_psf(
                    system, f[0], f[1], wavelength,
                    num_rays=num_rays, grid_size=grid_size, strategy=strategy,
                    remove_tilt=remove_tilt,
                    pol_state=getattr(optic, "polarization_state", None),
                )
                for f in fields
            ]
        else:
            self.psf = [
                fft_psf(
                    system, f[0], f[1], wavelength,
                    num_rays=num_rays, grid_size=grid_size, strategy=strategy,
                    remove_tilt=remove_tilt,
                )
                for f in fields
            ]
        self.mtf = [mtf_from_psf(p) for p in self.psf]

        self.freq_tang = [
            np.arange(grid_size // 2) * self._df_tang(k)
            for k in range(len(fields))
        ]
        self.freq_sag = [
            np.arange(grid_size // 2) * self._df_sag(k)
            for k in range(len(fields))
        ]
        self.freq = self.freq_tang

    def _df_tang(self, k):
        df_chief = 1 / ((self.num_rays - 1) * self.wavelength * 1e-3 * self.FNO[k])
        return df_chief * (self.on_axis_fno / self.FNO[k])

    def _df_sag(self, k):
        return 1 / ((self.num_rays - 1) * self.wavelength * 1e-3 * self.FNO[k])

    def view(self, figsize=(10, 4), add_reference=False, ax=None):
        import matplotlib.pyplot as plt

        if ax is None:
            fig, ax = plt.subplots(figsize=figsize)
        else:
            fig = ax.figure
        for k, (tan, sag) in enumerate(self.mtf):
            ax.plot(self.freq_tang[k], np.asarray(tan), f"C{k}-",
                    label=f"field {self.fields[k]} T")
            ax.plot(self.freq_sag[k], np.asarray(sag), f"C{k}--",
                    label=f"field {self.fields[k]} S")
        if add_reference:
            f = np.linspace(0, self.max_freq, 256)
            ratio = np.clip(f / self.max_freq, 0, 1)
            phi = np.arccos(ratio)
            ax.plot(f, 2 / np.pi * (phi - np.cos(phi) * np.sin(phi)), "k--",
                    label="Diffraction limit")
        ax.set_xlim(0, self.max_freq)
        ax.set_ylim(0, 1)
        ax.set_xlabel("Frequency (cycles/mm)")
        ax.set_ylabel("Modulation")
        ax.legend(fontsize=7)
        return fig, ax


class ScalarFFTMTF(FFTMTF):
    """Scalar-only FFT MTF (reference: mtf/fft.py:19)."""

    _force_vectorial = False


class VectorialFFTMTF(FFTMTF):
    """Vectorial FFT MTF for polarized systems
    (reference: mtf/vectorial_fft.py:17)."""

    _force_vectorial = True


class HuygensMTF:
    """MTF from Huygens-Fresnel PSFs (reference: mtf/huygens_fresnel.py:31
    ScalarHuygensMTF / :330 VectorialHuygensMTF via factory).

    Per-field PSFs are computed with 4x-oversampled cutoff sampling and a
    shared on-axis normalization; frequency steps come from the PSF pixel
    pitch, with the tangential axis compressed by FNO_on/FNO_off.
    """

    _force_vectorial = None

    def __init__(
        self,
        optic,
        fields="all",
        wavelength="primary",
        num_rays: int = 128,
        image_size: int = 128,
        max_freq="cutoff",
    ):
        if wavelength == "primary":
            wavelength = optic.primary_wavelength
        if fields == "all":
            fields = optic.fields.get_field_coords()
        self.optic = optic
        self.fields = fields
        self.wavelength = wavelength
        self.num_rays = num_rays
        self.image_size = image_size

        vectorial = self._force_vectorial
        if vectorial is None:
            vectorial = getattr(optic, "polarization_state", None) is not None
        pol_state = getattr(optic, "polarization_state", None)

        system = optic.system
        self.FNO = [
            float(working_FNO(system, f[0], f[1], wavelength)) for f in fields
        ]
        self.on_axis_fno = float(working_FNO(system, 0.0, 0.0, wavelength))
        if max_freq == "cutoff":
            self.max_freq = 1 / (wavelength * 1e-3 * self.on_axis_fno)
        else:
            self.max_freq = max_freq

        # Shared normalization from the on-axis PSF (auto-extent grid)
        _, _, normalization = huygens_psf(
            system, 0.0, 0.0, wavelength, num_rays=num_rays,
            image_size=image_size, pol_state=pol_state, vectorial=vectorial,
        )

        self.psf = []
        self.pixel_pitch = []
        for f in fields:
            psf, pitch, _ = huygens_psf(
                system, f[0], f[1], wavelength, num_rays=num_rays,
                image_size=image_size, oversample=4.0,
                normalization=normalization, pol_state=pol_state,
                vectorial=vectorial,
            )
            self.psf.append(psf)
            self.pixel_pitch.append(float(pitch))
        self.mtf = [mtf_from_psf(p) for p in self.psf]

        self.freq_tang = [
            np.arange(image_size // 2) * self._df_tang(k)
            for k in range(len(fields))
        ]
        self.freq_sag = [
            np.arange(image_size // 2) * self._df_sag(k)
            for k in range(len(fields))
        ]
        self.freq = self.freq_tang

    def _df_tang(self, k):
        df = 1.0 / (self.image_size * self.pixel_pitch[k])
        return df * (self.on_axis_fno / self.FNO[k])

    def _df_sag(self, k):
        return 1.0 / (self.image_size * self.pixel_pitch[k])

    view = FFTMTF.view


class ScalarHuygensMTF(HuygensMTF):
    _force_vectorial = False


class VectorialHuygensMTF(HuygensMTF):
    _force_vectorial = True


def geometric_mtf_curve(x_img, freqs, num_points: int):
    """MTF of a 1-D spot projection via histogram Fourier sum
    (reference: mtf/geometric.py:178-204). Differentiable in x via the
    soft-histogram? No — uses hard histogram like the reference."""
    A, edges = jnp.histogram(x_img, bins=num_points + 1)
    x = (edges[1:] + edges[:-1]) / 2
    dx = x[1] - x[0]
    A = A.astype(x.dtype)
    total = jnp.sum(A * dx)
    Ac = jnp.sum(
        A[None, :] * jnp.cos(2 * jnp.pi * freqs[:, None] * x[None, :]) * dx, axis=1
    ) / total
    As = jnp.sum(
        A[None, :] * jnp.sin(2 * jnp.pi * freqs[:, None] * x[None, :]) * dx, axis=1
    ) / total
    return jnp.sqrt(Ac**2 + As**2)


class GeometricMTF:
    """Spot-based geometric MTF (reference: mtf/geometric.py:27)."""

    def __init__(
        self,
        optic,
        fields="all",
        wavelength="primary",
        num_rays: int = 100,
        distribution: str = "uniform",
        num_points: int = 256,
        max_freq="cutoff",
        scale: bool = True,
    ):
        from optiland_tpu.analysis.spot import SpotDiagram

        if wavelength == "primary":
            wavelength = optic.primary_wavelength
        self.optic = optic
        self.num_points = num_points
        self.scale = scale
        fno = float(np.ravel(optic.paraxial.FNO())[0])
        self.cutoff_freq = 1 / (wavelength * 1e-3 * fno)
        self.max_freq = self.cutoff_freq if max_freq == "cutoff" else max_freq
        if fields == "all":
            fields = optic.fields.get_field_coords()
        self.fields = fields

        sd = SpotDiagram(
            optic, fields=fields, wavelengths=[wavelength],
            num_rings=num_rays, distribution=distribution,
        )
        self.freq = jnp.linspace(0, self.max_freq, num_points)
        if scale:
            ratio = jnp.clip(self.freq / self.cutoff_freq, 0.0, 1.0)
            phi = jnp.arccos(ratio)
            self.diff_limited_mtf = 2 / jnp.pi * (phi - jnp.cos(phi) * jnp.sin(phi))
            sf = self.diff_limited_mtf
        else:
            self.diff_limited_mtf = jnp.ones_like(self.freq)
            sf = 1.0
        self.mtf = []
        for row in sd.data:
            spot = row[0]
            self.mtf.append(
                [
                    geometric_mtf_curve(jnp.asarray(spot.y), self.freq, num_points) * sf,
                    geometric_mtf_curve(jnp.asarray(spot.x), self.freq, num_points) * sf,
                ]
            )

    def view(self, figsize=(10, 4), add_reference=False, ax=None):
        import matplotlib.pyplot as plt

        if ax is None:
            fig, ax = plt.subplots(figsize=figsize)
        else:
            fig = ax.figure
        freq = np.asarray(self.freq)
        for k, (tan, sag) in enumerate(self.mtf):
            ax.plot(freq, np.asarray(tan), f"C{k}-", label=f"field {k} T")
            ax.plot(freq, np.asarray(sag), f"C{k}--", label=f"field {k} S")
        if add_reference:
            ax.plot(freq, np.asarray(self.diff_limited_mtf), "k--",
                    label="Diffraction limit")
        ax.set_xlabel("Frequency (cycles/mm)")
        ax.set_ylabel("Modulation")
        ax.legend(fontsize=7)
        return fig, ax


class SampledMTF:
    """OTF at arbitrary spatial frequencies from pupil autocorrelation
    (reference: mtf/sampled.py:17)."""

    def __init__(
        self,
        optic,
        field,
        wavelength="primary",
        num_rays: int = 64,
        strategy: str = "chief_ray",
    ):
        if wavelength == "primary":
            wavelength = optic.primary_wavelength
        self.optic = optic
        self.field = field
        self.wavelength = wavelength
        from optiland_tpu.psf.fft import pupil_grid_coords

        xg, yg, mask = pupil_grid_coords(num_rays)
        self.data = compute_wavefront_data(
            optic.system, field[0], field[1], wavelength, xg[mask], yg[mask],
            strategy=strategy,
        )
        self._xn = xg[mask]
        self._yn = yg[mask]
        self.fno = float(working_FNO(optic.system, field[0], field[1], wavelength))

    def calculate_mtf(self, frequencies):
        """MTF at given (fx, fy) cycles/mm tuples via shifted-pupil overlap
        integrals of the complex pupil function."""
        wl_mm = self.wavelength * 1e-3
        amp = jnp.sqrt(jnp.maximum(self.data.intensity, 0.0))
        # vignetted/invalid rays carry zero intensity but NaN OPD; mask them
        # so they contribute nothing rather than poisoning the sums
        opd = jnp.where(
            (self.data.intensity > 0) & jnp.isfinite(self.data.opd),
            self.data.opd, 0.0,
        )
        amp = jnp.where(jnp.isfinite(self.data.opd), amp, 0.0)
        P = amp * jnp.exp(1j * 2 * jnp.pi * opd)
        # pupil radius in cutoff-normalized units: shift s = lambda * f * FNO
        out = []
        denom = jnp.sum(amp**2)
        for (fx, fy) in frequencies:
            sx = wl_mm * fx * self.fno * 2  # normalized pupil shift
            sy = wl_mm * fy * self.fno * 2
            # interpolate the shifted pupil onto the sample set via nearest
            # neighbor over the scattered normalized coordinates
            xq = self._xn + sx
            yq = self._yn + sy
            inside = xq**2 + yq**2 <= 1
            d2 = (xq[:, None] - self._xn[None, :]) ** 2 + (
                yq[:, None] - self._yn[None, :]
            ) ** 2
            idx = jnp.argmin(d2, axis=1)
            P_shift = jnp.where(inside, P[idx], 0.0)
            val = jnp.abs(jnp.sum(P * jnp.conj(P_shift))) / denom
            out.append(val)
        return [float(v) for v in out]
