"""Image simulation: spatially-variant blur + distortion/lateral color.

EigenPSF pipeline (reference: optiland/analysis/image_simulation/
psf_basis_generator.py, simulator.py, distortion_warper.py, engine.py):
a field grid of FFT PSFs is SVD-decomposed into EigenPSFs + coefficient
maps; the image is blurred as a weighted sum of FFT convolutions — pure
batched FFT work that XLA fuses — then warped through a polynomial
distortion map sampled bilinearly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _fftconvolve_same(image, kernel):
    """2-D linear convolution, 'same' output, via zero-padded FFTs."""
    H, W = image.shape
    kh, kw = kernel.shape
    fh, fw = H + kh - 1, W + kw - 1
    F = jnp.fft.rfft2(image, (fh, fw)) * jnp.fft.rfft2(kernel, (fh, fw))
    full = jnp.fft.irfft2(F, (fh, fw))
    y0, x0 = (kh - 1) // 2, (kw - 1) // 2
    return full[y0: y0 + H, x0: x0 + W]


class PSFBasisGenerator:
    """EigenPSF basis via SVD over a field grid of FFT PSFs
    (reference: psf_basis_generator.py:14-174)."""

    def __init__(self, optic, wavelength, grid_shape=(5, 5), num_rays=128,
                 psf_grid_size=None):
        self.optic = optic
        self.wavelength = wavelength
        self.grid_shape = grid_shape
        self.num_rays = num_rays
        self.psf_grid_size = psf_grid_size

    def _compute_psf_grid(self):
        from optiland_tpu.psf import FFTPSF

        psfs = []
        ny, nx = self.grid_shape
        for y in np.linspace(-1, 1, ny):
            for x in np.linspace(-1, 1, nx):
                p = FFTPSF(
                    self.optic, (x, y), self.wavelength,
                    num_rays=self.num_rays, grid_size=self.psf_grid_size,
                ).psf
                psfs.append(p / jnp.sum(p))
        return jnp.stack(psfs)

    def generate_basis(self, n_components: int = 3):
        """Returns (eigen_psfs (K,H,W), coefficient_grid (K,ny,nx),
        mean_psf (H,W))."""
        stack = self._compute_psf_grid()
        n, h, w = stack.shape
        X = stack.reshape(n, -1)
        mean_flat = jnp.mean(X, axis=0)
        U, S, Vt = jnp.linalg.svd(X - mean_flat, full_matrices=False)
        eigen = Vt[:n_components].reshape(n_components, h, w)
        coeffs = (U[:, :n_components] * S[:n_components]).T.reshape(
            n_components, self.grid_shape[0], self.grid_shape[1]
        )
        return eigen, coeffs, mean_flat.reshape(h, w)

    @staticmethod
    def resize_coefficient_map(coeff_map, target_shape):
        """Bicubic resize to the image resolution
        (reference: psf_basis_generator.py:140-174)."""
        coeff_map = jnp.asarray(coeff_map)
        if coeff_map.ndim == 2:
            return jax.image.resize(coeff_map, target_shape, method="cubic")
        return jax.image.resize(
            coeff_map, (coeff_map.shape[0], *target_shape), method="cubic"
        )


class SpatiallyVariableSimulator:
    """EigenPSF image formation: blurred = conv(img, mean) +
    sum_k conv(img * coeff_k, eigen_k) (reference: simulator.py:6-56)."""

    def simulate(self, source_image, eigen_psfs, coefficient_maps, mean_psf):
        img = jnp.asarray(source_image)
        out = _fftconvolve_same(img, jnp.asarray(mean_psf))
        for k in range(eigen_psfs.shape[0]):
            out = out + _fftconvolve_same(
                img * coefficient_maps[k], eigen_psfs[k]
            )
        return out


class DistortionWarper:
    """Polynomial warp map for geometric distortion + lateral color
    (reference: distortion_warper.py:6-146)."""

    def __init__(self, optic, source_fov=None):
        self.optic = optic
        if source_fov is None:
            fx, fy = optic.fields.x_fields, optic.fields.y_fields
            max_f = float(np.max(np.hypot(np.asarray(fx), np.asarray(fy))))
            self.source_fov = (max_f, max_f)
        else:
            self.source_fov = source_fov

    @staticmethod
    def _poly_features(x, y, degree):
        feats = []
        for d in range(degree + 1):
            for i in range(d + 1):
                j = d - i
                feats.append((x**i) * (y**j))
        return jnp.stack(feats, axis=1)

    def generate_distortion_map(self, wavelength, image_shape,
                                num_grid_points=25, degree=5):
        """(1, H, W, 2) normalized sampling grid mapping distorted image
        pixels back to source coordinates."""
        H, W = image_shape
        max_fx, max_fy = self.source_fov
        lin = jnp.linspace(-1.0, 1.0, num_grid_points)
        gx, gy = jnp.meshgrid(lin, lin)
        gx, gy = gx.ravel(), gy.ravel()
        fx = np.asarray(self.optic.fields.x_fields)
        fy = np.asarray(self.optic.fields.y_fields)
        optic_max = float(np.max(np.hypot(fx, fy)))
        hx = gx * max_fx / optic_max
        hy = gy * max_fy / optic_max
        r = self.optic.trace_generic(
            Hx=np.asarray(hx), Hy=np.asarray(hy), Px=0.0, Py=0.0,
            wavelength=wavelength,
        )
        chief = self.optic.trace_generic(
            Hx=0.0, Hy=0.0, Px=0.0, Py=0.0, wavelength=wavelength
        )
        x_real = jnp.asarray(r.x) - chief.x[0]
        y_real = jnp.asarray(r.y) - chief.y[0]
        Xf = self._poly_features(x_real, y_real, degree)
        c_gx = jnp.linalg.lstsq(Xf, gx)[0]
        c_gy = jnp.linalg.lstsq(Xf, gy)[0]
        min_x, max_x = jnp.min(x_real), jnp.max(x_real)
        min_y, max_y = jnp.min(y_real), jnp.max(y_real)
        ty = jnp.linspace(max_y, min_y, H)
        tx = jnp.linspace(min_x, max_x, W)
        grid_x, grid_y = jnp.meshgrid(tx, ty)
        Xg = self._poly_features(grid_x.ravel(), grid_y.ravel(), degree)
        target_gx = (Xg @ c_gx).reshape(H, W)
        target_gy = (Xg @ c_gy).reshape(H, W)
        return jnp.stack((target_gx, -target_gy), axis=-1)[None]

    def warp_image(self, image, distortion_grid):
        """Bilinear sampling of `image` at the normalized grid (torch
        grid_sample convention: align_corners=False, zeros padding)."""
        from jax.scipy.ndimage import map_coordinates

        image = jnp.asarray(image)
        grid = jnp.asarray(distortion_grid)[0]
        H, W = grid.shape[:2]

        def warp_one(chan):
            h_in, w_in = chan.shape
            px = (grid[..., 0] + 1.0) * w_in / 2.0 - 0.5
            py = (grid[..., 1] + 1.0) * h_in / 2.0 - 0.5
            inside = (
                (px >= -0.5) & (px <= w_in - 0.5)
                & (py >= -0.5) & (py <= h_in - 0.5)
            )
            samp = map_coordinates(
                chan, [py.ravel(), px.ravel()], order=1, mode="constant",
                cval=0.0,
            ).reshape(H, W)
            return jnp.where(inside, samp, 0.0)

        if image.ndim == 2:
            return warp_one(image)
        return jnp.stack([warp_one(image[c]) for c in range(image.shape[0])])


class ImageSimulationEngine:
    """Full pipeline: per-channel EigenPSF blur + distortion warp
    (reference: engine.py:11-220)."""

    def __init__(self, optic, source_image, config=None):
        self.optic = optic
        self.simulated_image = None
        if isinstance(source_image, str):
            import matplotlib.image as mpimg

            img = mpimg.imread(source_image)
            if img.ndim == 3 and img.shape[2] == 4:
                img = img[:, :, :3]
        else:
            img = source_image
        img = jnp.asarray(img, float)
        if img.ndim == 3 and img.shape[2] == 3:
            img = jnp.transpose(img, (2, 0, 1))
        elif img.ndim == 2:
            img = img[None]
        self.source_image = img
        self.config = {
            "wavelengths": [0.65, 0.55, 0.45],
            "psf_grid_shape": (5, 5),
            "psf_size": 128,
            "num_rays": 64,
            "n_components": 3,
            "oversample": 1,
            "padding": 64,
        }
        if config:
            self.config.update(config)

    def _preprocess(self, image):
        from scipy.ndimage import zoom

        pad = self.config["padding"]
        arr = np.pad(
            np.asarray(image), ((0, 0), (pad, pad), (pad, pad)),
            mode="reflect",
        )
        scale = self.config["oversample"]
        if scale > 1:
            arr = zoom(arr, (1, scale, scale), order=1)
        return jnp.asarray(arr), (pad, scale)

    def _postprocess(self, image, pad_info):
        from scipy.ndimage import zoom

        pad, scale = pad_info
        if scale > 1:
            image = jnp.asarray(
                zoom(np.asarray(image), (1, 1 / scale, 1 / scale), order=1)
            )
        th, tw = self.source_image.shape[-2:]
        crop = image[:, pad: pad + th, pad: pad + tw]
        return jnp.maximum(crop, 0.0)

    def run(self):
        processed, pad_info = self._preprocess(self.source_image)
        C, H, W = processed.shape
        wavelengths = self.config["wavelengths"]
        if C == 1 and len(wavelengths) == 3:
            channels = [processed[0]] * 3
        else:
            channels = [processed[c] for c in range(min(C, len(wavelengths)))]
        out = []
        for wave, chan in zip(wavelengths, channels):
            gen = PSFBasisGenerator(
                self.optic, wavelength=wave,
                grid_shape=self.config["psf_grid_shape"],
                num_rays=self.config["num_rays"],
                psf_grid_size=self.config["psf_size"],
            )
            eigen, coeffs, mean_psf = gen.generate_basis(
                n_components=self.config["n_components"]
            )
            coeffs_resized = gen.resize_coefficient_map(coeffs, (H, W))
            blurred = SpatiallyVariableSimulator().simulate(
                chan, eigen, coeffs_resized, mean_psf
            )
            warper = DistortionWarper(self.optic)
            grid = warper.generate_distortion_map(wave, (H, W))
            out.append(warper.warp_image(blurred, grid))
        result = self._postprocess(jnp.stack(out), pad_info)
        if result.ndim == 3:
            result = jnp.transpose(result, (1, 2, 0))
        self.simulated_image = result
        return result

    def view(self, force_rerun=False):
        if self.simulated_image is None or force_rerun:
            self.run()
        import matplotlib.pyplot as plt

        src = self.source_image
        if src.ndim == 3:
            src = jnp.transpose(src, (1, 2, 0))
        src_np = np.asarray(src)
        sim_np = np.asarray(self.simulated_image)
        if src_np.max() > 2.0:
            src_np = src_np / 255.0
        if sim_np.max() > 2.0:
            sim_np = sim_np / 255.0
        src_np = np.clip(np.squeeze(src_np), 0, 1)
        sim_np = np.clip(np.squeeze(sim_np), 0, 1)
        fig, ax = plt.subplots(1, 2, figsize=(10, 5))
        ax[0].imshow(src_np, cmap="gray" if src_np.ndim == 2 else None)
        ax[0].set_title("Original Image")
        ax[0].axis("off")
        ax[1].imshow(sim_np, cmap="gray" if sim_np.ndim == 2 else None)
        ax[1].set_title("Simulated Image")
        ax[1].axis("off")
        fig.tight_layout()
        return fig, ax
