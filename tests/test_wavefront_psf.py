"""Wavefront, PSF, MTF, and aberration parity tests against goldens."""

import numpy as np
import pytest

from optiland_tpu.aberrations import Aberrations
from optiland_tpu.analysis import Distortion, FieldCurvature
from optiland_tpu.mtf import FFTMTF
from optiland_tpu.psf import FFTPSF, HuygensPSF
from optiland_tpu.samples import CookeTriplet
from optiland_tpu.wavefront import Wavefront
from tests.conftest import assert_allclose


@pytest.fixture(scope="module")
def cooke():
    return CookeTriplet()


@pytest.mark.parametrize("strategy", ["chief_ray", "centroid"])
@pytest.mark.parametrize("hy", [0.0, 1.0])
def test_wavefront_parity(goldens, cooke, strategy, hy):
    g = goldens("wave_cooke")
    wf = Wavefront(cooke, num_rays=6, strategy=strategy)
    d = wf.get_data((0.0, hy), 0.55)
    tag = f"{strategy}_{hy:g}"
    assert_allclose(d.opd, g[f"wf_{tag}_opd"], rtol=1e-6, atol=1e-8)
    assert_allclose(d.pupil_x, g[f"wf_{tag}_px"], rtol=1e-7, atol=1e-9)
    assert_allclose(d.pupil_y, g[f"wf_{tag}_py"], rtol=1e-7, atol=1e-9)
    assert_allclose(
        np.ravel(d.radius), g[f"wf_{tag}_radius"], rtol=1e-7, atol=1e-9
    )


def test_fft_psf_parity(goldens, cooke):
    g = goldens("wave_cooke")
    psf = FFTPSF(cooke, (0, 0), 0.55, num_rays=32, grid_size=64)
    assert_allclose(psf.psf, g["fftpsf_onaxis"], rtol=1e-5, atol=1e-7)
    assert_allclose(psf.strehl_ratio(), float(g["fftpsf_strehl"]), rtol=1e-6)


def test_huygens_psf_parity(goldens, cooke):
    g = goldens("wave_cooke")
    h = HuygensPSF(cooke, (0.0, 0.0), 0.55, num_rays=32, image_size=32)
    assert_allclose(h.psf, g["huygens_onaxis"], rtol=1e-4, atol=1e-5)


def test_fft_mtf_parity(goldens, cooke):
    g = goldens("wave_cooke")
    mtf = FFTMTF(cooke, num_rays=32, grid_size=64)
    for k in range(3):
        assert_allclose(mtf.mtf[k][0], g[f"fftmtf_tan_{k}"], rtol=1e-4, atol=1e-6)
        assert_allclose(mtf.mtf[k][1], g[f"fftmtf_sag_{k}"], rtol=1e-4, atol=1e-6)
        assert_allclose(mtf.freq_tang[k], g[f"fftmtf_freq_{k}"], rtol=1e-6)


def test_seidel_parity(goldens, cooke):
    g = goldens("wave_cooke")
    ab = Aberrations(cooke)
    assert_allclose(ab.seidels(), g["seidels"], rtol=1e-7, atol=1e-10)


def test_third_order_parity(goldens, cooke):
    g = goldens("wave_cooke")
    names = ["TSC", "SC", "CC", "TCC", "TAC", "AC", "TPC", "PC", "DC",
             "TAchC", "LchC", "TchC"]
    to = Aberrations(cooke).third_order()
    for name, arr in zip(names, to[:12]):
        assert_allclose(
            np.ravel(np.asarray(arr)), g[f"thirdorder_{name}"],
            rtol=1e-6, atol=1e-10,
        )


def test_distortion_parity(goldens, cooke):
    g = goldens("wave_cooke")
    d = Distortion(cooke, num_points=16)
    assert_allclose(np.stack(d.data), g["distortion"], rtol=1e-6, atol=1e-8)


def test_field_curvature_parity(goldens, cooke):
    g = goldens("wave_cooke")
    fc = FieldCurvature(cooke, num_points=8)
    assert_allclose(
        np.stack([a[0] for a in fc.data]), g["field_curvature_tan"],
        rtol=1e-6, atol=1e-8,
    )
    assert_allclose(
        np.stack([a[1] for a in fc.data]), g["field_curvature_sag"],
        rtol=1e-6, atol=1e-8,
    )


def test_wavefront_differentiable(cooke):
    """jax.grad flows through the wavefront OPD to lens parameters."""
    import jax
    import jax.numpy as jnp

    from optiland_tpu.wavefront import compute_wavefront_data

    system = cooke.system
    Px = np.linspace(-0.9, 0.9, 8)
    Py = np.zeros(8)

    def rms_opd(radius1):
        s = system.replace(
            stack=system.stack.replace(
                radius=system.stack.radius.at[1].set(radius1)
            )
        )
        d = compute_wavefront_data(s, 0.0, 0.0, 0.55, Px, Py)
        return jnp.sqrt(jnp.mean(d.opd**2))

    g = jax.grad(rms_opd)(jnp.asarray(22.01359))
    fd = (rms_opd(jnp.asarray(22.01359 + 1e-5)) -
          rms_opd(jnp.asarray(22.01359 - 1e-5))) / 2e-5
    assert np.isfinite(float(g))
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-4)


def test_mmdft_psf_parity(goldens, cooke):
    """MMDFT triple-product PSF matches the reference, default and custom
    sampling (reference: psf/mmdft.py:19-308)."""
    from optiland_tpu.psf import MMDFTPSF

    g = goldens("mmdft")
    p1 = MMDFTPSF(cooke, (0, 0), 0.5876, num_rays=32)
    assert_allclose(p1.pixel_pitch, g["default_pitch"], rtol=1e-10)
    assert_allclose(p1.psf, g["default_psf"], rtol=1e-5, atol=1e-8)
    assert_allclose(p1.strehl_ratio(), g["default_strehl"], rtol=1e-6)
    p2 = MMDFTPSF(cooke, (0, 1.0), 0.5876, num_rays=32,
                  image_size=48, pixel_pitch=1.5)
    assert_allclose(p2.psf, g["custom_psf"], rtol=1e-5, atol=1e-8)


def test_mmdft_image_size_validation(cooke):
    import pytest

    from optiland_tpu.psf import MMDFTPSF

    with pytest.raises(ValueError):
        MMDFTPSF(cooke, (0, 0), 0.5876, num_rays=32, image_size=4096,
                 pixel_pitch=1.5)
