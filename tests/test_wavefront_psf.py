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


def test_native_huygens_kernel_parity():
    """The C++/OpenMP Huygens kernel matches the jnp path to 1e-9 and the
    traced (grad) path still uses jnp (native/huygens.cpp)."""
    import os

    from optiland_tpu import _native

    if not _native.available():
        import pytest

        pytest.skip("native kernel unavailable (no compiler)")
    from optiland_tpu.psf import HuygensPSF
    from optiland_tpu.samples import CookeTriplet

    lens = CookeTriplet()
    h_nat = HuygensPSF(lens, (0, 0.5), 0.55, num_rays=32, image_size=24)
    os.environ["OPTILAND_TPU_NATIVE"] = "0"
    try:
        h_jnp = HuygensPSF(lens, (0, 0.5), 0.55, num_rays=32, image_size=24)
    finally:
        os.environ["OPTILAND_TPU_NATIVE"] = "1"
    assert_allclose(h_nat.psf, h_jnp.psf, rtol=1e-7, atol=1e-9)


def test_native_kernel_direct():
    import numpy as np

    from optiland_tpu import _native

    if not _native.available():
        import pytest

        pytest.skip("native kernel unavailable")
    rng = np.random.default_rng(1)
    n_img, n_pup = 64, 100
    ix, iy = rng.uniform(-0.1, 0.1, (2, n_img))
    iz = np.full(n_img, 50.0)
    px, py = rng.uniform(-5, 5, (2, n_pup))
    pz = rng.uniform(40, 41, n_pup)
    amp = rng.uniform(0, 1, n_pup)
    opd = rng.uniform(0, 1e-3, n_pup)
    f = _native.huygens_field_native(ix, iy, iz, px, py, pz, amp, opd,
                                     0.55e-3, 50.0)
    p = _native.huygens_psf_native(ix, iy, iz, px, py, pz, amp, opd,
                                   0.55e-3, 50.0)
    assert_allclose(np.abs(f) ** 2, p, rtol=1e-10)
    # reference jnp formulation
    import jax.numpy as jnp

    from optiland_tpu.psf.huygens_fresnel import huygens_field

    f2 = huygens_field(
        jnp.asarray(ix), jnp.asarray(iy), jnp.asarray(iz), jnp.asarray(px),
        jnp.asarray(py), jnp.asarray(pz), jnp.asarray(amp), jnp.asarray(opd),
        0.55e-3, 50.0,
    )
    assert_allclose(f, np.asarray(f2), rtol=1e-9, atol=1e-12)
