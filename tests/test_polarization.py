"""Polarization parity tests against reference goldens.

Covers polarized traces (unpolarized/H/RCP through a Fresnel-coated
doublet), exit E-fields, the Jones pupil, the vectorial FFT PSF, the
Huygens MTF, and unit behavior of the Jones element models.
(reference: optiland/rays/polarized_rays.py, analysis/jones_pupil.py,
psf/vectorial_fft.py, mtf/huygens_fresnel.py, jones.py)
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from optiland_tpu.optic import Optic
from optiland_tpu.polarization import (
    ConstantJones,
    JonesFresnel,
    JonesLinearPolarizer,
    JonesLinearRetarder,
    JonesPolarizerRCP,
    JonesQuarterWaveRetarder,
    PolarizationState,
    create_polarization,
)
from tests.conftest import assert_allclose


def pol_doublet(pol):
    o = Optic()
    o.surfaces.add(index=0, radius=np.inf, thickness=np.inf)
    o.surfaces.add(index=1, radius=50.0, thickness=5.0, material="N-BK7",
                   is_stop=True, coating="fresnel")
    o.surfaces.add(index=2, radius=-50.0, thickness=45.0, coating="fresnel")
    o.surfaces.add(index=3)
    o.set_aperture("EPD", 20.0)
    o.fields.set_type("angle")
    o.fields.add(y=0)
    o.fields.add(y=5)
    o.wavelengths.add(0.55, is_primary=True)
    if pol is not None:
        o.set_polarization(pol)
    return o


@pytest.mark.parametrize("pol", ["unpolarized", "H", "RCP"])
def test_polarized_trace_parity(goldens, pol):
    g = goldens("polarization")
    o = pol_doublet(pol)
    r = o.trace(Hy=1.0, num_rays=5)
    assert_allclose(r.y, g[f"{pol}_y"], rtol=1e-8, atol=1e-10)
    assert_allclose(r.i, g[f"{pol}_i"], rtol=1e-6, atol=1e-8)
    assert_allclose(r.p, g[f"{pol}_p"], rtol=1e-6, atol=1e-8)


@pytest.mark.parametrize("pol,nfields", [("unpolarized", 2), ("H", 1)])
def test_exit_fields_parity(goldens, pol, nfields):
    g = goldens("polarization")
    o = pol_doublet(pol)
    r = o.trace(Hy=1.0, num_rays=5)
    E = r.get_exit_fields(o.polarization_state)
    assert len(E) == nfields
    for j in range(nfields):
        assert_allclose(E[j], g[f"{pol}_E{j}"], rtol=1e-6, atol=1e-8)


def test_jones_pupil_parity(goldens):
    from optiland_tpu.analysis import JonesPupil

    g = goldens("polarization")
    jp = JonesPupil(pol_doublet("H"), field=(0, 1.0), grid_size=9)
    J = np.asarray(jp.data[0]["J"])
    ref = g["jones_J"]
    # compare only rays that survive in both (vignetted rays are NaN)
    ok = np.isfinite(J).all(axis=(1, 2)) & np.isfinite(ref).all(axis=(1, 2))
    assert ok.sum() > 20
    assert_allclose(J[ok], ref[ok], rtol=1e-6, atol=1e-8)


def test_vectorial_fft_psf_parity(goldens):
    from optiland_tpu.psf import FFTPSF, VectorialFFTPSF

    g = goldens("polarization")
    p = FFTPSF(pol_doublet("H"), (0, 0), 0.55, num_rays=32, grid_size=64)
    assert isinstance(p, VectorialFFTPSF)  # factory dispatch
    assert_allclose(p.psf, g["vfft_psf"], rtol=1e-5, atol=1e-7)
    assert_allclose(p.strehl_ratio(), g["vfft_strehl"], rtol=1e-6, atol=1e-9)


def test_huygens_mtf_parity(goldens):
    from optiland_tpu.mtf import HuygensMTF
    from optiland_tpu.samples import CookeTriplet

    g = goldens("polarization")
    hm = HuygensMTF(CookeTriplet(), fields=[(0, 0), (0, 1)],
                    wavelength=0.5876, num_rays=32, image_size=32)
    for k in range(2):
        assert_allclose(hm.mtf[k][0], g[f"hmtf_tan{k}"], rtol=1e-4, atol=1e-6)
        assert_allclose(hm.mtf[k][1], g[f"hmtf_sag{k}"], rtol=1e-4, atol=1e-6)
        assert_allclose(hm.freq_tang[k], g[f"hmtf_freq{k}"], rtol=1e-6,
                        atol=1e-9)


def test_vectorial_huygens_psf_runs():
    from optiland_tpu.psf import HuygensPSF, VectorialHuygensPSF

    h = HuygensPSF(pol_doublet("RCP"), (0.0, 0.0), 0.55, num_rays=32,
                   image_size=16)
    assert isinstance(h, VectorialHuygensPSF)
    psf = np.asarray(h.psf)
    assert psf.shape == (16, 16)
    assert np.isfinite(psf).all() and psf.max() > 0


# ---------------------------------------------------------------------------
# Jones element unit checks
# ---------------------------------------------------------------------------


def _normal_rays(n=4):
    z = jnp.zeros(n)
    return z, z, jnp.ones(n)


def test_polarization_state_validation():
    with pytest.raises(ValueError):
        PolarizationState(is_polarized=True, Ex=1.0)
    with pytest.raises(ValueError):
        PolarizationState(is_polarized=False, Ex=1.0, Ey=0, phase_x=0, phase_y=0)
    with pytest.raises(ValueError):
        create_polarization("bogus")
    s = create_polarization("L+45")
    assert_allclose(s.Ex**2 + s.Ey**2, 1.0)


def test_jones_fresnel_normal_incidence():
    from optiland_tpu.materials import IdealMaterial

    L0, M0, N0 = _normal_rays()
    jf = JonesFresnel(IdealMaterial(1.0), IdealMaterial(1.5))
    aoi = jnp.zeros(4)
    jm = jf.calculate_matrix(L0, M0, N0, L0, M0, N0, 0.55, reflect=False,
                             aoi=aoi)
    # t = 2 n1 / (n1 + n2) = 0.8 at normal incidence
    assert_allclose(jm[:, 0, 0], 0.8 + 0j, rtol=1e-12)
    assert_allclose(jm[:, 1, 1], 0.8 + 0j, rtol=1e-12)
    jr = jf.calculate_matrix(L0, M0, N0, L0, M0, -N0, 0.55, reflect=True,
                             aoi=aoi)
    # r = (n1 - n2)/(n1 + n2) = -0.2
    assert_allclose(jr[:, 0, 0], -0.2 + 0j, rtol=1e-12, atol=1e-12)
    assert_allclose(jr[:, 1, 1], -0.2 + 0j, rtol=1e-12, atol=1e-12)


def test_crossed_polarizers_extinguish():
    L0, M0, N0 = _normal_rays(1)
    ph = JonesLinearPolarizer([1, 0, 0]).calculate_matrix(
        L0, M0, N0, L0, M0, N0, 0.55
    )
    pv = JonesLinearPolarizer([0, 1, 0]).calculate_matrix(
        L0, M0, N0, L0, M0, N0, 0.55
    )
    combined = jnp.einsum("nij,njk->nik", pv, ph)
    assert_allclose(jnp.abs(combined[:, :2, :2]).max(), 0.0, atol=1e-12)


def test_quarter_wave_circularizes():
    # H light through a QWP at 45 degrees becomes circular: |Ex| = |Ey|
    L0, M0, N0 = _normal_rays(1)
    qwp = JonesQuarterWaveRetarder(theta=np.pi / 4).calculate_matrix(
        L0, M0, N0, L0, M0, N0, 0.55
    )
    E = qwp[0, :2, :2] @ jnp.array([1.0 + 0j, 0.0 + 0j])
    assert_allclose(jnp.abs(E[0]), jnp.abs(E[1]), rtol=1e-9)
    # 90 degree relative phase
    rel = jnp.angle(E[1]) - jnp.angle(E[0])
    assert_allclose(jnp.abs(jnp.sin(rel)), 1.0, rtol=1e-9)


def test_rcp_jones_is_projector():
    L0, M0, N0 = _normal_rays(1)
    j = JonesPolarizerRCP().calculate_matrix(L0, M0, N0, L0, M0, N0, 0.55)
    b = j[0, :2, :2]
    assert_allclose(b @ b, b, atol=1e-12)  # idempotent projector


def test_constant_jones_blocks():
    L0, M0, N0 = _normal_rays(2)
    j = ConstantJones(0.3, 0.0, 0.0, 0.7).calculate_matrix(
        L0, M0, N0, L0, M0, N0, 0.55
    )
    assert_allclose(j[:, 0, 0], 0.3 + 0j)
    assert_allclose(j[:, 1, 1], 0.7 + 0j)


def test_retarder_unitary():
    L0, M0, N0 = _normal_rays(1)
    j = JonesLinearRetarder(1.234, theta=0.4).calculate_matrix(
        L0, M0, N0, L0, M0, N0, 0.55
    )
    b = j[0, :2, :2]
    assert_allclose(b @ b.conj().T, jnp.eye(2, dtype=b.dtype), atol=1e-12)


def test_polarizer_coating_in_trace():
    """Crossed polarizer coatings extinguish the beam end-to-end."""
    from optiland_tpu.coatings import PolarizerCoating

    o = Optic()
    o.surfaces.add(index=0, radius=np.inf, thickness=np.inf)
    o.surfaces.add(index=1, thickness=5.0, is_stop=True,
                   coating=PolarizerCoating(axis=(1, 0, 0)))
    o.surfaces.add(index=2, thickness=5.0,
                   coating=PolarizerCoating(axis=(0, 1, 0)))
    o.surfaces.add(index=3)
    o.set_aperture("EPD", 4.0)
    o.fields.set_type("angle")
    o.fields.add(y=0)
    o.wavelengths.add(0.55, is_primary=True)
    o.set_polarization("unpolarized")
    r = o.trace(Hy=0.0, num_rays=4)
    assert float(jnp.max(jnp.abs(r.i))) < 1e-10


def test_bsdf_scatter_in_trace():
    """Lambertian BSDF perturbs directions but keeps rays normalized."""
    from optiland_tpu.scatter import LambertianBSDF

    o = Optic()
    o.surfaces.add(index=0, radius=np.inf, thickness=np.inf)
    o.surfaces.add(index=1, thickness=10.0, is_stop=True,
                   bsdf=LambertianBSDF())
    o.surfaces.add(index=2)
    o.set_aperture("EPD", 4.0)
    o.fields.set_type("angle")
    o.fields.add(y=0)
    o.wavelengths.add(0.55, is_primary=True)
    r = o.trace(Hy=0.0, num_rays=16)
    L, M, N = np.asarray(r.L), np.asarray(r.M), np.asarray(r.N)
    assert_allclose(L**2 + M**2 + N**2, np.ones_like(L), rtol=1e-9)
    assert np.std(L) > 1e-3  # actually scattered
    r2 = o.trace(Hy=0.0, num_rays=16)
    assert not np.allclose(np.asarray(r2.L), L)  # fresh PRNG key per trace


def test_vectorial_huygens_psf_parity(goldens):
    """Vectorial Huygens PSF vs the reference on the Fresnel doublet
    (reference: psf/vectorial_huygens.py:21; golden from
    tools/gen_goldens_r4.py vhuygens)."""
    from optiland_tpu.psf import VectorialHuygensPSF

    g = goldens("vhuygens")
    psf = VectorialHuygensPSF(pol_doublet("H"), (0.0, 0.0), 0.55,
                              num_rays=16, image_size=16)
    assert_allclose(np.asarray(psf.psf), g["vh_psf"], rtol=1e-4, atol=1e-7)
    assert_allclose(float(psf.strehl_ratio()), float(g["vh_strehl"]),
                    rtol=1e-4)
