"""Deep Jones-element and thin-film-stack parity vs reference goldens
(reference: optiland/jones.py + thin_film/stack.py; goldens from
tools/gen_goldens_r3.py jones/thinfilm)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from optiland_tpu import polarization as pol
from optiland_tpu.materials import IdealMaterial
from optiland_tpu.thin_film import ThinFilmStack
from tests.conftest import assert_allclose

TH30 = np.radians(30)
JONES_CASES = {
    "pol_0": lambda: pol.JonesLinearPolarizer([1.0, 0.0, 0.0]),
    "pol_30": lambda: pol.JonesLinearPolarizer(
        [np.cos(TH30), np.sin(TH30), 0.0]
    ),
    "diatt": lambda: pol.JonesLinearDiattenuator(
        t_min=0.3, t_max=0.9, theta=np.radians(20)
    ),
    "qwp_45": lambda: pol.JonesQuarterWaveRetarder(theta=np.radians(45)),
    "hwp_22": lambda: pol.JonesHalfWaveRetarder(theta=np.radians(22.5)),
    "ret_60": lambda: pol.JonesLinearRetarder(
        retardance=np.radians(60), theta=np.radians(10)
    ),
}


@pytest.mark.parametrize("tag", list(JONES_CASES))
def test_jones_matrix_parity(goldens, tag):
    g = goldens("jones_deep")
    if tag not in g:
        pytest.skip("missing golden")
    n = 3
    z = jnp.zeros(n)
    o = jnp.ones(n)
    m = JONES_CASES[tag]().calculate_matrix(
        z, z, o, z, z, o, jnp.full(n, 0.55)
    )
    ours = np.asarray(m)[0]
    ref = np.asarray(g[tag])
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-8, atol=1e-10)


def _stacks():
    air = IdealMaterial(1.0)
    glass = IdealMaterial(1.52)
    hi = IdealMaterial(2.35)
    lo = IdealMaterial(1.38)
    metal = IdealMaterial(2.0, 0.5)
    hr8 = ThinFilmStack(incident_material=air, substrate_material=glass)
    for i in range(8):
        m = hi if i % 2 == 0 else lo
        hr8.add_layer(m, 0.55 / (4 * float(np.ravel(np.asarray(m.n(0.55)))[0])))
    single = ThinFilmStack(incident_material=air, substrate_material=glass)
    single.add_layer(hi, 0.55 / (4 * 2.35))
    metal1 = ThinFilmStack(incident_material=air, substrate_material=glass)
    metal1.add_layer(metal, 0.04)
    return {"hr8": hr8, "single_hi": single, "metal1": metal1}


@pytest.mark.parametrize("tag", ["hr8", "single_hi", "metal1"])
@pytest.mark.parametrize("ang", [0, 30, 60])
@pytest.mark.parametrize("polz", ["s", "p"])
def test_thin_film_spectra_parity(goldens, tag, ang, polz):
    g = goldens("thinfilm_deep")
    key = f"{tag}_R_{polz}_{ang}"
    if key not in g:
        pytest.skip("missing golden")
    st = _stacks()[tag]
    wls = np.asarray(g["wls"])
    aoi = np.deg2rad(ang)
    R = np.array([float(np.ravel(np.asarray(
        st.reflectance(w, aoi, polz)))[0]) for w in wls])
    T = np.array([float(np.ravel(np.asarray(
        st.transmittance(w, aoi, polz)))[0]) for w in wls])
    A = np.array([float(np.ravel(np.asarray(
        st.absorptance(w, aoi, polz)))[0]) for w in wls])
    assert_allclose(R, g[key], rtol=1e-7, atol=1e-9)
    assert_allclose(T, g[f"{tag}_T_{polz}_{ang}"], rtol=1e-7, atol=1e-9)
    assert_allclose(A, g[f"{tag}_A_{polz}_{ang}"], rtol=1e-7, atol=1e-8)
