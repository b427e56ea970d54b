"""Round-4 physics property battery: closed-form laws that must hold
regardless of implementation — thin-film energy conservation and special
angles, Fresnel limits, paraxial invariants across samples, and
coordinate-transform round trips.

(reference behaviors: thin_film/core.py TMM, jones.py Fresnel,
paraxial.py invariants)
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from optiland_tpu.materials import IdealMaterial
from optiland_tpu.thin_film import ThinFilmStack

# ---------------------------------------------------------------------------
# Thin-film TMM laws
# ---------------------------------------------------------------------------


def _stack(layers=((1.38, 0.0996),), n0=1.0, ns=1.52):
    st = ThinFilmStack(IdealMaterial(n0), IdealMaterial(ns))
    for n, d in layers:
        st.add_layer(IdealMaterial(n), d)
    return st


ANGLES = (0.0, 0.3, 0.6, 1.0)
POLS = ("s", "p")


@pytest.mark.parametrize("aoi", ANGLES)
@pytest.mark.parametrize("pol", POLS)
def test_tmm_energy_conservation_dielectric(aoi, pol):
    """R + T = 1 exactly for absorption-free stacks at any angle/pol."""
    st = _stack(layers=((1.38, 0.0996), (2.35, 0.06), (1.7, 0.11)))
    for wl in (0.45, 0.55, 0.65):
        R = float(np.ravel(st.reflectance(wl, aoi, pol))[0])
        T = float(np.ravel(st.transmittance(wl, aoi, pol))[0])
        assert R + T == pytest.approx(1.0, abs=1e-10)
        assert 0.0 <= R <= 1.0


@pytest.mark.parametrize("pol", POLS)
def test_tmm_absorbing_layer_absorbs(pol):
    st = _stack(layers=((2.0 + 0, 0.05),))
    st.layers[0].material = IdealMaterial(2.0, 0.5)
    R, T, A = (float(np.ravel(v)[0]) for v in st.RTA(0.55, 0.2, pol))
    assert A > 0.01
    assert R + T + A == pytest.approx(1.0, abs=1e-10)


def test_tmm_halfwave_layer_is_absentee():
    """A half-wave layer at its design wavelength leaves the interface
    reflectance unchanged (the classic absentee-layer law)."""
    bare = _stack(layers=())
    half = _stack(layers=((2.0, 0.55 / (2 * 2.0)),))  # d = lambda/(2n)
    R0 = float(np.ravel(bare.reflectance(0.55, 0.0, "s"))[0])
    Rh = float(np.ravel(half.reflectance(0.55, 0.0, "s"))[0])
    assert Rh == pytest.approx(R0, abs=1e-10)


def test_tmm_ideal_qwot_ar_zero_reflectance():
    """A quarter-wave layer with n = sqrt(n0 ns) nulls the reflection at
    the design wavelength."""
    n_ideal = np.sqrt(1.0 * 1.52)
    st = _stack(layers=((n_ideal, 0.55 / (4 * n_ideal)),))
    R = float(np.ravel(st.reflectance(0.55, 0.0, "u"))[0])
    assert R < 1e-12


def test_tmm_brewster_angle_p_zero():
    """Bare interface: R_p = 0 at Brewster's angle."""
    bare = _stack(layers=())
    thB = float(np.arctan(1.52 / 1.0))
    Rp = float(np.ravel(bare.reflectance(0.55, thB, "p"))[0])
    assert Rp < 1e-12
    Rs = float(np.ravel(bare.reflectance(0.55, thB, "s"))[0])
    assert Rs > 0.05


def test_tmm_normal_incidence_pols_agree():
    st = _stack(layers=((1.38, 0.0996), (2.35, 0.06)))
    for wl in (0.45, 0.6):
        Rs = float(np.ravel(st.reflectance(wl, 0.0, "s"))[0])
        Rp = float(np.ravel(st.reflectance(wl, 0.0, "p"))[0])
        assert Rs == pytest.approx(Rp, abs=1e-12)


@pytest.mark.parametrize("pol", POLS)
def test_tmm_layer_split_invariance(pol):
    """Splitting one layer into two of the same material is a no-op."""
    one = _stack(layers=((1.9, 0.12),))
    two = _stack(layers=((1.9, 0.05), (1.9, 0.07)))
    for wl in (0.5, 0.62):
        R1 = float(np.ravel(one.reflectance(wl, 0.4, pol))[0])
        R2 = float(np.ravel(two.reflectance(wl, 0.4, pol))[0])
        assert R1 == pytest.approx(R2, abs=1e-12)


# ---------------------------------------------------------------------------
# Paraxial invariants across the sample library
# ---------------------------------------------------------------------------

SAMPLE_NAMES = (
    "CookeTriplet", "DoubleGauss", "TessarLens", "TelescopeDoublet",
    "AsphericSinglet", "ReverseTelephoto",
)


def _sample(name):
    import optiland_tpu.samples as samples

    return getattr(samples, name)()


@pytest.mark.parametrize("name", SAMPLE_NAMES)
def test_lagrange_invariant_preserved(name):
    """H = n (u y_c - u_c y) is constant across every space."""
    from optiland_tpu.core.system import n_all

    lens = _sample(name)
    ym, um = lens.paraxial.marginal_ray()
    yc, uc = lens.paraxial.chief_ray()
    ym, um = np.ravel(np.asarray(ym)), np.ravel(np.asarray(um))
    yc, uc = np.ravel(np.asarray(yc)), np.ravel(np.asarray(uc))
    system = lens.system
    n_arr = np.ravel(np.asarray(
        n_all(system.stack, system.cfg, lens.primary_wavelength)
    ))
    k = min(len(ym), len(um), len(yc), len(uc), len(n_arr))
    H = n_arr[:k] * (um[:k] * yc[:k] - uc[:k] * ym[:k])
    if lens.fields.max_field > 0:
        assert abs(H[0]) > 0
        np.testing.assert_allclose(H, H[0], rtol=1e-9)
    else:  # on-axis-only system: H is identically zero
        np.testing.assert_allclose(H, 0.0, atol=1e-12)


@pytest.mark.parametrize("name", SAMPLE_NAMES)
def test_focal_points_consistent(name):
    """F2 = P2 + f2 and F1 = P1 + f1 (cardinal-point identities)."""
    p = _sample(name).paraxial
    assert float(p.F2()) == pytest.approx(
        float(p.P2()) + float(p.f2()), rel=1e-9
    )
    assert float(p.F1()) == pytest.approx(
        float(p.P1()) + float(p.f1()), rel=1e-9
    )


@pytest.mark.parametrize("name", SAMPLE_NAMES)
def test_fno_matches_definition(name):
    p = _sample(name).paraxial
    assert float(p.FNO()) == pytest.approx(
        abs(float(p.f2())) / float(p.EPD()), rel=1e-9
    )


# ---------------------------------------------------------------------------
# Coordinate transforms
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("angles", [
    (0.1, 0.0, 0.0), (0.0, 0.2, 0.0), (0.0, 0.0, 0.3),
    (0.1, -0.2, 0.3),
])
def test_rotation_roundtrip(angles):
    """localize then globalize restores positions and directions."""
    from optiland_tpu.ops import kernels

    rx, ry, rz = angles
    rng = np.random.default_rng(0)
    x, y, z = (jnp.asarray(rng.normal(size=16)) for _ in range(3))
    L = jnp.asarray(rng.normal(size=16))
    M = jnp.asarray(rng.normal(size=16))
    N = jnp.asarray(rng.normal(size=16))
    # localize order (core/trace.py _surface_step)
    x1, y1, L1, M1 = kernels.rotate_z(x, y, L, M, -rz)
    x1, z1, L1, N1 = kernels.rotate_y(x1, z, L1, N, -ry)
    y1, z1, M1, N1 = kernels.rotate_x(y1, z1, M1, N1, -rx)
    # globalize
    y2, z2, M2, N2 = kernels.rotate_x(y1, z1, M1, N1, rx)
    x2, z2, L2, N2 = kernels.rotate_y(x1, z2, L1, N2, ry)
    x2, y2, L2, M2 = kernels.rotate_z(x2, y2, L2, M2, rz)
    for a, b in ((x, x2), (y, y2), (z, z2), (L, L2), (M, M2), (N, N2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-12)


def test_rotation_preserves_norm():
    from optiland_tpu.ops import kernels

    rng = np.random.default_rng(1)
    v = rng.normal(size=(3, 32))
    v /= np.linalg.norm(v, axis=0)
    L, M, N = (jnp.asarray(c) for c in v)
    x = y = z = jnp.zeros(32)
    _, _, L1, M1 = kernels.rotate_z(x, y, L, M, 0.7)
    _, _, L2, N2 = kernels.rotate_y(x, z, L1, N, -0.4)
    _, _, M3, N3 = kernels.rotate_x(y, z, M1, N2, 0.2)
    norm = np.asarray(L2) ** 2 + np.asarray(M3) ** 2 + np.asarray(N3) ** 2
    np.testing.assert_allclose(norm, 1.0, atol=1e-12)
