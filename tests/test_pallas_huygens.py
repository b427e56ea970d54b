"""Pallas Huygens-Fresnel kernel parity tests (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optiland_tpu.ops.pallas_huygens import huygens_field_pallas
from optiland_tpu.psf.huygens_fresnel import huygens_field
from tests.conftest import assert_allclose


def _case(P=700, Q=300, seed=0):
    rng = np.random.default_rng(seed)
    image = [
        jnp.asarray(rng.uniform(-0.01, 0.01, P)),
        jnp.asarray(rng.uniform(-0.01, 0.01, P)),
        jnp.asarray(np.zeros(P)),
    ]
    th = rng.uniform(0, 2 * np.pi, Q)
    r = np.sqrt(rng.uniform(size=Q)) * 5.0
    Rp = 50.0
    px = r * np.cos(th)
    py = r * np.sin(th)
    pz = -np.sqrt(Rp**2 - px**2 - py**2)
    pupil = [jnp.asarray(px), jnp.asarray(py), jnp.asarray(pz)]
    amp = jnp.asarray(rng.uniform(0.5, 1.0, Q))
    opd = jnp.asarray(rng.normal(0.0, 1e-4, Q))
    return image, pupil, amp, opd, 0.55e-3, Rp


def test_pallas_huygens_matches_jnp():
    image, pupil, amp, opd, wl, Rp = _case()
    ref = huygens_field(*image, *pupil, amp, opd, wl, Rp)
    fast = huygens_field_pallas(*image, *pupil, amp, opd, wl, Rp)
    # kernel runs f32-friendly math; compare at f32-level tolerance
    assert_allclose(np.abs(fast) ** 2, np.abs(ref) ** 2, rtol=5e-5, atol=1e-7)


def test_pallas_huygens_odd_sizes():
    """Non-multiple-of-tile sizes exercise both padding paths."""
    image, pupil, amp, opd, wl, Rp = _case(P=257, Q=129)
    ref = huygens_field(*image, *pupil, amp, opd, wl, Rp)
    fast = huygens_field_pallas(*image, *pupil, amp, opd, wl, Rp)
    assert_allclose(np.abs(fast) ** 2, np.abs(ref) ** 2, rtol=5e-5, atol=1e-7)


def test_pallas_huygens_gradient_matches_jnp():
    """In-kernel adjoint must equal grad of the jnp path."""
    image, pupil, amp, opd, wl, Rp = _case(P=64, Q=96)

    def loss_fast(opd):
        f = huygens_field_pallas(*image, *pupil, amp, opd, wl, Rp)
        return jnp.sum(jnp.abs(f) ** 2)

    def loss_ref(opd):
        f = huygens_field(*image, *pupil, amp, opd, wl, Rp)
        return jnp.sum(jnp.abs(f) ** 2)

    g_fast = jax.grad(loss_fast)(opd)
    g_ref = jax.grad(loss_ref)(opd)
    assert_allclose(g_fast, g_ref, rtol=1e-6, atol=1e-9)


def test_pallas_huygens_full_vjp_matches_jnp():
    """Gradients w.r.t. every input (image coords, pupil coords, amplitude,
    OPD) from the in-kernel adjoint equal the jnp VJP, including the
    odd-size padding paths."""
    image, pupil, amp, opd, wl, Rp = _case(P=85, Q=137, seed=3)

    def loss(fn, args):
        ix, iy, iz, px, py, pz, a, o = args
        f = fn(ix, iy, iz, px, py, pz, a, o, wl, Rp)
        return jnp.sum(jnp.abs(f) ** 2) + jnp.sum(jnp.imag(f))

    args = (*image, *pupil, amp, opd)
    g_fast = jax.grad(
        lambda *a: loss(huygens_field_pallas, a), argnums=tuple(range(8))
    )(*args)
    g_ref = jax.grad(
        lambda *a: loss(huygens_field, a), argnums=tuple(range(8))
    )(*args)
    names = ("ix", "iy", "iz", "px", "py", "pz", "amp", "opd")
    for name, gf, gr in zip(names, g_fast, g_ref):
        scale = max(1.0, float(jnp.abs(gr).max()))
        assert_allclose(gf / scale, gr / scale, rtol=1e-6, atol=1e-9)


def test_huygens_psf_class_unchanged_on_cpu():
    """CPU path still routes through jnp/native (no Pallas interpret cost)."""
    from optiland_tpu.psf import HuygensPSF
    from optiland_tpu.samples import CookeTriplet

    psf = HuygensPSF(CookeTriplet(), field=(0, 0), wavelength=0.55,
                     image_size=32, num_rays=32)
    val = float(psf.strehl_ratio())
    assert 0.0 < val <= 1.2
