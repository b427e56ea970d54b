"""Polarized Pallas kernel tests (interpreter mode on CPU).

Parity of the fused polarized trace (ray state + in-kernel Jones/p-matrix
updates, ops/pallas_pol.py) against the XLA polarized path
(core/trace.py + polarization.update_p), including gradients through the
in-kernel-VJP backward kernel, and the c64 (f32-pair) dtype path that the
TPU runs (reference semantics: optiland/rays/polarized_rays.py:47-233,
coatings.py:164-417).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optiland_tpu.core import raygen, trace as xla_trace
from optiland_tpu.optic import Optic
from optiland_tpu.ops.pallas_pol import pallas_pol_supported, trace_fast_pol
from optiland_tpu.polarization import create_polarization, polarized_intensity
from tests.conftest import assert_allclose


def pol_doublet(pol="H", coat="fresnel", coat2=None):
    o = Optic()
    o.surfaces.add(index=0, radius=np.inf, thickness=np.inf)
    kw = {"coating": coat} if coat else {}
    kw2 = {"coating": coat2 if coat2 is not None else coat} if (
        coat or coat2
    ) else {}
    o.surfaces.add(index=1, radius=50.0, thickness=5.0, material="N-BK7",
                   is_stop=True, **kw)
    o.surfaces.add(index=2, radius=-50.0, thickness=45.0, **kw2)
    o.surfaces.add(index=3)
    o.set_aperture("EPD", 20.0)
    o.fields.set_type("angle")
    o.fields.add(y=0)
    o.fields.add(y=5)
    o.wavelengths.add(0.55, is_primary=True)
    if pol:
        o.set_polarization(pol)
    return o


def pol_mirror():
    """Two-mirror reflective system (uncoated: pure basis-rotation p)."""
    o = Optic()
    o.surfaces.add(index=0, radius=np.inf, thickness=np.inf)
    o.surfaces.add(index=1, radius=-120.0, thickness=-40.0, is_stop=True,
                   material="mirror", conic=-1.0)
    o.surfaces.add(index=2, radius=-40.0, thickness=50.0, material="mirror")
    o.surfaces.add(index=3)
    o.set_aperture("EPD", 30.0)
    o.fields.set_type("angle")
    o.fields.add(y=0)
    o.wavelengths.add(0.55, is_primary=True)
    o.set_polarization("H")
    return o


def _bundle(system, n=300, wl=0.55, seed=0):
    rng = np.random.default_rng(seed)
    r = np.sqrt(rng.uniform(size=n)) * 0.95
    th = rng.uniform(0, 2 * np.pi, n)
    Px = jnp.asarray(r * np.cos(th))
    Py = jnp.asarray(r * np.sin(th))
    H = jnp.zeros(n)
    return raygen.generate_rays(system, H, H + 0.5, Px, Py, wl)


@pytest.mark.parametrize("coat", ["fresnel", None, "simple"])
def test_pol_kernel_matches_xla(coat):
    if coat == "simple":
        from optiland_tpu.coatings import SimpleCoating

        o = pol_doublet(
            coat=SimpleCoating(0.9, 0.05), coat2=SimpleCoating(0.8, 0.1)
        )
    else:
        o = pol_doublet(coat=coat)
    system = o.system
    assert pallas_pol_supported(system)
    rays = _bundle(system)
    ref, hist = xla_trace.trace(system, rays, record=False)
    out, p = trace_fast_pol(system, rays, 0.55)
    for name in ("x", "y", "z", "L", "M", "N", "i", "opd"):
        assert_allclose(
            getattr(out, name), getattr(ref, name), rtol=1e-9, atol=1e-11
        )
    assert_allclose(p, hist["p"], rtol=1e-9, atol=1e-12)


def test_pol_kernel_mirror_parity():
    o = pol_mirror()
    system = o.system
    assert pallas_pol_supported(system)
    rays = _bundle(system, n=200)
    ref, hist = xla_trace.trace(system, rays, record=False)
    out, p = trace_fast_pol(system, rays, 0.55)
    assert_allclose(out.y, ref.y, rtol=1e-9, atol=1e-11)
    assert_allclose(p, hist["p"], rtol=1e-9, atol=1e-12)


def test_pol_kernel_intensity_matches_optic_trace():
    """End-to-end polarized intensity equals the Optic-level XLA result."""
    o = pol_doublet("RCP")
    system = o.system
    state = create_polarization("RCP")
    rays = _bundle(system, n=150)
    ref, hist = xla_trace.trace(system, rays, record=False)
    i_ref = polarized_intensity(
        hist["p"], state, rays.L, rays.M, rays.N, ref.i
    )
    out, p = trace_fast_pol(system, rays, 0.55)
    i_fast = polarized_intensity(p, state, rays.L, rays.M, rays.N, out.i)
    assert_allclose(i_fast, i_ref, rtol=1e-9, atol=1e-12)


def test_fresnel_diag_matches_jones_incl_tir():
    """The in-kernel real-pair Fresnel diagonal equals JonesFresnel's
    complex matrix entries across the critical angle (TIR carries the
    evanescent phase: |r| = 1, nonzero imaginary part)."""
    from optiland_tpu.ops.pallas_pol import _fresnel_diag
    from optiland_tpu.polarization import JonesFresnel

    class _Mat:
        def __init__(self, n):
            self._n = n

        def n(self, w):
            return self._n

    n1, n2 = 1.5168, 1.0  # glass -> air: critical angle ~41.2 deg
    aoi = jnp.asarray(np.linspace(0.0, 1.4, 40))
    adot = jnp.cos(aoi)
    jones = JonesFresnel(_Mat(n1), _Mat(n2))
    zeros = jnp.zeros_like(aoi)
    for reflect in (False, True):
        ref = jones.calculate_matrix(
            zeros, zeros, zeros, zeros, zeros, zeros, 0.55,
            reflect=reflect, aoi=aoi,
        )
        (js_re, js_im), (jp_re, jp_im), (jz_re, jz_im) = _fresnel_diag(
            jnp.asarray(n1), jnp.asarray(n2), adot, reflect
        )
        assert_allclose(js_re + 1j * js_im, ref[:, 0, 0], rtol=1e-9,
                        atol=1e-12)
        assert_allclose(jp_re + 1j * jp_im, ref[:, 1, 1], rtol=1e-9,
                        atol=1e-12)
        assert_allclose(jz_re + 1j * jz_im, ref[:, 2, 2], rtol=1e-9,
                        atol=1e-12)
    # beyond critical: reflection amplitudes are unimodular with phase
    (js_re, js_im), _, _ = _fresnel_diag(
        jnp.asarray(n1), jnp.asarray(n2), adot, True
    )
    tir = np.asarray(aoi) > np.arcsin(n2 / n1)
    mags = np.hypot(np.asarray(js_re), np.asarray(js_im))[tir]
    assert np.allclose(mags, 1.0, atol=1e-9)
    assert np.abs(np.asarray(js_im)[tir]).max() > 1e-3


def test_pol_kernel_gradients_match_xla():
    # smallest coated polarized system (3 surfaces): the adjoint machinery
    # is identical per surface and the interpret-mode in-kernel-VJP
    # compile scales with surface count (~300 s for the doublet)
    o = Optic()
    o.surfaces.add(index=0, radius=np.inf, thickness=np.inf)
    o.surfaces.add(index=1, radius=50.0, thickness=45.0, material="N-BK7",
                   is_stop=True, coating="fresnel")
    o.surfaces.add(index=2)
    o.set_aperture("EPD", 20.0)
    o.fields.set_type("angle")
    o.fields.add(y=0)
    o.wavelengths.add(0.55, is_primary=True)
    o.set_polarization("H")
    system = o.system
    state = create_polarization("H")
    rays = _bundle(system, n=150)

    def merit_pol(stack, fast):
        sys2 = system.replace(stack=stack)
        if fast:
            out, p = trace_fast_pol(sys2, rays, 0.55)
        else:
            out, hist = xla_trace.trace(sys2, rays, record=False)
            p = hist["p"]
        ip = polarized_intensity(p, state, rays.L, rays.M, rays.N, out.i)
        return jnp.mean(out.y**2 * ip) + jnp.mean(jnp.abs(p) ** 2)

    gp = jax.grad(lambda s: merit_pol(s, True))(system.stack)
    gx = jax.grad(lambda s: merit_pol(s, False))(system.stack)
    assert_allclose(gp.radius, gx.radius, rtol=1e-6, atol=1e-12)
    assert_allclose(gp.thickness, gx.thickness, rtol=1e-6, atol=1e-12)


def test_pol_c64_path_close_to_f64():
    """f32/c64 rays (the TPU configuration) stay within f32 tolerance of
    the f64/c128 reference on the same system."""
    o = pol_doublet("H")
    system = o.system
    rays = _bundle(system, n=100)
    ref, hist = xla_trace.trace(system, rays, record=False)
    rays32 = jax.tree.map(
        lambda a: a.astype(jnp.float32) if a.dtype == jnp.float64 else a,
        rays,
    )
    out32, hist32 = xla_trace.trace(system, rays32, record=False)
    assert hist32["p"].dtype == jnp.complex64
    assert_allclose(hist32["p"], hist["p"], rtol=1e-3, atol=1e-4)
    assert_allclose(out32.y, ref.y, rtol=1e-3, atol=1e-3)


def test_pol_unsupported_falls_back():
    """Coating kinds outside the in-kernel dispatch (here: an absorbing
    thin-film stack) keep the XLA path."""
    from optiland_tpu.coatings import ThinFilmCoating
    from optiland_tpu.thin_film import ThinFilmStack
    from optiland_tpu.materials import IdealMaterial

    stack = ThinFilmStack(IdealMaterial(1.0), IdealMaterial(1.52))
    stack.add_layer(IdealMaterial(2.35, 0.2), 100.0)  # absorbing layer
    o = pol_doublet(coat=ThinFilmCoating(stack))
    assert not pallas_pol_supported(o.system)


@pytest.mark.parametrize("kind", ["polarizer", "retarder"])
def test_pol_kernel_axis_coatings_match_xla(kind):
    """Polarizer/retarder coatings run in-kernel with full s/p 2x2 Jones
    (reference: coatings.py:418-487, jones.py:120,331)."""
    from optiland_tpu.coatings import PolarizerCoating, RetarderCoating

    if kind == "polarizer":
        c1 = PolarizerCoating(axis=(1, 0.3, 0))
        c2 = PolarizerCoating(axis=(0.2, 1, 0))
    else:
        c1 = RetarderCoating(np.pi / 2, axis=(1, 0.3, 0))
        c2 = RetarderCoating(np.pi / 3, axis=(0.2, 1, 0))
    o = pol_doublet(coat=c1, coat2=c2)
    system = o.system
    assert pallas_pol_supported(system)
    rays = _bundle(system)
    ref, hist = xla_trace.trace(system, rays, record=False)
    out, p = trace_fast_pol(system, rays, 0.55)
    for name in ("x", "y", "z", "L", "M", "N", "i", "opd"):
        assert_allclose(
            getattr(out, name), getattr(ref, name), rtol=1e-9, atol=1e-11
        )
    assert_allclose(p, hist["p"], rtol=1e-9, atol=1e-12)


@pytest.mark.slow
@pytest.mark.parametrize("kind", ["polarizer", "retarder"])
def test_pol_axis_coating_intensity_and_grad(kind):
    """Exit intensity + radius gradient parity through the in-kernel VJP
    for the axis-based coatings. Single coated surface: the interpret-mode
    adjoint compile scales hard with chain length (the doublet retarder
    variant measured 451 s)."""
    from optiland_tpu.coatings import PolarizerCoating, RetarderCoating
    from optiland_tpu.ops.pallas_pol import trace_fast_pol_intensity

    c = (PolarizerCoating(axis=(1, 0.4, 0)) if kind == "polarizer"
         else RetarderCoating(np.pi / 2, axis=(1, 0.4, 0)))
    o = pol_doublet(coat=c, coat2=None)
    o.surfaces.surfaces[2].coating = None  # one coated surface only
    o._invalidate()
    system = o.system
    state = create_polarization("H")
    rays = _bundle(system, n=100)

    def merit_pallas(stack):
        s2 = system.replace(stack=stack)
        out = trace_fast_pol_intensity(s2, rays, 0.55, state=state)
        return jnp.sum(out.i * out.x**2)

    def merit_xla(stack):
        # the Optic-level polarized contract computes the exit intensity
        # from the LAUNCH intensity (optic/optic.py _trace_jit), matching
        # the kernel's in-tile _exit_intensity_tile
        s2 = system.replace(stack=stack)
        ref, hist = xla_trace.trace(s2, rays, record=False)
        i_pol = polarized_intensity(
            hist["p"], state, rays.L, rays.M, rays.N, rays.i
        )
        return jnp.sum(i_pol * ref.x**2)

    v1, g1 = jax.value_and_grad(merit_pallas)(system.stack)
    v2, g2 = jax.value_and_grad(merit_xla)(system.stack)
    assert_allclose(v1, v2, rtol=1e-9, atol=1e-12)
    assert_allclose(
        np.asarray(g1.radius)[1:-1], np.asarray(g2.radius)[1:-1],
        rtol=1e-6, atol=1e-10,
    )


def _tmm_coated(n_layers=2, substrate=1.52):
    from optiland_tpu.coatings import ThinFilmCoating
    from optiland_tpu.materials import IdealMaterial
    from optiland_tpu.thin_film import ThinFilmStack

    st = ThinFilmStack(IdealMaterial(1.0), IdealMaterial(substrate),
                       reference_wl_um=0.55)
    st.add_layer_qwot(IdealMaterial(1.38))
    if n_layers > 1:
        st.add_layer(IdealMaterial(2.35), 0.08)
    return ThinFilmCoating(st)


def test_pol_tmm_coating_matches_xla():
    """ThinFilmCoating runs in-kernel via real-index TMM (reference:
    coatings.py:488-560, thin_film/core.py:84-149)."""
    o = pol_doublet(coat=_tmm_coated(), coat2=None)
    o.surfaces.surfaces[2].coating = None
    o._invalidate()
    system = o.system
    from optiland_tpu.ops.pallas_pol import _coat_kinds

    assert _coat_kinds(system)[1] == ("tmm", 2)
    assert pallas_pol_supported(system)
    rays = _bundle(system, n=200)
    ref, hist = xla_trace.trace(system, rays, record=False)
    out, p = trace_fast_pol(system, rays, 0.55)
    for name in ("x", "y", "z", "L", "M", "N", "i", "opd"):
        assert_allclose(
            getattr(out, name), getattr(ref, name), rtol=1e-9, atol=1e-11
        )
    assert_allclose(p, hist["p"], rtol=1e-9, atol=1e-12)


def test_pol_tmm_absorbing_stack_falls_back():
    """Stacks with absorbing layers keep the XLA path (the in-kernel TMM
    is the real-index reduction)."""
    from optiland_tpu.coatings import ThinFilmCoating
    from optiland_tpu.materials import IdealMaterial
    from optiland_tpu.thin_film import ThinFilmStack

    st = ThinFilmStack(IdealMaterial(1.0), IdealMaterial(1.52))
    st.add_layer(IdealMaterial(2.0, 0.5), 0.05)  # k != 0
    o = pol_doublet(coat=ThinFilmCoating(st))
    assert not pallas_pol_supported(o.system)


def test_pol_tmm_low_index_layer_falls_back():
    """A layer below the incident index can go evanescent at real
    incidence -> XLA fallback."""
    from optiland_tpu.coatings import ThinFilmCoating
    from optiland_tpu.materials import IdealMaterial
    from optiland_tpu.thin_film import ThinFilmStack

    st = ThinFilmStack(IdealMaterial(1.5), IdealMaterial(1.52))
    st.add_layer(IdealMaterial(1.2), 0.1)  # below incident 1.5
    o = pol_doublet(coat=ThinFilmCoating(st))
    assert not pallas_pol_supported(o.system)


def test_tmm_eligibility_survives_jit_tracing():
    """Regression (round 5): under an outer jit trace, material n/k of a
    constant ThinFilm stack must still evaluate concretely
    (ensure_compile_time_eval) — without it the stack silently degraded
    to an 'unsupported' kind exactly when called from a jitted merit,
    dropping the coating from the kernel."""
    import jax

    from optiland_tpu.coatings import ThinFilmCoating
    from optiland_tpu.materials import IdealMaterial
    from optiland_tpu.ops.pallas_pol import _coat_kinds
    from optiland_tpu.optic import Optic
    from optiland_tpu.thin_film import ThinFilmStack

    st = ThinFilmStack(IdealMaterial(1.0), IdealMaterial(1.52),
                       reference_wl_um=0.55)
    st.add_layer_qwot(IdealMaterial(1.38))
    st.add_layer(IdealMaterial(2.35), 0.08)
    o = Optic()
    o.surfaces.add(index=0, radius=np.inf, thickness=np.inf)
    o.surfaces.add(index=1, radius=50.0, thickness=5.0, material="N-BK7",
                   is_stop=True, coating=ThinFilmCoating(st))
    o.surfaces.add(index=2)
    o.set_aperture("EPD", 10.0)
    o.fields.set_type("angle")
    o.fields.add(y=0)
    o.wavelengths.add(0.55, is_primary=True)
    o.set_polarization("H")
    system = o.system

    seen = {}

    def probe(stack):
        seen["kinds"] = _coat_kinds(system.replace(stack=stack), 0.55)
        return stack.radius.sum()

    jax.jit(probe)(system.stack)
    assert seen["kinds"][1] == ("tmm", 2)
