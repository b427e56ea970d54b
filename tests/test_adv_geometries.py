"""Parity tests for gratings, Forbes Qbfs/Q2d, and grid-sag surfaces
(reference: optiland/geometries/{plane,standard}_grating.py, forbes/,
grid_sag.py, interactions/diffractive_model.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optiland_tpu.optic import Optic
from tests.conftest import assert_allclose


def common(o):
    o.set_aperture("EPD", 10.0)
    o.fields.set_type("angle")
    o.fields.add(y=0)
    o.fields.add(y=3)
    o.wavelengths.add(0.55, is_primary=True)


def plane_grating_lens():
    o = Optic()
    o.surfaces.add(index=0, radius=np.inf, thickness=np.inf)
    o.surfaces.add(index=1, radius=30.0, thickness=5.0, material="N-BK7",
                   is_stop=True)
    o.surfaces.add(index=2, radius=-30.0, thickness=5.0)
    o.surfaces.add(index=3, surface_type="grating", thickness=20.0,
                   grating_order=1, grating_period=10.0,
                   groove_orientation_angle=0.3)
    o.surfaces.add(index=4)
    common(o)
    return o


def curved_grating_lens():
    o = Optic()
    o.surfaces.add(index=0, radius=np.inf, thickness=np.inf)
    o.surfaces.add(index=1, surface_type="grating", radius=100.0, conic=-0.5,
                   thickness=10.0, material="N-BK7", is_stop=True,
                   grating_order=-1, grating_period=25.0,
                   groove_orientation_angle=0.1)
    o.surfaces.add(index=2, radius=np.inf, thickness=30.0)
    o.surfaces.add(index=3)
    common(o)
    return o


def refl_grating_lens():
    o = Optic()
    o.surfaces.add(index=0, radius=np.inf, thickness=np.inf)
    o.surfaces.add(index=1, surface_type="grating", radius=np.inf,
                   thickness=-30.0, material="mirror", is_stop=True,
                   grating_order=1, grating_period=5.0,
                   groove_orientation_angle=0.0)
    o.surfaces.add(index=2)
    common(o)
    return o


def qbfs_lens():
    o = Optic()
    o.surfaces.add(index=0, radius=np.inf, thickness=np.inf)
    o.surfaces.add(index=1, surface_type="forbes_qbfs", radius=40.0,
                   conic=-0.8, thickness=6.0, material="N-BK7", is_stop=True,
                   radial_terms={0: 1e-4, 1: -2e-5, 2: 3e-6, 4: 1e-7},
                   norm_radius=12.0)
    o.surfaces.add(index=2, radius=-60.0, thickness=30.0)
    o.surfaces.add(index=3)
    common(o)
    return o


def q2d_lens():
    o = Optic()
    o.surfaces.add(index=0, radius=np.inf, thickness=np.inf)
    o.surfaces.add(index=1, surface_type="forbes_q2d", radius=40.0, conic=0.0,
                   thickness=6.0, material="N-BK7", is_stop=True,
                   freeform_coeffs={("a", 0, 0): 5e-5, ("a", 0, 1): -1e-5,
                                    ("a", 2, 0): 2e-5, ("b", 2, 0): -1e-5,
                                    ("a", 1, 1): 4e-6, ("b", 3, 1): 2e-6},
                   norm_radius=12.0)
    o.surfaces.add(index=2, radius=-60.0, thickness=30.0)
    o.surfaces.add(index=3)
    common(o)
    return o


def grid_lens():
    xs = np.linspace(-8.1, 8.1, 34)
    ys = np.linspace(-8.1, 8.1, 34)
    X, Y = np.meshgrid(xs, ys)
    sag = 1e-3 * (X**2 + 0.5 * Y**2)
    o = Optic()
    o.surfaces.add(index=0, radius=np.inf, thickness=np.inf)
    o.surfaces.add(index=1, surface_type="grid_sag", thickness=6.0,
                   material="N-BK7", is_stop=True, x_coordinates=list(xs),
                   y_coordinates=list(ys), sag_values=sag.tolist())
    o.surfaces.add(index=2, radius=-60.0, thickness=30.0)
    o.surfaces.add(index=3)
    common(o)
    return o


BUILDERS = {
    "plane_grating": plane_grating_lens,
    "curved_grating": curved_grating_lens,
    "refl_grating": refl_grating_lens,
    "qbfs": qbfs_lens,
    "q2d": q2d_lens,
    "grid": grid_lens,
}


@pytest.mark.parametrize("tag", sorted(BUILDERS))
def test_trace_parity(goldens, tag):
    g = goldens("adv_geom")
    o = BUILDERS[tag]()
    rays = o.trace(Hy=1.0, num_rays=5)
    tol = dict(rtol=1e-6, atol=1e-8) if tag == "grid" else dict(
        rtol=1e-7, atol=1e-9)
    for c in ("x", "y", "L", "M", "N", "i"):
        assert_allclose(getattr(rays, c), g[f"{tag}_{c}"], **tol)


def test_grating_paraxial_parity(goldens):
    g = goldens("adv_geom")
    o = curved_grating_lens()
    assert_allclose(o.paraxial.f2(), g["curved_grating_f2"], rtol=1e-9)


def test_grating_evanescent_order_masked():
    """A too-fine grating pushes order 1 evanescent: intensity drops to 0."""
    o = Optic()
    o.surfaces.add(index=0, radius=np.inf, thickness=np.inf)
    o.surfaces.add(index=1, surface_type="grating", thickness=10.0,
                   is_stop=True, grating_order=1, grating_period=0.4,
                   groove_orientation_angle=0.0)
    o.surfaces.add(index=2)
    common(o)
    r = o.trace(Hy=1.0, num_rays=4)
    assert float(jnp.max(r.i)) == 0.0


def test_forbes_gradients_flow():
    """d(image y)/d(Qbfs coefficient) matches finite differences."""
    from optiland_tpu.core import raygen, trace as tc

    system = qbfs_lens().system

    def loss(c0):
        s = system.replace(
            stack=system.stack.replace(
                coeffs=system.stack.coeffs.at[1, 0].set(c0)
            )
        )
        rays = raygen.generate_rays(
            s, jnp.zeros(3), jnp.ones(3), jnp.asarray([0.0, 0.5, 1.0]),
            jnp.zeros(3), 0.55,
        )
        fin, _ = tc.trace(s, rays, record=False)
        return jnp.sum(fin.y**2)

    g = jax.grad(loss)(jnp.asarray(1e-4))
    fd = (loss(jnp.asarray(1e-4 + 1e-7)) - loss(jnp.asarray(1e-4 - 1e-7))) / 2e-7
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-3)


def test_grating_period_gradient_flows():
    """The grating period lives in geo_p1 and is differentiable."""
    from optiland_tpu.core import raygen, trace as tc

    system = plane_grating_lens().system

    def loss(period):
        s = system.replace(
            stack=system.stack.replace(
                geo_p1=system.stack.geo_p1.at[3].set(period)
            )
        )
        rays = raygen.generate_rays(
            s, jnp.zeros(3), jnp.ones(3), jnp.asarray([0.0, 0.5, 1.0]),
            jnp.zeros(3), 0.55,
        )
        fin, _ = tc.trace(s, rays, record=False)
        return jnp.sum(fin.y**2)

    g = jax.grad(loss)(jnp.asarray(10.0))
    fd = (loss(jnp.asarray(10.0 + 1e-5)) - loss(jnp.asarray(10.0 - 1e-5))) / 2e-5
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-5)
    assert abs(float(g)) > 1e-6


def test_grid_sag_out_of_bounds_nan():
    """Rays leaving the sag grid footprint become NaN (reference:
    grid_sag.py:95-104)."""
    o = grid_lens()
    o.set_aperture("EPD", 25.0)  # overfill the 16.2 mm grid
    o._invalidate()
    r = o.trace(Hy=0.0, num_rays=6, distribution="hexapolar")
    y = np.asarray(r.y)
    assert np.isnan(y).any() and np.isfinite(y).any()


def test_q2d_vertex_normal_regular():
    """Autodiff normals at the exact vertex are finite (the polar form the
    reference differentiates analytically is singular there)."""
    from optiland_tpu.core import geometry as geom

    o = q2d_lens()
    s = o.system
    n = geom.surface_normal_static(
        geom.FORBES_Q2D, 40.0, 0.0, s.stack.coeffs[1],
        jnp.asarray([0.0]), jnp.asarray([0.0]),
        p1=12.0, p2=1.0, aux=s.cfg.geom_aux[1],
    )
    for comp in n:
        assert np.isfinite(np.asarray(comp)).all()


def _nurbs_common(o):
    o.set_aperture("EPD", 10.0)
    o.fields.set_type("angle")
    o.fields.add(y=0)
    o.fields.add(y=3)
    o.wavelengths.add(0.55, is_primary=True)


@pytest.mark.slow  # forward compile of the 24-iter 2D Newton chain (~85 s
# cold); default-tier NURBS coverage: test_nurbs_fitted_parity +
# test_nurbs_control_point_gradient
def test_nurbs_explicit_parity(goldens):
    """Fully-specified rational NURBS net traces identically to the
    reference (reference: nurbs/nurbs_geometry.py)."""
    g = goldens("nurbs")
    o = Optic()
    o.surfaces.add(index=0, radius=np.inf, thickness=np.inf)
    o.surfaces.add(index=1, surface_type="nurbs", thickness=6.0,
                   material="N-BK7", is_stop=True,
                   control_points=g["P"].tolist(), weights=g["W"].tolist(),
                   u_degree=3, v_degree=3, u_knots=list(g["kn"]),
                   v_knots=list(g["kn"]))
    o.surfaces.add(index=2, radius=-60.0, thickness=30.0)
    o.surfaces.add(index=3)
    _nurbs_common(o)
    rays = o.trace(Hy=1.0, num_rays=5)
    for c in ("x", "y", "L", "M", "N", "i"):
        assert_allclose(getattr(rays, c), g[f"explicit_{c}"],
                        rtol=1e-8, atol=1e-10)


@pytest.mark.slow
def test_nurbs_fitted_parity(goldens):
    """Conic-fit NURBS (A9.7 LSQ approximation) matches the reference's
    fit_surface() output."""
    g = goldens("nurbs")
    o = Optic()
    o.surfaces.add(index=0, radius=np.inf, thickness=np.inf)
    o.surfaces.add(index=1, surface_type="nurbs", radius=50.0, conic=-0.5,
                   thickness=6.0, material="N-BK7", is_stop=True,
                   nurbs_norm_x=8.0, nurbs_norm_y=8.0,
                   n_points_u=7, n_points_v=7)
    o.surfaces.add(index=2, radius=-60.0, thickness=30.0)
    o.surfaces.add(index=3)
    _nurbs_common(o)
    rays = o.trace(Hy=1.0, num_rays=5)
    for c in ("x", "y", "L", "M", "N", "i"):
        assert_allclose(getattr(rays, c), g[f"fitted_{c}"],
                        rtol=1e-8, atol=1e-10)


@pytest.mark.slow
def test_nurbs_control_point_gradient():
    """Image position is differentiable w.r.t. a NURBS control point z."""
    from optiland_tpu.core import raygen, trace as tc

    nx_ = ny_ = 7
    xs = np.linspace(-7, 7, nx_)
    X, Y = np.meshgrid(xs, xs, indexing="ij")
    Z = (X**2 + Y**2) / (2 * 80.0)
    P = np.stack([X, Y, Z], axis=0)
    o = Optic()
    o.surfaces.add(index=0, radius=np.inf, thickness=np.inf)
    o.surfaces.add(index=1, surface_type="nurbs", thickness=6.0,
                   material="N-BK7", is_stop=True, control_points=P.tolist(),
                   weights=np.ones((nx_, ny_)).tolist(), u_degree=3,
                   v_degree=3)
    o.surfaces.add(index=2, radius=-60.0, thickness=30.0)
    o.surfaces.add(index=3)
    _nurbs_common(o)
    system = o.system
    # z of center control point lives at flat index 2*49 + 3*7+3 in coeffs
    idx = 2 * 49 + 3 * 7 + 3

    def loss(val):
        s = system.replace(
            stack=system.stack.replace(
                coeffs=system.stack.coeffs.at[1, idx].set(val)
            )
        )
        rays = raygen.generate_rays(
            s, jnp.zeros(3), jnp.ones(3), jnp.asarray([0.0, 0.5, 0.9]),
            jnp.zeros(3), 0.55,
        )
        fin, _ = tc.trace(s, rays, record=False)
        return jnp.sum(fin.y**2)

    v0 = float(np.asarray(o.system.stack.coeffs[1, idx]))
    g = jax.grad(loss)(jnp.asarray(v0))
    fd = (loss(jnp.asarray(v0 + 1e-6)) - loss(jnp.asarray(v0 - 1e-6))) / 2e-6
    np.testing.assert_allclose(float(g), float(fd), rtol=1e-3)
    assert abs(float(g)) > 1e-8
