"""Solver-level tests for the round-5 intersection rework.

Pins (a) the closed-form grid-sag intersection against a dense Newton
iteration on the same bilinear interpolant, (b) the gather-path bilinear
coefficients against the hat-basis matmul formulation (the two backends'
paths must be the same function), and (c) the reduced f32 NURBS parameter
iteration count against the conservative f64 count.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from optiland_tpu.core import geometry as geom
from tests.conftest import assert_allclose


def _grid_case(rough=False, seed=0):
    rng = np.random.default_rng(seed)
    xs = np.linspace(-8.0, 8.0, 21)
    ys = np.linspace(-8.0, 8.0, 19)
    X, Y = np.meshgrid(xs, ys)
    sag = 1e-3 * (X**2 + 0.5 * Y**2)
    if rough:
        sag = sag + 0.05 * rng.standard_normal(sag.shape)
    aux = ("grid", tuple(xs), tuple(ys))
    coeffs = jnp.asarray(sag.ravel())
    return aux, coeffs


def _rays(n, seed=1):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.uniform(-6, 6, n))
    y = jnp.asarray(rng.uniform(-6, 6, n))
    z = jnp.full((n,), -5.0)
    L = jnp.asarray(rng.uniform(-0.25, 0.25, n))
    M = jnp.asarray(rng.uniform(-0.25, 0.25, n))
    N = jnp.sqrt(1 - L**2 - M**2)
    return x, y, z, L, M, N


def _newton_reference_t(coeffs, aux, x, y, z, L, M, N, iters=60):
    """Dense Newton on the same interpolant — the limit the closed-form
    per-cell quadratic solve must agree with."""
    t = geom._distance_plane(x, y, z, L, M, N)

    def f_of_t(t):
        return (z + t * N) - geom._sag_grid(
            None, None, coeffs, None, None, x + t * L, y + t * M, aux=aux
        )

    for _ in range(iters):
        f, df = jax.jvp(f_of_t, (t,), (jnp.ones_like(t),))
        df = jnp.where(jnp.abs(df) > 1e-14, df, 1e-14)
        t = t - f / df
    return t


@pytest.mark.parametrize("rough", [False, True])
def test_grid_closed_form_matches_dense_newton(rough):
    aux, coeffs = _grid_case(rough=rough)
    x, y, z, L, M, N = _rays(512)
    t_closed = geom._distance_grid(coeffs, x, y, z, L, M, N, aux)
    t_ref = _newton_reference_t(coeffs, aux, x, y, z, L, M, N)
    ok = np.isfinite(np.asarray(t_ref))
    # rough grids can bounce dense Newton across cell kinks; compare where
    # the reference converged
    assert ok.mean() > 0.95
    assert_allclose(
        np.asarray(t_closed)[ok], np.asarray(t_ref)[ok],
        rtol=1e-9, atol=1e-9,
    )


def test_grid_closed_form_residual_is_zero():
    aux, coeffs = _grid_case()
    x, y, z, L, M, N = _rays(512, seed=3)
    t = geom._distance_grid(coeffs, x, y, z, L, M, N, aux)
    zq = z + t * N
    s = geom._sag_grid(
        None, None, coeffs, None, None, x + t * L, y + t * M, aux=aux
    )
    assert float(jnp.max(jnp.abs(zq - s))) < 1e-10


def test_grid_bilinear_coeffs_gather_matches_hat():
    """The gather branch (CPU) and the hat-matmul branch (TPU) of
    _grid_bilinear_coeffs are the same mathematical function."""
    aux, coeffs = _grid_case(rough=True, seed=5)
    xg, yg, sg = geom._grid_arrays(coeffs, aux)
    rng = np.random.default_rng(7)
    xq = jnp.asarray(rng.uniform(-7.9, 7.9, 257))
    yq = jnp.asarray(rng.uniform(-7.9, 7.9, 257))
    # gather branch (default on CPU)
    s0g, sxg, syg, sxyg = geom._grid_bilinear_coeffs(xg, yg, sg, xq, yq)
    # hat-matmul branch, computed inline (the TPU formulation)
    one = jnp.ones_like(xq)
    wx, dwx = jax.jvp(lambda q: geom._hat_weights(xg, q), (xq,), (one,))
    wy, dwy = jax.jvp(lambda q: geom._hat_weights(yg, q), (yq,), (one,))
    p1 = wy @ sg
    p2 = dwy @ sg
    assert_allclose(jnp.sum(p1 * wx, -1), s0g, rtol=1e-11, atol=1e-12)
    assert_allclose(jnp.sum(p1 * dwx, -1), sxg, rtol=1e-11, atol=1e-11)
    assert_allclose(jnp.sum(p2 * wx, -1), syg, rtol=1e-11, atol=1e-11)
    assert_allclose(jnp.sum(p2 * dwx, -1), sxyg, rtol=1e-11, atol=1e-11)


def test_grid_distance_gradient_flows_to_sag_values():
    """d(t)/d(grid values) is finite and nonzero through the closed-form
    solve (the IFT correction is the differentiable path)."""
    aux, coeffs = _grid_case()
    x, y, z, L, M, N = _rays(64, seed=11)

    def mean_t(c):
        return jnp.mean(geom._distance_grid(c, x, y, z, L, M, N, aux))

    g = jax.grad(mean_t)(coeffs)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0
    # finite-difference check on the largest-|g| node
    k = int(np.abs(g).argmax())
    eps = 1e-6
    up = float(mean_t(coeffs.at[k].add(eps)))
    dn = float(mean_t(coeffs.at[k].add(-eps)))
    np.testing.assert_allclose((up - dn) / (2 * eps), g[k], rtol=1e-4)


def test_nurbs_reduced_iters_converged():
    """12 parameter-space Newton iterations already sit at the f64 answer
    for fitted-conic surfaces — the f32 path's reduced count is below the
    dtype's precision floor, not a physics change."""
    from optiland_tpu.core import nurbs

    coeffs, aux = nurbs.build_nurbs_def(
        radius=50.0, conic=-0.5, nurbs_norm_x=8.0, nurbs_norm_y=8.0,
        n_points_u=7, n_points_v=7,
    )
    coeffs = jnp.asarray(coeffs)
    rng = np.random.default_rng(13)
    n = 128
    x = jnp.asarray(rng.uniform(-4, 4, n))
    y = jnp.asarray(rng.uniform(-4, 4, n))
    z = jnp.full((n,), -5.0)
    L = jnp.asarray(rng.uniform(-0.15, 0.15, n))
    M = jnp.asarray(rng.uniform(-0.15, 0.15, n))
    N = jnp.sqrt(1 - L**2 - M**2)

    P, W = nurbs.unpack_pw(coeffs, aux)
    mask = (L > M) & (L > N)
    hyp1 = jnp.where(jnp.sqrt(L**2 + M**2) == 0, 1.0, jnp.sqrt(L**2 + M**2))
    hyp2 = jnp.where(jnp.sqrt(N**2 + M**2) == 0, 1.0, jnp.sqrt(N**2 + M**2))
    N1 = (jnp.where(mask, M / hyp1, 0.0),
          jnp.where(mask, -L / hyp1, N / hyp2),
          jnp.where(mask, 0.0, -M / hyp2))
    N2 = (N1[1] * N - N1[2] * M, N1[2] * L - N1[0] * N,
          N1[0] * M - N1[1] * L)
    d1 = -(N1[0] * x + N1[1] * y + N1[2] * z)
    d2 = -(N2[0] * x + N2[1] * y + N2[2] * z)

    def residual(u, v):
        S = nurbs.nurbs_eval(P, W, aux, u, v)
        return (N1[0] * S[0] + N1[1] * S[1] + N1[2] * S[2] + d1,
                N2[0] * S[0] + N2[1] * S[1] + N2[2] * S[2] + d2)

    u0, v0 = nurbs._param_guess(P, x, y)
    u12, v12 = nurbs._newton_uv(residual, u0, v0, iters=12)
    u24, v24 = nurbs._newton_uv(residual, u0, v0, iters=24)
    assert_allclose(u12, u24, rtol=0, atol=1e-9)
    assert_allclose(v12, v24, rtol=0, atol=1e-9)
