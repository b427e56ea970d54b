"""Ray bundle and ray-op kernels: creation, normalization, rotation,
refraction/reflection physics, paraxial rays, polarized rays
(reference: tests/test_rays.py, optiland/rays/real_rays.py,
optiland_tpu/ops/kernels.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from optiland_tpu.core.rays import ParaxialRays, RealRays
from optiland_tpu.ops import kernels


def _bundle():
    return RealRays.create(
        x=[0.0, 1.0], y=[0.0, -1.0], z=[0.0, 0.0],
        L=[0.0, 0.0], M=[0.0, 0.0], N=[1.0, 1.0],
        intensity=1.0, wavelength=0.55,
    )


# -- bundle construction ------------------------------------------------------


def test_create_broadcasts_scalars():
    r = RealRays.create(0.0, [0.0, 1.0, 2.0], 0.0, 0.0, 0.0, 1.0, 1.0, 0.55)
    assert r.num_rays == 3
    assert r.x.shape == (3,)
    np.testing.assert_allclose(r.w, 0.55)


def test_create_initializes_opd_to_zero():
    r = _bundle()
    np.testing.assert_allclose(r.opd, 0.0)


def test_bundle_is_pytree():
    import jax

    r = _bundle()
    leaves = jax.tree.leaves(r)
    assert all(isinstance(v, jnp.ndarray) for v in leaves)
    r2 = jax.tree.map(lambda a: a * 2, r)
    np.testing.assert_allclose(r2.x, np.asarray(r.x) * 2)


def test_paraxial_rays_create():
    pr = ParaxialRays.create(y=[1.0, 0.0], u=[0.0, 0.1], z=0.0,
                             wavelength=0.55)
    assert pr.y.shape == (2,)


# -- kernels: rotation --------------------------------------------------------


def test_rotate_x_quarter_turn():
    y, z, M, N = kernels.rotate_x(
        jnp.asarray(1.0), jnp.asarray(0.0), jnp.asarray(0.0),
        jnp.asarray(1.0), jnp.asarray(np.pi / 2)
    )
    np.testing.assert_allclose(
        [float(y), float(z), float(M), float(N)], [0.0, 1.0, -1.0, 0.0],
        atol=1e-12,
    )


def test_rotate_y_quarter_turn():
    x, z, L, N = kernels.rotate_y(
        jnp.asarray(1.0), jnp.asarray(0.0), jnp.asarray(0.0),
        jnp.asarray(1.0), jnp.asarray(np.pi / 2)
    )
    np.testing.assert_allclose([float(x), float(z)], [0.0, -1.0], atol=1e-12)
    np.testing.assert_allclose([float(L), float(N)], [1.0, 0.0], atol=1e-12)


def test_rotate_z_quarter_turn():
    x, y, L, M = kernels.rotate_z(
        jnp.asarray(1.0), jnp.asarray(0.0), jnp.asarray(0.0),
        jnp.asarray(1.0), jnp.asarray(np.pi / 2)
    )
    np.testing.assert_allclose([float(x), float(y)], [0.0, 1.0], atol=1e-12)


def test_rotation_preserves_norm():
    rng = np.random.default_rng(3)
    L, M, N = kernels.normalize(*[jnp.asarray(rng.normal(size=16))
                                  for _ in range(3)])
    _, _, M2, N2 = kernels.rotate_x(jnp.zeros(16), jnp.zeros(16), M, N, 0.3)
    np.testing.assert_allclose(np.asarray(L**2 + M2**2 + N2**2), 1.0,
                               atol=1e-12)


# -- kernels: normalize / refract / reflect -----------------------------------


def test_normalize_unit_length():
    L, M, N = kernels.normalize(
        jnp.asarray([3.0, 0.0]), jnp.asarray([0.0, 4.0]),
        jnp.asarray([4.0, 3.0])
    )
    np.testing.assert_allclose(np.asarray(L**2 + M**2 + N**2), 1.0,
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(L), [0.6, 0.0], atol=1e-12)


def test_refract_snells_law_plane():
    """30 degrees in glass->air at a flat interface: sin(t2) = n1 sin(t1)/n2."""
    t1 = np.deg2rad(30.0)
    L, M, N = (jnp.asarray(v) for v in
               (np.sin(t1), 0.0, np.cos(t1)))
    L2, M2, N2 = kernels.refract(
        L, M, N, jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(-1.0),
        1.0, 1.5,
    )
    t2 = np.arcsin(1.0 * np.sin(t1) / 1.5)
    np.testing.assert_allclose(float(L2), np.sin(t2), atol=1e-12)
    np.testing.assert_allclose(float(N2), np.cos(t2), atol=1e-12)
    assert abs(float(M2)) < 1e-14


def test_refract_normal_incidence_unchanged():
    L2, M2, N2 = kernels.refract(
        jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(1.0),
        jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(-1.0), 1.0, 1.7,
    )
    np.testing.assert_allclose(
        [float(L2), float(M2), float(N2)], [0.0, 0.0, 1.0], atol=1e-12
    )


def test_refract_preserves_tangential_plane():
    """The refracted ray stays in the plane of incidence."""
    t1 = np.deg2rad(20.0)
    L, M, N = (jnp.asarray(np.sin(t1) / np.sqrt(2)),
               jnp.asarray(np.sin(t1) / np.sqrt(2)),
               jnp.asarray(np.cos(t1)))
    L2, M2, _ = kernels.refract(
        L, M, N, jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(-1.0),
        1.0, 1.5,
    )
    np.testing.assert_allclose(float(L2) / float(M2), 1.0, rtol=1e-12)


def test_reflect_flat_mirror():
    L2, M2, N2 = kernels.reflect(
        jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(1.0),
        jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(-1.0),
    )
    np.testing.assert_allclose(float(N2), -1.0, atol=1e-12)


def test_reflect_45_degrees():
    """A ray along +z reflecting off a 45-degree mirror goes along +y."""
    n = np.array([0.0, 1.0, -1.0]) / np.sqrt(2)
    L2, M2, N2 = kernels.reflect(
        jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(1.0),
        jnp.asarray(n[0]), jnp.asarray(n[1]), jnp.asarray(n[2]),
    )
    np.testing.assert_allclose(
        [float(L2), float(M2), float(N2)], [0.0, 1.0, 0.0], atol=1e-12
    )


def test_reflect_preserves_norm():
    rng = np.random.default_rng(5)
    L, M, N = kernels.normalize(*[jnp.asarray(rng.normal(size=32))
                                  for _ in range(3)])
    nx, ny, nz = kernels.normalize(*[jnp.asarray(rng.normal(size=32))
                                     for _ in range(3)])
    L2, M2, N2 = kernels.reflect(L, M, N, nx, ny, nz)
    np.testing.assert_allclose(np.asarray(L2**2 + M2**2 + N2**2), 1.0,
                               atol=1e-12)


def test_align_normal_sign_convention():
    """align_normal orients the normal so ray . normal >= 0 and returns
    |cos| of the incidence angle."""
    for nz0 in (1.0, -1.0):
        nx, ny, nz, cos = kernels.align_normal(
            jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(1.0),
            jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(nz0),
        )
        assert float(nz) == 1.0
        assert float(cos) == pytest.approx(1.0)


# -- polarized rays -----------------------------------------------------------


def test_polarized_trace_intensity_bounded():
    from optiland_tpu.samples import CookeTriplet

    optic = CookeTriplet()
    optic.set_polarization("ignore")
    res = optic.trace(0.0, 0.0, num_rays=16, wavelength=0.55,
                      distribution="hexapolar")
    inten = np.asarray(res.i)
    assert (inten >= 0).all() and (inten <= 1.0 + 1e-12).all()


# -- coordinate system localization -------------------------------------------


def test_cs_localize_globalize_round_trip():
    from optiland_tpu.coordinate_system import CoordinateSystem

    cs = CoordinateSystem(x=1.0, y=-2.0, z=3.0, rx=0.1, ry=-0.2, rz=0.3)
    r = _bundle()
    local = cs.localize(r)
    back = cs.globalize(local)
    np.testing.assert_allclose(np.asarray(back.x), np.asarray(r.x),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(back.N), np.asarray(r.N),
                               atol=1e-12)


def test_cs_rotation_matrix_orthonormal():
    from optiland_tpu.coordinate_system import CoordinateSystem

    cs = CoordinateSystem(rx=0.2, ry=0.4, rz=-0.3)
    R = cs.get_rotation_matrix()
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-12)


def test_cs_chained_reference_frames():
    from optiland_tpu.coordinate_system import CoordinateSystem

    base = CoordinateSystem(z=10.0, rx=0.1)
    child = CoordinateSystem(z=5.0, reference_cs=base)
    x, y, z = child.position_in_gcs
    assert z == pytest.approx(10.0 + 5.0 * np.cos(0.1))
    assert y == pytest.approx(-5.0 * np.sin(0.1))
