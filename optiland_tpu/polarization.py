"""Polarization: states, local s/p bases, Jones calculus.

Vectorized jit-safe implementations of the reference's polarization stack
(reference: optiland/rays/polarization_state.py:1-126,
polarized_rays.py:47-233, jones.py:25-405). Polarized ray tracing carries a
per-ray 3x3 complex polarization matrix ``p`` through the trace; each
surface updates it with p <- O_out J O_in p where (s, p0, p1) is the local
basis bridging the pre-/post-interaction propagation directions.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


class PolarizationState:
    """Jones-vector polarization state
    (reference: rays/polarization_state.py)."""

    def __init__(self, is_polarized: bool = False, Ex=None, Ey=None,
                 phase_x=None, phase_y=None):
        if is_polarized:
            if None in [Ex, Ey, phase_x, phase_y]:
                raise ValueError(
                    "All parameters must be provided for a polarized state."
                )
        elif not all(v is None for v in [Ex, Ey, phase_x, phase_y]):
            raise ValueError(
                "Ex, Ey, phase_x, and phase_y must be None for a "
                "non-polarized state."
            )
        self.is_polarized = is_polarized
        if is_polarized:
            mag = float(np.sqrt(Ex**2 + Ey**2))
            self.Ex = Ex / mag
            self.Ey = Ey / mag
            self.phase_x = phase_x
            self.phase_y = phase_y
        else:
            self.Ex = self.Ey = self.phase_x = self.phase_y = None

    def __str__(self):
        if self.is_polarized:
            return (
                f"Polarized Light: Ex: {self.Ex}, Ey: {self.Ey}, "
                f"Phase x: {self.phase_x}, Phase y: {self.phase_y}"
            )
        return "Unpolarized Light"

    __repr__ = __str__


def create_polarization(pol_type: str) -> PolarizationState:
    """Named polarization states (reference: polarization_state.py:126+)."""
    if pol_type == "unpolarized":
        return PolarizationState(is_polarized=False)
    table = {
        "H": (1.0, 0.0, 0.0, 0.0),
        "V": (0.0, 1.0, 0.0, 0.0),
        "L+45": (np.sqrt(2) / 2, np.sqrt(2) / 2, 0.0, 0.0),
        "L-45": (np.sqrt(2) / 2, -np.sqrt(2) / 2, 0.0, 0.0),
        "RCP": (np.sqrt(2) / 2, np.sqrt(2) / 2, 0.0, -np.pi / 2),
        "LCP": (np.sqrt(2) / 2, np.sqrt(2) / 2, 0.0, np.pi / 2),
    }
    if pol_type not in table:
        raise ValueError(f"Invalid polarization type {pol_type!r}")
    Ex, Ey, px, py = table[pol_type]
    return PolarizationState(True, Ex, Ey, px, py)


def complex_dtype(real_dtype):
    """Complex dtype paired with a real working dtype.

    f32 rays carry complex64 polarization matrices — the TPU-native pairing
    (complex128 does not exist on TPU); f64 rays keep complex128 for
    reference parity.
    """
    return (
        jnp.complex64
        if jnp.dtype(real_dtype) == jnp.float32
        else jnp.complex128
    )


def _cross(a, b):
    return jnp.stack(
        [
            a[:, 1] * b[:, 2] - a[:, 2] * b[:, 1],
            a[:, 2] * b[:, 0] - a[:, 0] * b[:, 2],
            a[:, 0] * b[:, 1] - a[:, 1] * b[:, 0],
        ],
        axis=1,
    )


def local_basis(k0, k1):
    """Local s/p basis bridging pre/post directions
    (reference: polarized_rays.py:136-175, vectorized with where-masking).

    Args:
        k0, k1: (R, 3) pre- and post-interaction unit directions.

    Returns:
        (s, p0, p1, o_in, o_out): basis vectors and rotation matrices; o_in
        rows are (s, p0, k0), o_out columns are (s, p1, k1).
    """
    s = _cross(k0, k1)
    mag = jnp.linalg.norm(s, axis=1)
    degenerate = mag < 1e-12

    xhat = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), k0.shape)
    yhat = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), k0.shape)
    p_fb = _cross(k0, xhat)
    p_norm = jnp.linalg.norm(p_fb, axis=1)
    p_fb = jnp.where((p_norm < 1e-12)[:, None], _cross(k0, yhat), p_fb)
    s_fb = _cross(p_fb, k0)

    s = jnp.where(degenerate[:, None], s_fb, s)
    mag = jnp.linalg.norm(s, axis=1)
    s = s / mag[:, None]

    p0 = _cross(k0, s)
    p1 = _cross(k1, s)
    o_in = jnp.stack((s, p0, k0), axis=1)
    o_out = jnp.stack((s, p1, k1), axis=2)
    return s, p0, p1, o_in, o_out


def update_p(p, L0, M0, N0, L, M, N, jones=None):
    """p <- O_out J O_in p (reference: polarized_rays.py:176-199)."""
    k0 = jnp.stack([L0, M0, N0], axis=1)
    k1 = jnp.stack([L, M, N], axis=1)
    _, _, _, o_in, o_out = local_basis(k0, k1)
    if jones is None:
        surf_p = jnp.einsum("nij,njk->nik", o_out, o_in)
    else:
        surf_p = jnp.einsum(
            "nij,njk,nkl->nil", o_out.astype(jones.dtype), jones,
            o_in.astype(jones.dtype),
        )
    return jnp.einsum("nij,njk->nik", surf_p.astype(p.dtype), p)


def get_3d_electric_field(state: PolarizationState, L0, M0, N0):
    """Launch-space 3D E-field for a polarization state
    (reference: polarized_rays.py:201-233)."""
    k = jnp.stack([L0, M0, N0], axis=1)
    xhat = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), k.shape)
    p = _cross(k, xhat)
    norms = jnp.linalg.norm(p, axis=1)
    p = p / jnp.where(norms == 0, 1.0, norms)[:, None]
    s = _cross(p, k)
    E = (
        state.Ex * jnp.exp(1j * state.phase_x) * s
        + state.Ey * jnp.exp(1j * state.phase_y) * p
    )
    return E


def polarized_intensity(p, state, L0, M0, N0, i0):
    """Final intensity from the accumulated polarization matrices
    (reference: polarized_rays.py:96-134 update_intensity)."""
    if state is not None and state.is_polarized:
        fields = [get_3d_electric_field(state, L0, M0, N0)]
    else:
        sx = PolarizationState(True, 1.0, 0.0, 0.0, 0.0)
        sy = PolarizationState(True, 0.0, 1.0, 0.0, 0.0)
        fields = [
            get_3d_electric_field(sx, L0, M0, N0),
            get_3d_electric_field(sy, L0, M0, N0),
        ]
    intensity = jnp.zeros_like(i0)
    for E0 in fields:
        E1 = jnp.einsum("nij,nj->ni", p, E0.astype(p.dtype))
        intensity = intensity + jnp.sum(jnp.abs(E1) ** 2, axis=1)
    return intensity * i0 / len(fields)


def exit_fields(p, state, L0, M0, N0, i0):
    """Exit 3D electric field(s) from the accumulated polarization matrices
    (reference: polarized_rays.py:68-120 get_exit_fields).

    Returns a list of (R, 3) complex arrays: one field for polarized light,
    two orthogonal incoherent fields (each scaled by 1/sqrt(2)) for
    unpolarized light.
    """
    if state is not None and state.is_polarized:
        fields = [get_3d_electric_field(state, L0, M0, N0)]
    else:
        sx = PolarizationState(True, 1.0, 0.0, 0.0, 0.0)
        sy = PolarizationState(True, 0.0, 1.0, 0.0, 0.0)
        fields = [
            get_3d_electric_field(sx, L0, M0, N0),
            get_3d_electric_field(sy, L0, M0, N0),
        ]
    scale = jnp.sqrt(i0 / len(fields))[:, None]
    return [
        jnp.einsum("nij,nj->ni", p, E0.astype(p.dtype)) * scale
        for E0 in fields
    ]


# ---------------------------------------------------------------------------
# Jones matrices (functional: (ray arrays, reflect, aoi) -> (R, 3, 3) complex)
# ---------------------------------------------------------------------------


class BaseJones:
    """Base Jones matrix model (reference: jones.py:25)."""

    def calculate_matrix(self, L0, M0, N0, L, M, N, w, reflect=False, aoi=None):
        n = L0.shape[0]
        return jnp.broadcast_to(
            jnp.eye(3, dtype=jnp.complex64), (n, 3, 3)
        )


def _diag3(n, s, p, z):
    """Batched diagonal (R,3,3) complex matrix from per-ray entries."""
    out = jnp.zeros((n, 3, 3), dtype=jnp.result_type(s, 1j))
    out = out.at[:, 0, 0].set(s)
    out = out.at[:, 1, 1].set(p)
    out = out.at[:, 2, 2].set(z)
    return out


class JonesFresnel(BaseJones):
    """Fresnel amplitude coefficients at a bare interface
    (reference: jones.py:56)."""

    def __init__(self, material_pre, material_post):
        self.material_pre = material_pre
        self.material_post = material_post

    def calculate_matrix(self, L0, M0, N0, L, M, N, w, reflect=False, aoi=None):
        cd = complex_dtype(jnp.asarray(L0).dtype)
        n1 = jnp.asarray(self.material_pre.n(w))
        n2 = jnp.asarray(self.material_post.n(w))
        cos_i = jnp.cos(aoi)
        n = n2 / n1
        root = jnp.sqrt((n**2 - jnp.sin(aoi) ** 2).astype(cd))
        R = L0.shape[0]
        if reflect:
            s = (cos_i - root) / (cos_i + root)
            p = (n**2 * cos_i - root) / (n**2 * cos_i + root)
            return _diag3(R, s, -p, -jnp.ones(R, cd))
        s = 2 * cos_i / (cos_i + root)
        p = 2 * n * cos_i / (n**2 * cos_i + root)
        return _diag3(R, s, p, jnp.ones(R, cd))


class JonesLinearPolarizer(BaseJones):
    """Linear polarizer with a global-frame transmission axis
    (reference: jones.py:120)."""

    def __init__(self, axis):
        axis = np.asarray(axis, float)
        self.axis = axis / np.linalg.norm(axis)

    def calculate_matrix(self, L0, M0, N0, L, M, N, w, reflect=False, aoi=None):
        k0 = jnp.stack([L0, M0, N0], axis=1)
        k1 = jnp.stack([L, M, N], axis=1)
        s, p0, p1, _, _ = local_basis(k0, k1)
        axis = jnp.broadcast_to(jnp.asarray(self.axis), k0.shape)
        ts_in = jnp.sum(axis * s, axis=1)
        tp_in = jnp.sum(axis * p0, axis=1)
        norm_in = jnp.sqrt(ts_in**2 + tp_in**2)
        norm_in = jnp.where(norm_in == 0, 1.0, norm_in)
        ts_out = jnp.sum(axis * s, axis=1)
        tp_out = jnp.sum(axis * p1, axis=1)
        norm_out = jnp.sqrt(ts_out**2 + tp_out**2)
        norm_out = jnp.where(norm_out == 0, 1.0, norm_out)
        us_in, up_in = ts_in / norm_in, tp_in / norm_in
        us_out, up_out = ts_out / norm_out, tp_out / norm_out
        R = L0.shape[0]
        out = jnp.zeros((R, 3, 3), complex_dtype(jnp.asarray(L0).dtype))
        out = out.at[:, 0, 0].set(us_out * us_in)
        out = out.at[:, 0, 1].set(us_out * up_in)
        out = out.at[:, 1, 0].set(up_out * us_in)
        out = out.at[:, 1, 1].set(up_out * up_in)
        out = out.at[:, 2, 2].set(1.0)
        return out


class JonesPolarizerH(JonesLinearPolarizer):
    def __init__(self):
        super().__init__([1, 0, 0])


class JonesPolarizerV(JonesLinearPolarizer):
    def __init__(self):
        super().__init__([0, 1, 0])


class JonesPolarizerL45(JonesLinearPolarizer):
    def __init__(self):
        v = 1 / np.sqrt(2)
        super().__init__([v, v, 0])


class JonesPolarizerL135(JonesLinearPolarizer):
    def __init__(self):
        v = 1 / np.sqrt(2)
        super().__init__([-v, v, 0])


class ConstantJones(BaseJones):
    """Constant 2x2 Jones block in the local frame (reference: jones.py:215)."""

    def __init__(self, j00, j01, j10, j11):
        self.j = (j00, j01, j10, j11)

    def calculate_matrix(self, L0, M0, N0, L, M, N, w, reflect=False, aoi=None):
        R = L0.shape[0]
        out = jnp.zeros((R, 3, 3), complex_dtype(jnp.asarray(L0).dtype))
        out = out.at[:, 0, 0].set(self.j[0])
        out = out.at[:, 0, 1].set(self.j[1])
        out = out.at[:, 1, 0].set(self.j[2])
        out = out.at[:, 1, 1].set(self.j[3])
        out = out.at[:, 2, 2].set(1.0)
        return out


class JonesPolarizerRCP(ConstantJones):
    def __init__(self):
        super().__init__(0.5, 0.5j, -0.5j, 0.5)


class JonesPolarizerLCP(ConstantJones):
    def __init__(self):
        super().__init__(0.5, -0.5j, 0.5j, 0.5)


def _axis_from(axis, theta):
    if axis is not None and np.size(np.asarray(axis)) == 1:
        theta = float(np.asarray(axis))
        axis = None
    if axis is not None:
        axis = np.asarray(axis, float)
        return axis / np.linalg.norm(axis)
    if theta is not None:
        return np.array([np.cos(theta), np.sin(theta), 0.0])
    return np.array([1.0, 0.0, 0.0])


def _in_plane_axis(axis, L0, M0, N0, L, M, N):
    k0 = jnp.stack([L0, M0, N0], axis=1)
    k1 = jnp.stack([L, M, N], axis=1)
    s, p0, _, _, _ = local_basis(k0, k1)
    axis_b = jnp.broadcast_to(jnp.asarray(axis), k0.shape)
    ts = jnp.sum(axis_b * s, axis=1)
    tp = jnp.sum(axis_b * p0, axis=1)
    norm = jnp.sqrt(ts**2 + tp**2)
    norm = jnp.where(norm == 0, 1.0, norm)
    return ts / norm, tp / norm


class JonesLinearDiattenuator(BaseJones):
    """Partial linear polarizer (reference: jones.py:262)."""

    def __init__(self, t_min, t_max, axis=None, *, theta=None):
        self.t_min = t_min
        self.t_max = t_max
        self.axis = _axis_from(axis, theta)

    def calculate_matrix(self, L0, M0, N0, L, M, N, w, reflect=False, aoi=None):
        us, up = _in_plane_axis(self.axis, L0, M0, N0, L, M, N)
        j00 = self.t_max * us**2 + self.t_min * up**2
        j0x = (self.t_max - self.t_min) * us * up
        j11 = self.t_max * up**2 + self.t_min * us**2
        R = L0.shape[0]
        out = jnp.zeros((R, 3, 3), complex_dtype(jnp.asarray(L0).dtype))
        out = out.at[:, 0, 0].set(j00)
        out = out.at[:, 0, 1].set(j0x)
        out = out.at[:, 1, 0].set(j0x)
        out = out.at[:, 1, 1].set(j11)
        out = out.at[:, 2, 2].set(1.0)
        return out


class JonesLinearRetarder(BaseJones):
    """Linear retarder of given retardance (reference: jones.py:331)."""

    def __init__(self, retardance, axis=None, *, theta=None):
        self.retardance = retardance
        self.axis = _axis_from(axis, theta)

    def calculate_matrix(self, L0, M0, N0, L, M, N, w, reflect=False, aoi=None):
        d = self.retardance
        us, up = _in_plane_axis(self.axis, L0, M0, N0, L, M, N)
        j00 = jnp.exp(-1j * d / 2) * us**2 + jnp.exp(1j * d / 2) * up**2
        j0x = -2j * jnp.sin(d / 2) * us * up
        j11 = jnp.exp(1j * d / 2) * us**2 + jnp.exp(-1j * d / 2) * up**2
        R = L0.shape[0]
        out = jnp.zeros((R, 3, 3), complex_dtype(jnp.asarray(L0).dtype))
        out = out.at[:, 0, 0].set(j00)
        out = out.at[:, 0, 1].set(j0x)
        out = out.at[:, 1, 0].set(j0x)
        out = out.at[:, 1, 1].set(j11)
        out = out.at[:, 2, 2].set(1.0)
        return out


class JonesQuarterWaveRetarder(JonesLinearRetarder):
    def __init__(self, axis=None, *, theta=None):
        super().__init__(np.pi / 2, axis=axis, theta=theta)


class JonesHalfWaveRetarder(JonesLinearRetarder):
    def __init__(self, axis=None, *, theta=None):
        super().__init__(np.pi, axis=axis, theta=theta)


class JonesThinFilm(BaseJones):
    """Jones model from a thin-film stack's complex r/t coefficients
    (reference: coatings.py:488)."""

    def __init__(self, stack):
        self.stack = stack

    def calculate_matrix(self, L0, M0, N0, L, M, N, w, reflect=False, aoi=None):
        cd = complex_dtype(jnp.asarray(L0).dtype)
        rs, ts, _, _, _ = self.stack.compute_rtRTA(w, aoi, "s")
        rp, tp, _, _, _ = self.stack.compute_rtRTA(w, aoi, "p")
        R = L0.shape[0]
        if reflect:
            return _diag3(R, jnp.ravel(rs) * jnp.ones(R),
                          -jnp.ravel(rp) * jnp.ones(R),
                          -jnp.ones(R, cd))
        return _diag3(R, jnp.ravel(ts) * jnp.ones(R),
                      jnp.ravel(tp) * jnp.ones(R),
                      jnp.ones(R, cd))
