"""NURBS / B-spline / Bezier surface machinery.

Basis polynomials follow Cox-de Boor (The NURBS Book eq. 2.5) with static
knot vectors and degrees, so the recurrence unrolls into pure jnp
elementwise ops; control points and weights stay traced (differentiable).
The conic-fit path replicates the reference's global least-squares surface
approximation (The NURBS Book A9.7) in numpy at build time
(reference: optiland/geometries/nurbs/nurbs_basis_functions.py:1-219,
nurbs_fitting.py:1-275, nurbs_geometry.py:1-969).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Runtime basis evaluation (jnp; static knots/degree)
# ---------------------------------------------------------------------------


def basis_list(knots: tuple, n: int, p: int, u):
    """Cox-de Boor basis values N_{i,p}(u) as a LIST of arrays shaped like
    ``u`` (reference: nurbs_basis_functions.py:30-82). The list form keeps
    every intermediate 2-D inside TPU Pallas kernels (no (n+1, ...) stack),
    and is what the fused trace kernel consumes."""
    U = knots
    m = n + p + 1
    N = []
    for i in range(m):
        ind = jnp.where((u >= U[i]) & (u < U[i + 1]), 1.0, 0.0)
        if i == n:
            ind = ind + jnp.where(u == U[-1], 1.0, 0.0)
        N.append(ind)
    for k in range(1, p + 1):
        m = m - 1
        Nk = []
        for i in range(m):
            if (U[i + k] - U[i]) == 0:
                n1 = jnp.zeros_like(u)
            else:
                n1 = (u - U[i]) / (U[i + k] - U[i]) * N[i]
            if (U[i + k + 1] - U[i + 1]) == 0:
                n2 = jnp.zeros_like(u)
            else:
                n2 = (U[i + k + 1] - u) / (U[i + k + 1] - U[i + 1]) * N[i + 1]
            Nk.append(n1 + n2)
        N = Nk
    return N[: n + 1]


def basis_matrix(knots: tuple, n: int, p: int, u):
    """(n+1, Q) basis values N_{i,p}(u) via Cox-de Boor
    (reference: nurbs_basis_functions.py:30-82)."""
    return jnp.stack(basis_list(knots, n, p, u))


def nurbs_eval(P, W, aux, u, v):
    """Evaluate the surface at parameters (u, v): returns (3, Q) coordinates
    (reference: nurbs_geometry.py:286-330 compute_nurbs_coordinates)."""
    _, nu, nv, p, q, uk, vk = aux
    Bu = basis_matrix(uk, nu - 1, p, u)  # (nu, Q)
    Bv = basis_matrix(vk, nv - 1, q, v)  # (nv, Q)
    Pw = jnp.concatenate([P * W[None], W[None]], axis=0)  # (4, nu, nv)
    # S_h[d, Q] = sum_ij Pw[d,i,j] Bu[i,Q] Bv[j,Q]
    A = jnp.einsum("dij,jQ->diQ", Pw, Bv)
    Sh = jnp.einsum("diQ,iQ->dQ", A, Bu)
    w = jnp.where(Sh[3] == 0, 1.0, Sh[3])
    return Sh[:3] / w


def unpack_pw(coeffs, aux):
    """Split the flat coefficient row into (P, W)."""
    _, nu, nv, _, _, _, _ = aux
    P = coeffs[: 3 * nu * nv].reshape(3, nu, nv)
    W = coeffs[3 * nu * nv: 4 * nu * nv].reshape(nu, nv)
    return P, W


def _param_guess(P, x, y):
    """Initial (u, v) from the control net's x/y bounding box (the net is a
    regular x-major grid for fitted and sample-constructed surfaces)."""
    x0, x1 = P[0, 0, 0], P[0, -1, -1]
    y0, y1 = P[1, 0, 0], P[1, -1, -1]
    u0 = (x - x0) / jnp.where(x1 - x0 == 0, 1.0, x1 - x0)
    v0 = (y - y0) / jnp.where(y1 - y0 == 0, 1.0, y1 - y0)
    return jnp.clip(u0, 0.0, 1.0), jnp.clip(v0, 0.0, 1.0)


def _uv_iters(dtype) -> int:
    """Parameter-space Newton iteration count by dtype: the 2x2 solve
    converges quadratically from the bounding-box guess, so iterations
    past the dtype's precision floor only add cost. 12 reaches f32 eps
    with margin (measured: <=7 for the fitted-conic surfaces); 24 is the
    conservative f64 parity count."""
    return 12 if jnp.dtype(dtype) == jnp.float32 else 24


def _newton_uv(residual_fn, u, v, iters: int | None = None):
    """Fixed-count damped 2x2 Newton on (u, v) in [0, 1]^2.

    The reference restarts out-of-bounds iterates at random points
    (nurbs_geometry.py:745-760); clipping to the parameter box is the
    deterministic, jit-friendly equivalent for surfaces whose solution lies
    inside the box.
    """
    import jax

    if iters is None:
        iters = _uv_iters(u.dtype)

    def step(u, v):
        (f1, f2), (df1_du, df2_du) = jax.jvp(
            residual_fn, (u, v), (jnp.ones_like(u), jnp.zeros_like(v))
        )
        _, (df1_dv, df2_dv) = jax.jvp(
            residual_fn, (u, v), (jnp.zeros_like(u), jnp.ones_like(v))
        )
        det = df1_du * df2_dv - df1_dv * df2_du
        det = jnp.where(jnp.abs(det) < 1e-14, 1e-14, det)
        du = (f1 * df2_dv - f2 * df1_dv) / det
        dv = (f2 * df1_du - f1 * df2_du) / det
        return jnp.clip(u - du, 0.0, 1.0), jnp.clip(v - dv, 0.0, 1.0)

    for _ in range(iters):
        u, v = step(u, v)
    # implicit-function-theorem gradient (see geometry.distance_static):
    # discard the 24 iterations' parameter dependence and differentiate a
    # single 2x2 Newton correction around the converged root — the
    # adjoint transposes one residual evaluation instead of 24
    u = jax.lax.stop_gradient(u)
    v = jax.lax.stop_gradient(v)
    return step(u, v)


def sag(coeffs, aux, x, y):
    """Sag: z of the surface point whose (x, y) matches the query
    (reference: nurbs_geometry.py:733-762)."""
    P, W = unpack_pw(coeffs, aux)
    x = jnp.atleast_1d(x)
    y = jnp.atleast_1d(y)

    def residual(u, v):
        S = nurbs_eval(P, W, aux, u, v)
        return S[0] - x, S[1] - y

    u0, v0 = _param_guess(P, x, y)
    u, v = _newton_uv(residual, u0, v0)
    return nurbs_eval(P, W, aux, u, v)[2]


def surface_normal(coeffs, aux, x, y):
    """Unit normal from the cross product of the parametric tangents
    (reference: nurbs_geometry.py:831-870, get_normals)."""
    import jax

    P, W = unpack_pw(coeffs, aux)
    x = jnp.atleast_1d(x)
    y = jnp.atleast_1d(y)

    def residual(u, v):
        S = nurbs_eval(P, W, aux, u, v)
        return S[0] - x, S[1] - y

    u0, v0 = _param_guess(P, x, y)
    u, v = _newton_uv(residual, u0, v0)

    eval_uv = lambda uu, vv: nurbs_eval(P, W, aux, uu, vv)
    _, Su = jax.jvp(eval_uv, (u, v), (jnp.ones_like(u), jnp.zeros_like(v)))
    _, Sv = jax.jvp(eval_uv, (u, v), (jnp.zeros_like(u), jnp.ones_like(v)))
    nx = Su[1] * Sv[2] - Su[2] * Sv[1]
    ny = Su[2] * Sv[0] - Su[0] * Sv[2]
    nz = Su[0] * Sv[1] - Su[1] * Sv[0]
    mag = jnp.sqrt(nx**2 + ny**2 + nz**2)
    mag = jnp.where(mag == 0, 1.0, mag)
    nx, ny, nz = nx / mag, ny / mag, nz / mag
    # orient toward -z at the vertex, consistent with the other geometries
    flip = jnp.sign(jnp.where(nz == 0, 1.0, -nz))
    return nx * flip, ny * flip, nz * flip


def intersect(coeffs, aux, x, y, z, L, M, N):
    """Ray-surface distance AND unit normal from ONE two-plane parameter
    solve (reference: nurbs_geometry.py:763-870, after Martin et al.,
    "Practical ray tracing of trimmed NURBS surfaces").

    The trace step needs both t and the normal at the intersection; the
    converged (u, v) of the distance solve IS the intersection's
    parameter point, so the normal (cross product of the parametric
    tangents there) comes for free — running surface_normal separately
    would repeat the entire Newton solve on the same point."""
    import jax

    P, W = unpack_pw(coeffs, aux)
    mask = (L > M) & (L > N)
    hyp1 = jnp.sqrt(L**2 + M**2)
    hyp2 = jnp.sqrt(N**2 + M**2)
    hyp1 = jnp.where(hyp1 == 0, 1.0, hyp1)
    hyp2 = jnp.where(hyp2 == 0, 1.0, hyp2)
    N1x = jnp.where(mask, M / hyp1, 0.0)
    N1y = jnp.where(mask, -L / hyp1, N / hyp2)
    N1z = jnp.where(mask, 0.0, -M / hyp2)
    N2x = N1y * N - N1z * M
    N2y = N1z * L - N1x * N
    N2z = N1x * M - N1y * L
    d1 = -(N1x * x + N1y * y + N1z * z)
    d2 = -(N2x * x + N2y * y + N2z * z)

    def residual(u, v):
        S = nurbs_eval(P, W, aux, u, v)
        r1 = N1x * S[0] + N1y * S[1] + N1z * S[2] + d1
        r2 = N2x * S[0] + N2y * S[1] + N2z * S[2] + d2
        return r1, r2

    u0, v0 = _param_guess(P, x, y)
    u, v = _newton_uv(residual, u0, v0)
    S = nurbs_eval(P, W, aux, u, v)
    t = jnp.sqrt((S[0] - x) ** 2 + (S[1] - y) ** 2 + (S[2] - z) ** 2)

    eval_uv = lambda uu, vv: nurbs_eval(P, W, aux, uu, vv)
    _, Su = jax.jvp(eval_uv, (u, v), (jnp.ones_like(u), jnp.zeros_like(v)))
    _, Sv = jax.jvp(eval_uv, (u, v), (jnp.zeros_like(u), jnp.ones_like(v)))
    nx = Su[1] * Sv[2] - Su[2] * Sv[1]
    ny = Su[2] * Sv[0] - Su[0] * Sv[2]
    nz = Su[0] * Sv[1] - Su[1] * Sv[0]
    mag = jnp.sqrt(nx**2 + ny**2 + nz**2)
    mag = jnp.where(mag == 0, 1.0, mag)
    nx, ny, nz = nx / mag, ny / mag, nz / mag
    flip = jnp.sign(jnp.where(nz == 0, 1.0, -nz))
    return t, (nx * flip, ny * flip, nz * flip)


def distance(coeffs, aux, x, y, z, L, M, N):
    """Ray-surface distance via the two-plane formulation (see intersect)."""
    return intersect(coeffs, aux, x, y, z, L, M, N)[0]


# ---------------------------------------------------------------------------
# Build-time fitting (numpy; replicates the reference's A9.7 approximation)
# ---------------------------------------------------------------------------


def _basis_one(degree, knots, span, knot):
    """Single basis function N_{span,degree}(knot)
    (The NURBS Book A2.4; reference: nurbs_basis_functions.py basis_function_one)."""
    if (span == 0 and knot == knots[0]) or (
        span == len(knots) - degree - 2 and knot == knots[-1]
    ):
        return 1.0
    if knot < knots[span] or knot >= knots[span + degree + 1]:
        return 0.0
    N = [0.0] * (degree + 1)
    for j in range(degree + 1):
        if knots[span + j] <= knot < knots[span + j + 1]:
            N[j] = 1.0
    for k in range(1, degree + 1):
        saved = 0.0
        if N[0] != 0.0:
            saved = ((knot - knots[span]) * N[0]) / (
                knots[span + k] - knots[span]
            )
        for j in range(degree - k + 1):
            Uleft = knots[span + j + 1]
            Uright = knots[span + j + k + 1]
            if N[j + 1] == 0.0:
                N[j] = saved
                saved = 0.0
            else:
                temp = N[j + 1] / (Uright - Uleft)
                N[j] = saved + (Uright - knot) * temp
                saved = (knot - Uleft) * temp
    return N[0]


def _params_curve(points):
    """Chord-length parameters (The NURBS Book eq. 9.4-9.5)."""
    num = len(points)
    cds = [0.0] * (num + 1)
    cds[-1] = 1.0
    for i in range(1, num):
        cds[i] = float(np.linalg.norm(np.asarray(points[i]) - np.asarray(points[i - 1])))
    d = sum(cds[1:-1])
    return [sum(cds[: i + 1]) / d for i in range(num)]


def _params_surface(points, size_u, size_v):
    uk_temp = []
    for v in range(size_v):
        pts_u = [points[v + (size_v * u)] for u in range(size_u)]
        uk_temp += _params_curve(pts_u)
    uk = [
        sum(uk_temp[u + (size_u * v)] for v in range(size_v)) / size_v
        for u in range(size_u)
    ]
    vl_temp = []
    for u in range(size_u):
        pts_v = [points[v + (size_v * u)] for v in range(size_v)]
        vl_temp += _params_curve(pts_v)
    vl = [
        sum(vl_temp[v + (size_v * u)] for u in range(size_u)) / size_u
        for v in range(size_v)
    ]
    return uk, vl


def _knot_vector(degree, num_dpts, num_cpts, params):
    """Knot placement ensuring occupied spans (The NURBS Book eq. 9.68-9.69)."""
    kv = [0.0] * (degree + 1)
    d = float(num_dpts) / float(num_cpts - degree)
    for j in range(1, num_cpts - degree):
        i = int(j * d)
        alpha = (j * d) - i
        kv.append(((1.0 - alpha) * params[i - 1]) + (alpha * params[i]))
    kv += [1.0] * (degree + 1)
    return kv


def approximate_surface(points, size_u, size_v, degree_u, degree_v):
    """Global LSQ surface approximation (The NURBS Book A9.7;
    reference: nurbs_fitting.py:16-118). Returns (ctrlpts flat list,
    num_cpts_u, num_cpts_v, kv_u, kv_v)."""
    num_cpts_u = size_u - 1
    num_cpts_v = size_v - 1
    dim = len(points[0])
    uk, vl = _params_surface(points, size_u, size_v)
    kv_u = _knot_vector(degree_u, size_u, num_cpts_u, uk)
    kv_v = _knot_vector(degree_v, size_v, num_cpts_v, vl)

    Nu = np.array([
        [_basis_one(degree_u, kv_u, j, uk[i]) for j in range(1, num_cpts_u - 1)]
        for i in range(1, size_u - 1)
    ])
    NtNu = Nu.T @ Nu

    ctrl_tmp = [[0.0] * dim for _ in range(num_cpts_u * size_v)]
    for j in range(size_v):
        ctrl_tmp[j] = list(points[j])
        ctrl_tmp[j + size_v * (num_cpts_u - 1)] = list(
            points[j + size_v * (size_u - 1)]
        )
        pt0 = points[j]
        ptm = points[j + size_v * (size_u - 1)]
        rku = []
        for i in range(1, size_u - 1):
            ptk = points[j + size_v * i]
            n0p = _basis_one(degree_u, kv_u, 0, uk[i])
            nnp = _basis_one(degree_u, kv_u, num_cpts_u - 1, uk[i])
            rku.append([
                a - b * n0p - c * nnp
                for a, b, c in zip(ptk, pt0, ptm)
            ])
        ru = np.zeros((num_cpts_u - 2, dim))
        for i in range(1, num_cpts_u - 1):
            for idx, pt in enumerate(rku):
                b1 = _basis_one(degree_u, kv_u, i, uk[idx + 1])
                ru[i - 1] += np.asarray(pt) * b1
        x = np.linalg.solve(NtNu, ru)
        for i in range(1, num_cpts_u - 1):
            ctrl_tmp[j + size_v * i] = list(x[i - 1])

    Nv = np.array([
        [_basis_one(degree_v, kv_v, j, vl[i]) for j in range(1, num_cpts_v - 1)]
        for i in range(1, size_v - 1)
    ])
    NtNv = Nv.T @ Nv

    ctrlpts = [[0.0] * dim for _ in range(num_cpts_u * num_cpts_v)]
    for i in range(num_cpts_u):
        ctrlpts[num_cpts_v * i] = list(ctrl_tmp[size_v * i])
        ctrlpts[num_cpts_v - 1 + num_cpts_v * i] = list(
            ctrl_tmp[size_v - 1 + size_v * i]
        )
        pt0 = ctrl_tmp[size_v * i]
        ptm = ctrl_tmp[size_v - 1 + size_v * i]
        rkv = []
        for j in range(1, size_v - 1):
            ptk = ctrl_tmp[j + size_v * i]
            n0p = _basis_one(degree_v, kv_v, 0, vl[j])
            nnp = _basis_one(degree_v, kv_v, num_cpts_v - 1, vl[j])
            rkv.append([
                a - b * n0p - c * nnp
                for a, b, c in zip(ptk, pt0, ptm)
            ])
        rv = np.zeros((num_cpts_v - 2, dim))
        for j in range(1, num_cpts_v - 1):
            for idx, pt in enumerate(rkv):
                b1 = _basis_one(degree_v, kv_v, j, vl[idx + 1])
                rv[j - 1] += np.asarray(pt) * b1
        xsol = np.linalg.solve(NtNv, rv)
        for j in range(1, num_cpts_v - 1):
            ctrlpts[j + num_cpts_v * i] = list(xsol[j - 1])

    return ctrlpts, num_cpts_u, num_cpts_v, kv_u, kv_v


def clamped_knots(degree: int, n_ctrl: int):
    """Uniform clamped knot vector (reference: nurbs_geometry.py:133-147)."""
    interior = np.linspace(0, 1, n_ctrl - degree + 1)
    return tuple(
        [0.0] * degree + list(interior) + [1.0] * degree
    )


def build_nurbs_def(
    radius=np.inf,
    conic=0.0,
    control_points=None,
    weights=None,
    u_degree=None,
    v_degree=None,
    u_knots=None,
    v_knots=None,
    nurbs_norm_x=None,
    nurbs_norm_y=None,
    x_center=0.0,
    y_center=0.0,
    n_points_u: int = 5,
    n_points_v: int = 5,
):
    """Resolve the reference's NURBS construction modes into
    (coeffs_flat, aux) (reference: nurbs_geometry.py:84-330).

    Modes: explicit control points (Bezier / B-Spline / full NURBS), or a
    base-conic fit over the normalization rectangle (A9.7 approximation).
    """
    norm_x = 1.0 if nurbs_norm_x is None else float(nurbs_norm_x)
    norm_y = 1.0 if nurbs_norm_y is None else float(nurbs_norm_y)
    if control_points is None:
        # Fit the base conic (reference: nurbs_geometry.py:868-940)
        size_u = n_points_u + 1
        size_v = n_points_v + 1
        xs = np.linspace(x_center - norm_x, x_center + norm_x, size_u)
        ys = np.linspace(y_center - norm_y, y_center + norm_y, size_v)
        X, Y = np.meshgrid(xs, ys)
        if np.isinf(radius):
            Z = np.zeros_like(X)
        else:
            r2 = X**2 + Y**2
            Z = r2 / (radius * (1 + np.sqrt(1 - (1 + conic) * r2 / radius**2)))
        pts = np.stack([X.T, Y.T, Z.T], axis=0)
        xp = pts.reshape(3, -1).T.tolist()
        deg = 3
        ctrl, ncu, ncv, kv_u, kv_v = approximate_surface(
            xp, size_u, size_v, deg, deg
        )
        P = np.asarray(ctrl).T.reshape(3, ncu, ncv)
        W = np.ones((ncu, ncv))
        u_degree = v_degree = deg
        u_knots = tuple(kv_u)
        v_knots = tuple(kv_v)
    else:
        P = np.asarray(control_points, float)
        ncu, ncv = P.shape[1], P.shape[2]
        if weights is None and u_degree is None and u_knots is None:
            # Bezier: degree = count - 1
            u_degree, v_degree = ncu - 1, ncv - 1
        if u_degree is None:
            u_degree = 3
        if v_degree is None:
            v_degree = 3
        if u_knots is None:
            u_knots = clamped_knots(u_degree, ncu)
        else:
            u_knots = tuple(float(k) for k in np.asarray(u_knots).ravel())
        if v_knots is None:
            v_knots = clamped_knots(v_degree, ncv)
        else:
            v_knots = tuple(float(k) for k in np.asarray(v_knots).ravel())
        W = (
            np.ones((ncu, ncv)) if weights is None
            else np.asarray(weights, float)
        )
    coeffs = np.concatenate([P.ravel(), W.ravel()])
    aux = ("nurbs", int(P.shape[1]), int(P.shape[2]), int(u_degree),
           int(v_degree), tuple(u_knots), tuple(v_knots))
    return coeffs, aux
