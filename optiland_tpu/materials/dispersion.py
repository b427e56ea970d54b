"""Dispersion formula evaluation as pure JAX functions.

Implements the nine refractiveindex.info dispersion formulas plus constant
and tabulated index models, each as a pure function of a fixed-width,
zero-padded coefficient vector and wavelength array. The fixed-width layout
lets a heterogeneous stack of surfaces evaluate per-surface refractive
indices inside a ``lax.scan`` trace loop via ``lax.switch`` on a formula
code — the TPU-native replacement for the reference's per-material Python
method dispatch (reference: optiland/materials/material_file.py:250-445).

Formula conventions follow the public refractiveindex.info database
documentation (Dispersion formulas.pdf): formula 1/2 Sellmeier (with/without
squared C-terms), 3 polynomial, 4 RefractiveIndex.INFO, 5 Cauchy, 6 gases,
7 Herzberger, 8 retro, 9 exotic.

All formulas are written so that zero-padded coefficient entries contribute
exactly zero, making a single padded coefficient vector valid for every
material.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

# Width of the padded coefficient vector. The largest coefficient count in
# the refractiveindex.info snapshot is 17; pad to 20 for headroom.
MAX_COEFFS = 20

# Formula codes (stable; serialized into system pytrees)
CONST_N = 0  # coeffs[0] = constant n
FORMULA_1 = 1
FORMULA_2 = 2
FORMULA_3 = 3
FORMULA_4 = 4
FORMULA_5 = 5
FORMULA_6 = 6
FORMULA_7 = 7
FORMULA_8 = 8
FORMULA_9 = 9
TABULATED_N = 10  # interpolated from a wavelength/index table
BUCHDAHL = 11  # coeffs = [n_ref, v1, v2, v3, wave_ref, alpha]

NUM_FORMULAS = 12

_FORMULA_NAME_TO_CODE = {
    "constant": CONST_N,
    "formula 1": FORMULA_1,
    "formula 2": FORMULA_2,
    "formula 3": FORMULA_3,
    "formula 4": FORMULA_4,
    "formula 5": FORMULA_5,
    "formula 6": FORMULA_6,
    "formula 7": FORMULA_7,
    "formula 8": FORMULA_8,
    "formula 9": FORMULA_9,
    "tabulated n": TABULATED_N,
    "tabulated nk": TABULATED_N,
}


def formula_code(name: str) -> int:
    """Map a refractiveindex.info formula-type string to its integer code."""
    return _FORMULA_NAME_TO_CODE[name]


def pad_coefficients(coeffs) -> jnp.ndarray:
    """Zero-pad a coefficient list to the fixed MAX_COEFFS width."""
    c = jnp.zeros((MAX_COEFFS,), dtype=jnp.result_type(float))
    coeffs = jnp.asarray(coeffs, dtype=c.dtype)
    if coeffs.size > MAX_COEFFS:
        raise ValueError(f"Too many coefficients ({coeffs.size} > {MAX_COEFFS})")
    return c.at[: coeffs.size].set(coeffs)


def _pairs(c):
    """Split padded coefficients into (c0, B, C) with B/C the odd/even tail."""
    # c[1::2] pairs with c[2::2]; zero-padded pairs contribute zero terms.
    B, C = c[1::2], c[2::2]
    m = min(B.shape[0], C.shape[0])
    return c[0], B[:m], C[:m]


def _const_n(c, w):
    return c[0] * jnp.ones_like(w)


def _formula_1(c, w):
    """Sellmeier: n^2 = 1 + c0 + sum B_k w^2 / (w^2 - C_k^2)."""
    c0, B, C = _pairs(c)
    w2 = w[..., None] ** 2
    n2 = 1 + c0 + jnp.sum(B * w2 / (w2 - C**2), axis=-1)
    return jnp.sqrt(n2)


def _formula_2(c, w):
    """Sellmeier-2: n^2 = 1 + c0 + sum B_k w^2 / (w^2 - C_k)."""
    c0, B, C = _pairs(c)
    w2 = w[..., None] ** 2
    n2 = 1 + c0 + jnp.sum(B * w2 / (w2 - C), axis=-1)
    return jnp.sqrt(n2)


def _poly_sum(c, w):
    """c0 + sum B_k w^{C_k} with zero-padded terms contributing zero."""
    c0, B, C = _pairs(c)
    wb = w[..., None]
    # 0 * w^0 = 0, so padded terms vanish. w may be 0 only for w=0 queries,
    # which are not physical.
    return c0 + jnp.sum(B * wb**C, axis=-1)


def _formula_3(c, w):
    """Polynomial: n^2 = c0 + sum B_k w^{C_k}."""
    return jnp.sqrt(_poly_sum(c, w))


def _formula_4(c, w):
    """RefractiveIndex.INFO formula."""
    wb = w[..., None]
    w2 = w**2
    n2 = (
        c[0]
        + c[1] * w ** c[2] / (w2 - c[3] ** c[4])
        + c[5] * w ** c[6] / (w2 - c[7] ** c[8])
    )
    B, C = c[9::2], c[10::2]
    m = min(B.shape[0], C.shape[0])
    n2 = n2 + jnp.sum(B[:m] * wb ** C[:m], axis=-1)
    return jnp.sqrt(n2)


def _formula_5(c, w):
    """Cauchy: n = c0 + sum B_k w^{C_k}."""
    return _poly_sum(c, w)


def _formula_6(c, w):
    """Gases: n = 1 + c0 + sum B_k / (C_k - w^-2)."""
    c0, B, C = _pairs(c)
    winv2 = w[..., None] ** -2
    # Padded B=0 terms vanish; C=0 gives -B/w^-2 which is 0 when B=0.
    return 1 + c0 + jnp.sum(B / (C - winv2), axis=-1)


def _formula_7(c, w):
    """Herzberger: n = c0 + c1/(w^2-0.028) + c2/(w^2-0.028)^2 + sum c_k w^{2(k-2)}."""
    w2 = w**2
    inv = 1.0 / (w2 - 0.028)
    n = c[0] + c[1] * inv + c[2] * inv**2
    tail = c[3:]
    k = jnp.arange(3, 3 + tail.shape[0])
    exps = 2 * (k - 2)
    n = n + jnp.sum(tail * w[..., None] ** exps, axis=-1)
    return n


def _formula_8(c, w):
    """Retro: b = c0 + c1 w^2/(w^2-c2) + c3 w^2; n = sqrt((1+2b)/(1-b))."""
    w2 = w**2
    b = c[0] + c[1] * w2 / (w2 - c[2]) + c[3] * w2
    return jnp.sqrt((1 + 2 * b) / (1 - b))


def _formula_9(c, w):
    """Exotic: n^2 = c0 + c1/(w^2-c2) + c3 (w-c4)/((w-c4)^2 + c5)."""
    w2 = w**2
    n2 = c[0] + c[1] / (w2 - c[2]) + c[3] * (w - c[4]) / ((w - c[4]) ** 2 + c[5])
    return jnp.sqrt(n2)


def _buchdahl(c, w):
    """Buchdahl 3-term model: n = n_ref + v1 w + v2 w^2 + v3 w^3 with
    w the Buchdahl coordinate (lambda-lambda_ref)/(1+alpha(lambda-lambda_ref))."""
    n_ref, v1, v2, v3, wave_ref, alpha = c[0], c[1], c[2], c[3], c[4], c[5]
    d = w - wave_ref
    om = d / (1 + alpha * d)
    return n_ref + v1 * om + v2 * om**2 + v3 * om**3


# Branch table indexed by formula code. TABULATED_N has no closed form; its
# branch returns NaN and callers with tables must use n_from_table instead.
_BRANCHES = [
    _const_n,
    _formula_1,
    _formula_2,
    _formula_3,
    _formula_4,
    _formula_5,
    _formula_6,
    _formula_7,
    _formula_8,
    _formula_9,
    lambda c, w: jnp.full_like(w, jnp.nan),
    _buchdahl,
]


def n_formula_static(code: int, coeffs, w):
    """Evaluate refractive index with a *static* formula code (no lax.switch).

    Used inside the unrolled trace loop where formula codes are part of the
    static system structure — the branch resolves at trace time so XLA sees
    a pure elementwise expression.
    """
    return _BRANCHES[code](coeffs, jnp.asarray(w))


def n_from_formula(code, coeffs, w):
    """Evaluate refractive index for a single (code, padded-coeffs) material.

    Args:
        code: integer formula code (traced or static).
        coeffs: (MAX_COEFFS,) zero-padded coefficient vector.
        w: wavelength array in micrometers.

    Returns:
        Refractive index array with the shape of ``w``.
    """
    w = jnp.asarray(w)
    scalar = w.ndim == 0
    wv = jnp.atleast_1d(w)
    # lax.switch requires identical branch output dtypes; with mixed-dtype
    # inputs (e.g. f32 rays against f64 coefficient tables under x64) the
    # coeff-only and wavelength-dependent branches would disagree — promote
    # the wavelength to the common dtype first.
    wv = wv.astype(jnp.result_type(coeffs, wv))
    out = lax.switch(jnp.asarray(code, jnp.int32), _BRANCHES, coeffs, wv)
    return out[0] if scalar else out


def n_from_table(table_w, table_n, w):
    """Interpolate tabulated refractive index data.

    ``table_w`` must be sorted ascending; padding entries (repeats of the
    last wavelength) are benign because jnp.interp clamps at the edges.
    """
    return jnp.interp(w, table_w, table_n)


def k_from_table(table_w, table_k, w):
    """Interpolate tabulated extinction-coefficient data."""
    return jnp.interp(w, table_w, table_k)


def n_formula_scalar_terms(code: int, cv, w):
    """Kernel-friendly variant of :func:`n_formula_static`.

    ``cv`` is a Python sequence of scalar values (e.g. SMEM reads inside a
    Pallas kernel); every per-term reduction runs as a Python loop so no
    intermediate exceeds ``w``'s rank — the vectorized formulas broadcast
    ``w[..., None]`` against coefficient vectors, producing 3-D tensors
    that Mosaic cannot lower ("Only 2D gather is supported").

    Zero-padded trailing coefficients contribute exactly zero terms, as in
    the vectorized forms.
    """
    cv = list(cv)

    def pairs():
        B, C = cv[1::2], cv[2::2]
        m = min(len(B), len(C))
        return cv[0], B[:m], C[:m]

    w2 = w * w
    if code == 0:  # constant
        return cv[0] * jnp.ones_like(w)
    if code == 1:  # Sellmeier
        c0, B, C = pairs()
        n2 = 1 + c0 * jnp.ones_like(w)
        for b, c in zip(B, C):
            n2 = n2 + b * w2 / (w2 - c * c)
        return jnp.sqrt(n2)
    if code == 2:  # Sellmeier-2
        c0, B, C = pairs()
        n2 = 1 + c0 * jnp.ones_like(w)
        for b, c in zip(B, C):
            n2 = n2 + b * w2 / (w2 - c)
        return jnp.sqrt(n2)
    if code in (3, 5):  # polynomial (sqrt) / Cauchy (plain)
        c0, B, C = pairs()
        acc = c0 * jnp.ones_like(w)
        for b, c in zip(B, C):
            acc = acc + b * w**c
        return jnp.sqrt(acc) if code == 3 else acc
    if code == 4:  # RefractiveIndex.INFO formula 4
        n2 = (
            cv[0]
            + cv[1] * w ** cv[2] / (w2 - cv[3] ** cv[4])
            + cv[5] * w ** cv[6] / (w2 - cv[7] ** cv[8])
        )
        B, C = cv[9::2], cv[10::2]
        for b, c in zip(B, C):
            n2 = n2 + b * w**c
        return jnp.sqrt(n2)
    if code == 6:  # gases
        c0, B, C = pairs()
        winv2 = 1.0 / w2
        n = 1 + c0 * jnp.ones_like(w)
        for b, c in zip(B, C):
            n = n + b / (c - winv2)
        return n
    if code == 7:  # Herzberger
        inv = 1.0 / (w2 - 0.028)
        n = cv[0] + cv[1] * inv + cv[2] * inv**2
        for k, c in enumerate(cv[3:], start=3):
            n = n + c * w ** (2 * (k - 2))
        return n
    if code == 8:  # retro
        b = cv[0] + cv[1] * w2 / (w2 - cv[2]) + cv[3] * w2
        return jnp.sqrt((1 + 2 * b) / (1 - b))
    if code == 9:  # exotic
        n2 = (
            cv[0] + cv[1] / (w2 - cv[2])
            + cv[3] * (w - cv[4]) / ((w - cv[4]) ** 2 + cv[5])
        )
        return jnp.sqrt(n2)
    if code == 11:  # Buchdahl
        n_ref, v1, v2, v3, wave_ref, alpha = cv[:6]
        d = w - wave_ref
        om = d / (1 + alpha * d)
        return n_ref + v1 * om + v2 * om**2 + v3 * om**3
    raise NotImplementedError(f"formula code {code} has no scalar-term form")
