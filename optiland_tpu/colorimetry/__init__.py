"""Colorimetry: CIE tristimulus integration and sRGB conversion.

Vectorized jnp implementations of the reference's colorimetry engine
(reference: optiland/colorimetry/core.py:1-263, constants.py). The CIE
observer functions and D65 illuminant are the standard public CIE datasets
sampled at 1 nm (380-780 nm), frozen in colorimetric_data_1nm.json.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np

_DATA = json.loads(
    (Path(__file__).with_name("colorimetric_data_1nm.json")).read_text()
)

WAVELENGTHS_STD = [int(w) for w in _DATA["WAVELENGTHS_STD"]]
ILLUMINANT_D65 = [float(v) for v in _DATA["ILLUMINANT_D65"]]
CIE_1931_2DEG = [tuple(float(v) for v in row) for row in _DATA["CIE_1931_2DEG"]]
CIE_1964_10DEG = [
    tuple(float(v) for v in row) for row in _DATA["CIE_1964_10DEG"]
]

_WL_STD = np.asarray(WAVELENGTHS_STD, float)
_D65 = np.asarray(ILLUMINANT_D65, float)
_CMF = {
    "2deg": np.asarray(CIE_1931_2DEG, float),
    "10deg": np.asarray(CIE_1964_10DEG, float),
}


def _cubic_interp(x, y, xq):
    """Natural cubic-spline interpolation with flat extrapolation,
    matching scipy.interpolate.interp1d(kind='cubic') on interior points
    (reference: core.py:24-41)."""
    from scipy.interpolate import interp1d

    f = interp1d(
        np.asarray(x, float), np.asarray(y, float), kind="cubic",
        bounds_error=False,
        fill_value=(float(np.asarray(y)[0]), float(np.asarray(y)[-1])),
    )
    return f(np.asarray(xq, float))


def _extract_xyz(X, Y=None, Z=None):
    """(X, Y, Z) from separate args or one packed array with a size-3 axis
    (reference: core.py:44-85)."""
    if Y is None and Z is None:
        arr = jnp.asarray(X)
        if arr.ndim == 0:
            raise ValueError("Scalar input requires X, Y, Z arguments")
        if arr.shape[-1] == 3:
            return arr[..., 0], arr[..., 1], arr[..., 2]
        if arr.shape[0] == 3:
            return arr[0], arr[1], arr[2]
        for i, dim in enumerate(arr.shape):
            if dim == 3:
                return (
                    jnp.take(arr, 0, axis=i),
                    jnp.take(arr, 1, axis=i),
                    jnp.take(arr, 2, axis=i),
                )
        raise ValueError(
            "Input array must have a dimension of size 3 representing X, Y, Z"
        )
    return jnp.asarray(X), jnp.asarray(Y), jnp.asarray(Z)


def spectrum_to_xyz(wavelengths, values, illuminant=None, observer="2deg"):
    """CIE XYZ of a reflectance/transmittance spectrum (wavelengths in nm;
    Y=100 for a perfect white) (reference: core.py:88-160)."""
    wavelengths = np.asarray(wavelengths, float)
    if wavelengths.min() > _WL_STD[0] or wavelengths.max() < _WL_STD[-1]:
        raise ValueError(
            f"Input spectrum range ({wavelengths.min():.1f}-"
            f"{wavelengths.max():.1f} nm) does not cover the required "
            f"visible range ({int(_WL_STD[0])}-{int(_WL_STD[-1])} nm)."
        )
    cmf = _CMF["10deg" if observer == "10deg" else "2deg"]
    S = _D65 if illuminant is None else np.asarray(illuminant, float)
    if len(S) != len(_WL_STD):
        raise ValueError(
            "Illuminant must have the same size as WAVELENGTHS_STD "
            f"({len(_WL_STD)})"
        )
    r = _cubic_interp(wavelengths, np.asarray(values, float), _WL_STD)
    d_lambda = float(_WL_STD[1] - _WL_STD[0])
    X = float(np.sum(r * S * cmf[:, 0]) * d_lambda)
    Y = float(np.sum(r * S * cmf[:, 1]) * d_lambda)
    Z = float(np.sum(r * S * cmf[:, 2]) * d_lambda)
    k_sum = float(np.sum(S * cmf[:, 1]) * d_lambda)
    k = 100.0 / k_sum if k_sum != 0 else 0.0
    return (X * k, Y * k, Z * k)


def xyz_to_xyY(X, Y=None, Z=None):
    """XYZ -> chromaticity + luminance (reference: core.py:163-185)."""
    X, Y, Z = _extract_xyz(X, Y, Z)
    total = X + Y + Z
    mask = jnp.abs(total) == 0
    safe = jnp.where(mask, 1.0, total)
    x = jnp.where(mask, 0.3127, X / safe)
    y = jnp.where(mask, 0.3290, Y / safe)
    return x, y, Y


def xyz_to_srgb_linear(X, Y=None, Z=None):
    """XYZ (Y=100 white) -> linear sRGB in [0, 1] before gamma."""
    X, Y, Z = _extract_xyz(X, Y, Z)
    Xn, Yn, Zn = X / 100.0, Y / 100.0, Z / 100.0
    r = 3.2404542 * Xn - 1.5371385 * Yn - 0.4985314 * Zn
    g = -0.9692660 * Xn + 1.8760108 * Yn + 0.0415560 * Zn
    b = 0.0556434 * Xn - 0.2040259 * Yn + 1.0572252 * Zn
    return r, g, b


def _gamma(v):
    v_safe = jnp.where(v < 0.0, 0.0, v)
    return jnp.where(
        v <= 0.0031308, 12.92 * v, 1.055 * v_safe ** (1 / 2.4) - 0.055
    )


def xyz_to_srgb(X, Y=None, Z=None):
    """XYZ (Y=100 white) -> 8-bit sRGB with IEC 61966-2-1 gamma
    (reference: core.py:188-263)."""
    r, g, b = xyz_to_srgb_linear(X, Y, Z)

    def finish(v):
        v = _gamma(v)
        return (jnp.clip(v, 0.0, 1.0) * 255).astype(int)

    return finish(r), finish(g), finish(b)


def plot_cie_1931_chromaticity_diagram(points=None, labels=None, ax=None):
    """Spectral-locus chromaticity diagram with optional sample points
    (reference: colorimetry/plotting.py:37-200, simplified rendering)."""
    import matplotlib.pyplot as plt

    if ax is None:
        _, ax = plt.subplots(figsize=(6, 6))
    cmf = _CMF["2deg"]
    total = cmf.sum(axis=1)
    ok = total > 0
    xs = cmf[ok, 0] / total[ok]
    ys = cmf[ok, 1] / total[ok]
    ax.plot(np.append(xs, xs[0]), np.append(ys, ys[0]), "k-", lw=1)
    if points is not None:
        for i, (px, py) in enumerate(points):
            ax.plot(px, py, "o", ms=6)
            if labels is not None and i < len(labels):
                ax.annotate(labels[i], (px, py), fontsize=8)
    ax.set_xlabel("x")
    ax.set_ylabel("y")
    ax.set_title("CIE 1931 chromaticity diagram")
    ax.set_xlim(0, 0.8)
    ax.set_ylim(0, 0.9)
    return ax


__all__ = [
    "WAVELENGTHS_STD",
    "ILLUMINANT_D65",
    "CIE_1931_2DEG",
    "CIE_1964_10DEG",
    "spectrum_to_xyz",
    "xyz_to_xyY",
    "xyz_to_srgb",
    "xyz_to_srgb_linear",
    "plot_cie_1931_chromaticity_diagram",
]
