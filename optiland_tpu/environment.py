"""Air refractive-index models: Ciddor, Edlen, Birch-Downs, Kohlrausch.

Pure jnp-compatible implementations following the reference's formulas
(reference: optiland/environment/conditions.py:19-40, air_index.py:30,
models/ciddor.py, edlen.py, birch_downs.py, kohlrausch.py; originals from
Ciddor 1996, Edlen 1966 with NIST corrections, Birch & Downs 1994, and the
OpticStudio Kohlrausch variant).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass
class EnvironmentalConditions:
    """Atmospheric conditions (reference: environment/conditions.py:19)."""

    temperature: float = 20.0  # Celsius
    pressure: float = 101325.0  # Pa
    relative_humidity: float = 0.0  # 0..1
    co2_ppm: float = 450.0

    def to_dict(self):
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d):
        return cls(**d)


# ---------------------------------------------------------------------------
# Ciddor (1996)
# ---------------------------------------------------------------------------

_R = 8.314510
_M_W = 0.018015


def _ciddor_svp(t_c):
    t_k = t_c + 273.15
    above = jnp.exp(
        1.2378847e-5 * t_k**2 - 1.9121316e-2 * t_k + 33.93711047 - 6.3431645e3 / t_k
    )
    below = 10.0 ** (-2663.5 / t_k + 12.537)
    return jnp.where(jnp.asarray(t_c) >= 0, above, below)


def _ciddor_enhancement(p_pa, t_c):
    return 1.00062 + 3.14e-8 * p_pa + 5.6e-7 * t_c**2


def _ciddor_compressibility(p_pa, t_k, xw):
    t_c = t_k - 273.15
    term1 = 1.58123e-6 + (-2.9331e-8) * t_c + 1.1043e-10 * t_c**2
    term2 = (5.707e-6 + (-2.051e-8) * t_c) * xw
    term3 = (1.9898e-4 + (-2.376e-6) * t_c) * xw**2
    term4 = 1.83e-11 + (-0.765e-8) * xw**2
    return (
        1.0 - (p_pa / t_k) * (term1 + term2 + term3) + (p_pa / t_k) ** 2 * term4
    )


def ciddor_refractive_index(wavelength_um, conditions: EnvironmentalConditions):
    """Ciddor (1996) phase index of moist air
    (reference: environment/models/ciddor.py:184)."""
    sigma_sq = (1.0 / jnp.asarray(wavelength_um)) ** 2
    n_as = 1e-8 * (5792105.0 / (238.0185 - sigma_sq) + 167917.0 / (57.362 - sigma_sq))
    n_axs = n_as * (1.0 + 0.534e-6 * (conditions.co2_ppm - 450.0))
    n_ws = 1e-8 * 1.022 * (
        295.235 + 2.6422 * sigma_sq - 0.032380 * sigma_sq**2 + 0.004028 * sigma_sq**3
    )
    m_a = 1e-3 * (28.9635 + 12.011e-6 * (conditions.co2_ppm - 400.0))
    z_axs = _ciddor_compressibility(101325.0, 288.15, 0.0)
    rho_axs = (101325.0 * m_a) / (z_axs * _R * 288.15)
    rho_ws = (1333.0 * _M_W) / (
        _ciddor_compressibility(1333.0, 293.15, 1.0) * _R * 293.15
    )
    t_c = conditions.temperature
    p_pa = conditions.pressure
    t_k = t_c + 273.15
    svp = _ciddor_svp(t_c)
    f = _ciddor_enhancement(p_pa, t_c)
    xw = f * conditions.relative_humidity * svp / p_pa if p_pa > 0 else 0.0
    z = _ciddor_compressibility(p_pa, t_k, xw)
    rho_a = (p_pa * m_a * (1.0 - xw)) / (z * _R * t_k)
    rho_w = (p_pa * _M_W * xw) / (z * _R * t_k)
    return 1.0 + (rho_a / rho_axs) * n_axs + (rho_w / rho_ws) * n_ws


# ---------------------------------------------------------------------------
# Edlen (1966) with NIST temperature correction
# ---------------------------------------------------------------------------

_TORR = 101325.0 / 760.0


def edlen_refractive_index(wavelength_um, conditions: EnvironmentalConditions):
    """Edlen (1966) index of air (reference: environment/models/edlen.py:83)."""
    sigma_sq = (1.0 / jnp.asarray(wavelength_um)) ** 2
    n_s = 1.0e-8 * (
        8342.13 + 2406030.0 / (130.0 - sigma_sq) + 15997.0 / (38.9 - sigma_sq)
    )
    n_s = n_s * (1.0 + 0.540 * (conditions.co2_ppm - 300.0) * 1.0e-6)
    p_torr = conditions.pressure / _TORR
    t_c = conditions.temperature
    density = (p_torr * (1.0 + p_torr * (0.817 - 0.0133 * t_c) * 1.0e-6)) / (
        1.0 + 0.0036710 * t_c
    )
    n_tp = n_s * (density / 720.775)
    svp_pa = 611.21 * jnp.exp(
        (18.678 - t_c / 234.5) * (t_c / (257.14 + t_c))
    )
    f_torr = conditions.relative_humidity * svp_pa / _TORR
    wv = -f_torr * (5.722 - 0.0457 * sigma_sq) * 1.0e-8
    wv = wv * (292.75 / (t_c + 273.15))
    return 1.0 + n_tp + wv


# ---------------------------------------------------------------------------
# Birch & Downs (1994)
# ---------------------------------------------------------------------------


def birch_downs_refractive_index(wavelength_um, conditions: EnvironmentalConditions):
    """Birch & Downs (1994) updated Edlen equation
    (reference: environment/models/birch_downs.py:118)."""
    sigma_sq = (1.0 / jnp.asarray(wavelength_um)) ** 2
    n_s = 1.0e-8 * (
        8342.54 + 2406147.0 / (130.0 - sigma_sq) + 15998.0 / (38.9 - sigma_sq)
    )
    n_as = n_s * (1.0 + 0.534e-6 * (conditions.co2_ppm - 450.0))
    t_c = conditions.temperature
    p_pa = conditions.pressure
    density = (p_pa / 96095.43) * (
        (1 + 1e-8 * (0.601 - 0.00972 * t_c) * p_pa) / (1 + 0.003661 * t_c)
    )
    n_tp = n_as * density
    t_k = t_c + 273.15
    svp = jnp.exp(
        1.2378847e-5 * t_k**2 - 1.9121316e-2 * t_k + 33.93711047 - 6.3431645e3 / t_k
    )
    f_w = 1.00062 + 3.14e-8 * p_pa + 5.6e-7 * t_c**2
    f_pa = conditions.relative_humidity * f_w * svp
    wv = -f_pa * (3.7345 - 0.0401 * sigma_sq) * 1.0e-10
    wv = wv * (292.75 / t_k)
    return 1.0 + n_tp + wv


# ---------------------------------------------------------------------------
# Kohlrausch (OpticStudio variant, dry air)
# ---------------------------------------------------------------------------


def kohlrausch_refractive_index(wavelength_um, conditions: EnvironmentalConditions):
    """OpticStudio's Kohlrausch dry-air model
    (reference: environment/models/kohlrausch.py:48)."""
    sigma_sq = (1.0 / jnp.asarray(wavelength_um)) ** 2
    n_ref = 1.0e-5 * (
        64.328 + 29498.1 / (146.0 - sigma_sq) + 25.54 / (41.0 - sigma_sq)
    )
    rel_p = conditions.pressure / 101325.0
    denom = 1.0 + (conditions.temperature - 15.0) * 0.00348
    return 1.0 + (n_ref * rel_p) / denom


_MODELS = {
    "ciddor": ciddor_refractive_index,
    "edlen": edlen_refractive_index,
    "birch_downs": birch_downs_refractive_index,
    "kohlrausch": kohlrausch_refractive_index,
}


def refractive_index_air(wavelength_um, conditions: EnvironmentalConditions,
                         model: str = "ciddor"):
    """Dispatch to an air-index model (reference: environment/air_index.py:30)."""
    if not isinstance(conditions, EnvironmentalConditions):
        raise TypeError(
            "Input 'conditions' must be an instance of EnvironmentalConditions."
        )
    fn = _MODELS.get(model.lower())
    if fn is None:
        raise ValueError(
            f"Unsupported air refractive index model: {model}. "
            "Supported models are: 'ciddor', 'edlen', 'birch_downs', 'kohlrausch'."
        )
    return fn(wavelength_um, conditions)
