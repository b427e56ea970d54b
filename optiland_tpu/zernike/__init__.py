"""Zernike polynomials: standard (OSA/ANSI), fringe, and Noll schemes.

Vectorized JAX implementation following Niu & Tian (2022), J. Opt. 24 123001
(the same formulation as the reference: optiland/zernike/base.py:26,
standard.py:23, fringe.py:21, noll.py:24, fit.py:33). Radial polynomial
coefficients are precomputed per (n, m) in NumPy (static), so evaluation is
a pure jnp expression — differentiable and jit-safe for use in Zernike-sag
geometry and wavefront fitting.
"""

from __future__ import annotations

from math import factorial

import jax.numpy as jnp
import numpy as np


def _radial_coeff_table(n: int, m: int):
    """Powers and coefficients of the radial polynomial R_n^|m|(r)."""
    m = abs(m)
    s_max = (n - m) // 2 + 1
    powers, coeffs = [], []
    for k in range(s_max):
        c = (-1) ** k * factorial(n - k) / (
            factorial(k) * factorial((n + m) // 2 - k) * factorial((n - m) // 2 - k)
        )
        powers.append(n - 2 * k)
        coeffs.append(c)
    return powers, coeffs


def radial_term(n: int, m: int, r):
    """R_n^|m|(r) evaluated with static coefficients."""
    powers, coeffs = _radial_coeff_table(n, m)
    val = jnp.zeros_like(jnp.asarray(r, dtype=jnp.result_type(float)))
    for p, c in zip(powers, coeffs):
        val = val + c * jnp.asarray(r) ** p
    return val


def radial_derivative(n: int, m: int, r):
    """dR_n^|m|/dr with static coefficients."""
    powers, coeffs = _radial_coeff_table(n, m)
    val = jnp.zeros_like(jnp.asarray(r, dtype=jnp.result_type(float)))
    for p, c in zip(powers, coeffs):
        if p > 0:
            val = val + c * p * jnp.asarray(r) ** (p - 1)
    return val


def azimuthal_term(m: int, phi):
    """cos(m phi) for m >= 0, sin(|m| phi) for m < 0."""
    if m >= 0:
        return jnp.cos(m * jnp.asarray(phi))
    return jnp.sin(abs(m) * jnp.asarray(phi))


class BaseZernike:
    """Zernike polynomial set over unit-disk coordinates (r, phi)."""

    _indices_cache: dict[int, list] = {}

    def __init__(self, coeffs=None, num_terms: int = 36):
        if coeffs is None:
            coeffs = jnp.zeros((num_terms,))
        self.coeffs = jnp.atleast_1d(jnp.asarray(coeffs, jnp.result_type(float)))
        self.indices = self._generate_indices(self.coeffs.shape[0])

    # -- scheme-specific -------------------------------------------------
    @staticmethod
    def _index_to_number(n: int, m: int):
        raise NotImplementedError

    @staticmethod
    def _norm_constant(n: int, m: int) -> float:
        raise NotImplementedError

    # --------------------------------------------------------------------
    @classmethod
    def _generate_indices(cls, n_indices: int):
        """(n, m) pairs sorted by the scheme's coefficient numbering
        (reference: zernike/base.py:139-186)."""
        cache = cls._indices_cache.setdefault(cls.__name__, [])
        if len(cache) >= n_indices:
            return cache[:n_indices]

        numbers_present = [cls._index_to_number(0, 0) != 0] + [False] * n_indices
        number, indices = [], []
        n, m = 0, 0
        m = -n
        while not all(numbers_present):
            num = cls._index_to_number(n, m)
            if num is not None:
                number.append(num)
                indices.append((n, m))
                if num <= n_indices:
                    numbers_present[num] = True
            if m == n:
                n += 1
                m = -n
            else:
                m += 1
        indices_sorted = [e for _, e in sorted(zip(number, indices))][:n_indices]
        cls._indices_cache[cls.__name__] = indices_sorted
        return indices_sorted

    def get_term(self, coeff, n: int, m: int, r, phi):
        return (
            coeff
            * self._norm_constant(n, m)
            * radial_term(n, m, r)
            * azimuthal_term(m, phi)
        )

    def terms(self, r=0, phi=0):
        return [
            self.get_term(c, n, m, r, phi)
            for c, (n, m) in zip(self.coeffs, self.indices)
        ]

    def poly(self, r=0, phi=0):
        """Sum of all terms at (r, phi)."""
        total = jnp.zeros_like(jnp.asarray(r, dtype=self.coeffs.dtype) + jnp.asarray(phi))
        for t in self.terms(r, phi):
            total = total + t
        return total

    def get_derivative(self, n: int, m: int, r, phi):
        """(dZ/dr, dZ/dphi) of one (unnormalized-coefficient) term
        (reference: zernike/base.py:103-137)."""
        rt = radial_term(n, abs(m), r)
        rd = radial_derivative(n, abs(m), r)
        if m == 0:
            return rd, jnp.zeros_like(jnp.asarray(r, jnp.result_type(float)))
        if m > 0:
            return rd * jnp.cos(m * phi), -m * rt * jnp.sin(m * phi)
        return (
            rd * jnp.sin(abs(m) * phi),
            abs(m) * rt * jnp.cos(abs(m) * phi),
        )

    def derivatives_cartesian(self, x, y):
        """(dZ/dx, dZ/dy) of the full polynomial at cartesian points."""
        r = jnp.sqrt(x**2 + y**2)
        r_safe = jnp.where(r == 0, 1e-14, r)
        phi = jnp.arctan2(y, x)
        dzdx = jnp.zeros_like(r)
        dzdy = jnp.zeros_like(r)
        for c, (n, m) in zip(self.coeffs, self.indices):
            nc = self._norm_constant(n, m)
            ddr, ddphi = self.get_derivative(n, m, r, phi)
            # chain rule: dr/dx = x/r, dphi/dx = -y/r^2, etc.
            dzdx = dzdx + c * nc * (ddr * x / r_safe - ddphi * y / r_safe**2)
            dzdy = dzdy + c * nc * (ddr * y / r_safe + ddphi * x / r_safe**2)
        return dzdx, dzdy


class ZernikeStandard(BaseZernike):
    """OSA/ANSI standard indexing (reference: zernike/standard.py:23)."""

    @staticmethod
    def _index_to_number(n: int, m: int):
        if (n - m) % 2 == 0:
            return (n * (n + 2) + m) // 2
        return None

    @staticmethod
    def _norm_constant(n: int, m: int) -> float:
        denominator = 2 if m == 0 else 1
        return float(np.sqrt((2 * n + 2) / denominator))


class ZernikeFringe(BaseZernike):
    """Fringe / University of Arizona indexing (reference: zernike/fringe.py:21)."""

    @staticmethod
    def _index_to_number(n: int, m: int):
        if (n - m) % 2 == 0:
            return int(
                (1 + (n + abs(m)) / 2) ** 2 - 2 * abs(m) + (1 - np.sign(m)) / 2
            )
        return None

    @staticmethod
    def _norm_constant(n: int, m: int) -> float:
        return 1.0


class ZernikeNoll(BaseZernike):
    """Noll sequential indexing (reference: zernike/noll.py:24)."""

    @staticmethod
    def _index_to_number(n: int, m: int):
        if (n - m) % 2 == 0:
            mod = n % 4
            if (m > 0 and mod <= 1) or (m < 0 and mod >= 2):
                c = 0
            elif (m >= 0 and mod >= 2) or (m <= 0 and mod <= 1):
                c = 1
            return int(n * (n + 1) / 2 + abs(m) + c)
        return None

    @staticmethod
    def _norm_constant(n: int, m: int) -> float:
        denominator = 2 if m == 0 else 1
        return float(np.sqrt((2 * n + 2) / denominator))


ZERNIKE_CLASSES = {
    "standard": ZernikeStandard,
    "fringe": ZernikeFringe,
    "noll": ZernikeNoll,
}


class ZernikeFit:
    """Least-squares Zernike fit to scattered data
    (reference: zernike/fit.py:33)."""

    def __init__(self, x, y, z, zernike_type: str = "fringe", num_terms: int = 36):
        x = jnp.asarray(x).reshape(-1)
        y = jnp.asarray(y).reshape(-1)
        z = jnp.asarray(z).reshape(-1)
        if x.shape != y.shape or x.shape != z.shape:
            raise ValueError("`x`, `y`, and `z` must have the same size.")
        self.x, self.y, self.z = x, y, z
        self.type = zernike_type
        self.num_terms = num_terms
        self.radius = jnp.sqrt(x**2 + y**2)
        self.phi = jnp.arctan2(y, x)

        cls = ZERNIKE_CLASSES[zernike_type]
        basis = cls(coeffs=jnp.ones((num_terms,)))
        # Design matrix: each column is one unit-coefficient term
        cols = [
            basis.get_term(1.0, n, m, self.radius, self.phi)
            for (n, m) in basis.indices
        ]
        self.A = jnp.stack(cols, axis=1)
        coeffs, *_ = jnp.linalg.lstsq(self.A, z, rcond=None)
        self.coeffs = coeffs
        self.zernike = cls(coeffs=coeffs)

    def predict(self, r, phi):
        return self.zernike.poly(r, phi)

    @property
    def residual(self):
        return self.z - self.A @ self.coeffs

    def rms_error(self):
        return jnp.sqrt(jnp.mean(self.residual**2))
