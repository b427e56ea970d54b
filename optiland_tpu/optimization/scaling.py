"""Variable scalers for optimizer conditioning.

Pure scalar transforms between physical values and optimizer space
(reference: optiland/optimization/scaling/*.py).
"""

from __future__ import annotations

import jax.numpy as jnp


class IdentityScaler:
    def scale(self, value):
        return value

    def inverse_scale(self, scaled):
        return scaled


class LinearScaler:
    """scaled = value * factor + offset."""

    def __init__(self, factor: float = 1.0, offset: float = 0.0):
        self.factor = factor
        self.offset = offset

    def scale(self, value):
        return value * self.factor + self.offset

    def inverse_scale(self, scaled):
        return (scaled - self.offset) / self.factor


class LogScaler:
    """scaled = log(value)."""

    def scale(self, value):
        return jnp.log(value)

    def inverse_scale(self, scaled):
        return jnp.exp(scaled)


class PowerScaler:
    """scaled = sign(value) |value|^(1/power)."""

    def __init__(self, power: float = 2.0):
        self.power = power

    def scale(self, value):
        return jnp.sign(value) * jnp.abs(value) ** (1.0 / self.power)

    def inverse_scale(self, scaled):
        return jnp.sign(scaled) * jnp.abs(scaled) ** self.power


class ReciprocalScaler:
    """scaled = 1 / value (with safe zero handling)."""

    def scale(self, value):
        return jnp.where(value == 0, 0.0, 1.0 / jnp.where(value == 0, 1.0, value))

    def inverse_scale(self, scaled):
        return jnp.where(scaled == 0, 0.0, 1.0 / jnp.where(scaled == 0, 1.0, scaled))
