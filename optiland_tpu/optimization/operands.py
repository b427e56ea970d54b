"""Operand registry: named scalar metrics of a compiled system.

Each operand type maps to a pure function ``fn(system, **data) -> scalar``
that is jit/grad-compatible. This mirrors the reference's operand registry
(reference: optiland/optimization/operand/operand.py:30-151, paraxial.py,
ray.py) with the optic replaced by the compiled system pytree.

Ray-based operands take explicit pupil coordinate arrays (Px, Py); the
Operand wrapper compiles distribution specs (num_rays, distribution name)
into concrete arrays at construction time so shapes are static under jit.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from optiland_tpu.core import paraxial, raygen, trace as trace_core
from optiland_tpu.core.distributions import create_distribution

# ---------------------------------------------------------------------------
# Paraxial operands
# ---------------------------------------------------------------------------

_PARAXIAL_OPS = {
    "f1": paraxial.f1,
    "f2": paraxial.f2,
    "F1": paraxial.F1,
    "F2": paraxial.F2,
    "P1": paraxial.P1,
    "P2": paraxial.P2,
    "N1": paraxial.N1,
    "N2": paraxial.N2,
    "EPD": paraxial.EPD,
    "EPL": paraxial.EPL,
    "XPD": paraxial.XPD,
    "XPL": paraxial.XPL,
    "FNO": paraxial.FNO,
    "magnification": paraxial.magnification,
    "invariant": paraxial.invariant,
}


def _traced_bundle(system, Hx, Hy, Px, Py, wavelength, surface_number=None):
    rays = raygen.generate_rays(
        system,
        jnp.full_like(jnp.asarray(Px), Hx),
        jnp.full_like(jnp.asarray(Px), Hy),
        Px,
        Py,
        wavelength,
    )
    record = surface_number is not None and surface_number != -1
    final, history = trace_core.trace(system, rays, record=record)
    if record:
        return {k: v[surface_number] for k, v in history.items()}
    return {
        "x": final.x, "y": final.y, "z": final.z,
        "L": final.L, "M": final.M, "N": final.N,
        "intensity": final.i, "opd": final.opd,
    }


def _make_intercept(comp):
    def fn(system, Hx, Hy, Px, Py, wavelength, surface_number=-1):
        b = _traced_bundle(system, Hx, Hy, Px, Py, wavelength, surface_number)
        val = b[comp]
        return val[0] if val.shape[0] == 1 else val

    return fn


def rms_spot_size(system, Hx, Hy, Px, Py, wavelength, surface_number=-1):
    """RMS spot radius about the centroid
    (reference: optimization/operand/ray.py:300-340)."""
    b = _traced_bundle(system, Hx, Hy, Px, Py, wavelength, surface_number)
    x, y = b["x"], b["y"]
    r2 = (x - jnp.mean(x)) ** 2 + (y - jnp.mean(y)) ** 2
    return jnp.sqrt(jnp.mean(r2))


def rms_spot_size_all_wavelengths(system, Hx, Hy, Px, Py, surface_number=-1):
    """RMS spot over every system wavelength, centroid at the primary
    (reference: operand/ray.py:324-335, wavelength='all')."""
    xs, ys = [], []
    # system wavelengths are traced values; loop count is static
    n_w = system.wavelengths.shape[0]
    for i in range(n_w):
        b = _traced_bundle(
            system, Hx, Hy, Px, Py, system.wavelengths[i], surface_number
        )
        xs.append(b["x"])
        ys.append(b["y"])
    pi = system.cfg.primary_index
    mx, my = jnp.mean(xs[pi]), jnp.mean(ys[pi])
    r2 = jnp.concatenate([(x - mx) ** 2 + (y - my) ** 2 for x, y in zip(xs, ys)])
    return jnp.sqrt(jnp.mean(r2))


def OPD_difference(system, Hx, Hy, Px, Py, wavelength):
    """Mean absolute OPD deviation over the pupil
    (reference: operand/ray.py:342+)."""
    rays = raygen.generate_rays(
        system,
        jnp.full_like(jnp.asarray(Px), Hx),
        jnp.full_like(jnp.asarray(Px), Hy),
        Px,
        Py,
        wavelength,
    )
    final, _ = trace_core.trace(system, rays, record=False)
    delta = final.opd - jnp.mean(final.opd)
    return jnp.mean(jnp.abs(delta))


OPERAND_REGISTRY = {}
OPERAND_REGISTRY.update(_PARAXIAL_OPS)
OPERAND_REGISTRY.update(
    {
        "real_x_intercept": _make_intercept("x"),
        "real_y_intercept": _make_intercept("y"),
        "real_z_intercept": _make_intercept("z"),
        "real_L": _make_intercept("L"),
        "real_M": _make_intercept("M"),
        "real_N": _make_intercept("N"),
        "rms_spot_size": rms_spot_size,
        "OPD_difference": OPD_difference,
    }
)


def register_operand(name: str, fn):
    """User-registerable operands (reference: operand/operand.py:110-151)."""
    OPERAND_REGISTRY[name] = fn


class Operand:
    """One merit-function term: metric vs target (or bounds) with weight
    (reference: operand/operand.py:155-213)."""

    def __init__(
        self,
        operand_type: str,
        target=None,
        min_val=None,
        max_val=None,
        weight: float = 1.0,
        input_data: dict | None = None,
    ):
        if operand_type not in OPERAND_REGISTRY:
            raise ValueError(f"Unknown operand type: {operand_type}")
        if min_val is not None and max_val is not None and min_val > max_val:
            raise ValueError(f"{operand_type}: min_val is higher than max_val")
        if target is not None and (min_val is not None or max_val is not None):
            raise ValueError(
                f"{operand_type} cannot accept both equality and inequality targets"
            )
        self.operand_type = operand_type
        self.target = target
        self.min_val = min_val
        self.max_val = max_val
        self.weight = weight
        self.input_data = dict(input_data or {})
        self._compile_inputs()

    def _compile_inputs(self):
        """Turn distribution specs into concrete pupil arrays."""
        d = self.input_data
        d.pop("optic", None)  # the system is supplied at evaluation time
        if "num_rays" in d or "distribution" in d:
            num_rays = d.pop("num_rays", 100)
            dist_name = d.pop("distribution", "hexapolar")
            dist = create_distribution(dist_name)
            dist.generate_points(num_rays)
            d["Px"] = jnp.asarray(np.asarray(dist.x, float))
            d["Py"] = jnp.asarray(np.asarray(dist.y, float))
        if d.get("wavelength") == "all":
            d.pop("wavelength")
            if self.operand_type == "rms_spot_size":
                self.operand_type = "_rms_spot_size_all"
                OPERAND_REGISTRY.setdefault(
                    "_rms_spot_size_all", rms_spot_size_all_wavelengths
                )

    def value(self, system):
        return OPERAND_REGISTRY[self.operand_type](system, **self.input_data)

    def delta(self, system):
        v = self.value(system)
        if self.target is not None:
            return v - self.target
        lo = 0.0 if self.min_val is None else jnp.maximum(0.0, self.min_val - v)
        hi = 0.0 if self.max_val is None else jnp.maximum(0.0, v - self.max_val)
        return lo + hi

    def fun(self, system):
        """Weighted squared contribution (reference: problem.py:141-151)."""
        return self.weight * self.delta(system) ** 2
