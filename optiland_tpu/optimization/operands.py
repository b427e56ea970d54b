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


# ---------------------------------------------------------------------------
# Third-order aberration operands (reference: operand/aberration.py:20-200)
# ---------------------------------------------------------------------------


def _aberration_value(system, key):
    from optiland_tpu.aberrations import _precalculations

    p = _precalculations(system)
    if key == "seidels":
        return p["S"]
    if key in ("TSC", "CC", "TAC", "TPC", "DC", "TAchC", "TchC"):
        return p[key]
    if key == "TCC":
        return p["CC"] * 3
    ua_final = p["ua"][-1]
    base = {"SC": "TSC", "AC": "TAC", "PC": "TPC", "LchC": "TAchC"}[key]
    return -p[base] / ua_final


def _make_aberration(key):
    def fn(system, surface_number):
        return _aberration_value(system, key)[surface_number]

    return fn


def _make_aberration_sum(key):
    def fn(system):
        return jnp.sum(_aberration_value(system, key))

    return fn


def seidels(system, seidel_number):
    """Seidel coefficient S_k (1-based)
    (reference: operand/aberration.py seidels)."""
    return _aberration_value(system, "seidels")[seidel_number - 1]


# ---------------------------------------------------------------------------
# Lens / geometry constraint operands (reference: operand/lens.py, ray.py)
# ---------------------------------------------------------------------------


def _semi_apertures(system):
    """|y_marginal| + |y_chief| per surface (the reference's auto-computed
    semi-apertures, surface_group update_paraxial)."""
    ym, _ = paraxial.marginal_ray(system)
    yc, _ = paraxial.chief_ray(system)
    return jnp.abs(ym[:, 0]) + jnp.abs(yc[:, 0])


def edge_thickness(system, surface_number):
    """Edge separation between surface s and s+1 at the larger semi-aperture
    (reference: operand/lens.py:18-60)."""
    from optiland_tpu.core import geometry as geom

    sa = _semi_apertures(system)
    s = surface_number
    y_edge = jnp.maximum(sa[s], sa[s + 1])
    zero = jnp.zeros_like(y_edge)

    def sag_at(k, y):
        stack, cfg = system.stack, system.cfg
        aux = cfg.geom_aux[k] if cfg.geom_aux is not None else None
        return geom.sag_static(
            cfg.geom_codes[k], stack.radius[k], stack.conic[k],
            stack.coeffs[k], zero, y, p1=stack.geo_p1[k],
            p2=stack.geo_p2[k], aux=aux,
        )

    thickness = system.stack.thickness[s]
    return thickness - sag_at(s, y_edge) + sag_at(s + 1, y_edge)


def total_track(system):
    """Axial span of surfaces 1..image (reference: surface_group.py:209-214)."""
    from optiland_tpu.core.system import positions

    z = positions(system.stack)[1:]
    return jnp.max(z) - jnp.min(z)


def AOI(system, surface_number, Hx, Hy, Px, Py, wavelength):
    """Real-ray angle of incidence (degrees, positive) at a surface
    (reference: operand/ray.py:238-298)."""
    from optiland_tpu.core import geometry as geom

    b_in = _traced_bundle(
        system, Hx, Hy, Px, Py, wavelength, surface_number - 1
    )
    b_at = _traced_bundle(system, Hx, Hy, Px, Py, wavelength, surface_number)
    stack, cfg = system.stack, system.cfg
    k = surface_number
    aux = cfg.geom_aux[k] if cfg.geom_aux is not None else None
    # the reference evaluates the normal at the recorded (global) coords
    nx, ny, nz = geom.surface_normal_static(
        cfg.geom_codes[k], stack.radius[k], stack.conic[k], stack.coeffs[k],
        b_at["x"], b_at["y"], p1=stack.geo_p1[k], p2=stack.geo_p2[k], aux=aux,
    )
    dot = jnp.abs(b_in["L"] * nx + b_in["M"] * ny + b_in["N"] * nz)
    ang = jnp.rad2deg(jnp.arccos(jnp.minimum(dot, 1.0)))
    return ang[0]


def clearance(system, line_ray_surface_idx, line_ray_field_coords,
              line_ray_pupil_coords, point_ray_surface_idx,
              point_ray_field_coords, point_ray_pupil_coords, wavelength):
    """Signed YZ-plane distance from a reference ray line to a reference
    ray point (reference: operand/ray.py:390-470)."""
    FA_Hx, FA_Hy = line_ray_field_coords
    FA_Px, FA_Py = line_ray_pupil_coords
    bA = _traced_bundle(
        system, FA_Hx, FA_Hy, jnp.atleast_1d(jnp.asarray(FA_Px, float)),
        jnp.atleast_1d(jnp.asarray(FA_Py, float)), wavelength,
        line_ray_surface_idx,
    )
    FB_Hx, FB_Hy = point_ray_field_coords
    FB_Px, FB_Py = point_ray_pupil_coords
    bB = _traced_bundle(
        system, FB_Hx, FB_Hy, jnp.atleast_1d(jnp.asarray(FB_Px, float)),
        jnp.atleast_1d(jnp.asarray(FB_Py, float)), wavelength,
        point_ray_surface_idx,
    )
    yA, zA = bA["y"][0], bA["z"][0]
    mA, nA = bA["M"][0], bA["N"][0]
    yB, zB = bB["y"][0], bB["z"][0]
    denom = jnp.sqrt(mA**2 + nA**2)
    d = (nA * (yB - yA) - mA * (zB - zA)) / jnp.where(denom < 1e-9, 1.0, denom)
    d = jnp.where(nA < 0, -d, d)
    return jnp.where(denom < 1e-9, 0.0, d)


def _make_intercept_lcs(comp):
    def fn(system, Hx, Hy, Px, Py, wavelength, surface_number):
        from optiland_tpu.core.system import positions

        b = _traced_bundle(system, Hx, Hy, Px, Py, wavelength, surface_number)
        val = b[comp][0]
        if comp == "x":
            return val - system.stack.dx[surface_number]
        if comp == "y":
            return val - system.stack.dy[surface_number]
        return val - positions(system.stack)[surface_number]

    return fn


OPERAND_REGISTRY = {}
OPERAND_REGISTRY.update(_PARAXIAL_OPS)
OPERAND_REGISTRY.update(
    {
        "real_x_intercept": _make_intercept("x"),
        "real_y_intercept": _make_intercept("y"),
        "real_z_intercept": _make_intercept("z"),
        "real_x_intercept_lcs": _make_intercept_lcs("x"),
        "real_y_intercept_lcs": _make_intercept_lcs("y"),
        "real_z_intercept_lcs": _make_intercept_lcs("z"),
        "real_L": _make_intercept("L"),
        "real_M": _make_intercept("M"),
        "real_N": _make_intercept("N"),
        "rms_spot_size": rms_spot_size,
        "OPD_difference": OPD_difference,
        "AOI": AOI,
        "clearance": clearance,
        "edge_thickness": edge_thickness,
        "total_track": total_track,
        "seidel": seidels,
    }
)
for _ab in ("TSC", "SC", "CC", "TCC", "TAC", "AC", "TPC", "PC", "DC",
            "TAchC", "LchC", "TchC"):
    OPERAND_REGISTRY[_ab] = _make_aberration(_ab)
    OPERAND_REGISTRY[f"{_ab}_sum"] = _make_aberration_sum(_ab)


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
        # The system pytree is supplied at evaluation time; the builder is
        # kept only for field/wavelength weight lookup.
        self._optic = d.pop("optic", None)
        # Integer field/wavelength entries are weight-lookup indices, not
        # operand-function inputs (reference: operand/operand.py:235-277 —
        # effective_weight treats int-typed entries as indices into the
        # optic's field/wavelength lists).
        self._field_idx = None
        self._wl_idx = None
        if type(d.get("field")) is int:
            self._field_idx = d.pop("field")
        if type(d.get("wavelength")) is int:
            self._wl_idx = d.pop("wavelength")
            # The index also RESOLVES to that wavelength's value when the
            # operand function takes one (so {'wavelength': 1} means "the
            # second configured wavelength", never "1 um"). Paraxial
            # operands (f2, ...) take no wavelength: for them the index is
            # weight-lookup only.
            import inspect

            fn = OPERAND_REGISTRY[self.operand_type]
            if "wavelength" in inspect.signature(fn).parameters:
                if self._optic is not None:
                    try:
                        d["wavelength"] = float(
                            self._optic.wavelengths
                            .wavelengths[self._wl_idx].value
                        )
                    except IndexError:
                        d["wavelength"] = float(self._wl_idx)
                else:
                    d["wavelength"] = float(self._wl_idx)
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

    def effective_weight(self, optic=None) -> float:
        """operand.weight x field_weight x wavelength_weight
        (reference: operand/operand.py:235-277). Falls back to the optic
        captured from input_data; raw coordinates default to weight 1."""
        optic = optic if optic is not None else self._optic
        field_w = 1.0
        wl_w = 1.0
        if optic is not None:
            if self._field_idx is not None:
                try:
                    field_w = optic.fields.fields[self._field_idx].weight
                except IndexError:
                    pass
            if self._wl_idx is not None:
                try:
                    wl_w = optic.wavelengths.wavelengths[self._wl_idx].weight
                except IndexError:
                    pass
        return self.weight * field_w * wl_w

    def fun(self, system):
        """Weighted squared contribution: effective_weight x delta^2
        (reference: problem.py:141-166). The effective weight is a static
        Python float, so it is baked into the jitted merit — changing field
        or wavelength weights afterwards requires rebuilding the problem."""
        return self.effective_weight() * self.delta(system) ** 2
