"""User-facing Optic builder with a reference-compatible API.

The mutable builder mirrors the reference's construction UX
(reference: optiland/optic/optic.py:59-817, surfaces/surface_group.py:259-337):
``surfaces.add(...)``, ``set_aperture``, ``fields.add``, ``wavelengths.add``,
``optic.trace(...)``, ``optic.paraxial.f2()``. Unlike the reference, the
builder is only a description: it compiles down to an immutable
:class:`optiland_tpu.core.system.System` pytree (cached, invalidated on
mutation), and every computation is a jitted pure function of that pytree.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from optiland_tpu.core import geometry as geom
from optiland_tpu.core import paraxial as paraxial_core
from optiland_tpu.core import raygen, trace as trace_core
from optiland_tpu.core.distributions import BaseDistribution, create_distribution
from optiland_tpu.core.system import SurfaceStack, System, SystemConfig
from optiland_tpu.materials import AIR, BaseMaterial, dispersion, resolve_material

_GEOM_CODES = {
    "standard": geom.STANDARD,
    "plane": geom.PLANE,
    "even_asphere": geom.EVEN_ASPHERE,
    "odd_asphere": geom.ODD_ASPHERE,
    "polynomial": geom.POLYNOMIAL_XY,
    "chebyshev": geom.CHEBYSHEV,
    "zernike": geom.ZERNIKE_SAG,
    "toroidal": geom.TOROIDAL,
    "biconic": geom.BICONIC,
    "paraxial": geom.PLANE,
    "forbes_qbfs": geom.FORBES_QBFS,
    "forbes_q2d": geom.FORBES_Q2D,
    "grid_sag": geom.GRID_SAG,
    "nurbs": geom.NURBS,
}


@dataclasses.dataclass
class SurfaceDef:
    """Mutable builder record for one surface."""

    radius: float = np.inf
    thickness: float = 0.0
    conic: float = 0.0
    material: Any = "air"
    is_stop: bool = False
    surface_type: str = "standard"
    coefficients: tuple = ()
    dx: float = 0.0
    dy: float = 0.0
    dz: float = 0.0  # z-decenter on top of the cumulative-thickness vertex
    rx: float = 0.0
    ry: float = 0.0
    rz: float = 0.0
    # chained reference frame; flattened into dx/dy/dz + rx/ry/rz at compile
    # (reference: coordinate_system.py:28-107 recursive localize/globalize)
    coordinate_system: object = None
    aperture: float | None = None  # physical semi-diameter via diameter value
    comment: str = ""
    # extended geometry parameters
    geo_p1: float = 1.0  # second radius / norm_x / norm_radius
    geo_p2: float = 1.0  # second conic / norm_y
    geo_aux: tuple | None = None  # static extras (e.g. ("fringe",) zernike)
    phase_profile: object = None  # BasePhaseProfile for phase interactions
    coating: object = None  # BaseCoating or "fresnel"
    bsdf: object = None  # BaseBSDF scatter model

    # resolved at compile time
    _material_obj: BaseMaterial | None = None
    _is_reflective: bool = False


class SurfaceGroup:
    """Ordered list of surface definitions with a reference-style add API."""

    def __init__(self, optic: "Optic"):
        self._optic = optic
        self.surfaces: list[SurfaceDef] = []

    def add(
        self,
        index: int | None = None,
        radius: float = np.inf,
        thickness: float = 0.0,
        conic: float = 0.0,
        material: Any = "air",
        is_stop: bool = False,
        surface_type: str = "standard",
        coefficients=(),
        dx: float = 0.0,
        dy: float = 0.0,
        dz: float = 0.0,
        rx: float = 0.0,
        ry: float = 0.0,
        rz: float = 0.0,
        coordinate_system=None,
        aperture: float | None = None,
        comment: str = "",
        **kwargs,
    ):
        """Add a surface (reference parity: surface_group.py:259-337)."""
        geo_p1, geo_p2, geo_aux = 1.0, 1.0, None
        coeff_arr = np.asarray(coefficients, dtype=float) if np.size(coefficients) else np.zeros(0)
        if surface_type in ("polynomial", "chebyshev") and coeff_arr.ndim == 2:
            # embed the (i, j) matrix in a square row-major layout
            side = max(coeff_arr.shape)
            sq = np.zeros((side, side))
            sq[: coeff_arr.shape[0], : coeff_arr.shape[1]] = coeff_arr
            coeff_arr = sq.ravel()
        else:
            coeff_arr = coeff_arr.ravel()
        if surface_type == "chebyshev":
            geo_p1 = kwargs.pop("norm_x", None) or 1.0
            geo_p2 = kwargs.pop("norm_y", None) or 1.0
        elif surface_type == "zernike":
            geo_p1 = kwargs.pop("norm_radius", None) or 1.0
            geo_aux = (kwargs.pop("zernike_type", "fringe"),)
        elif surface_type == "biconic":
            radius = kwargs.pop("radius_x", radius)
            conic = kwargs.pop("conic_x", conic)
            geo_p1 = kwargs.pop("radius_y", np.inf)
            geo_p2 = kwargs.pop("conic_y", 0.0)
        elif surface_type == "toroidal":
            radius = kwargs.pop("radius_x", radius)
            geo_p1 = kwargs.pop("radius_y", np.inf)
            geo_p2 = conic  # conic applies to the Y-Z curve
            tor = kwargs.pop("toroidal_coeffs_poly_y", None)
            if tor is not None and np.size(tor):
                coeff_arr = np.ravel(np.asarray(tor, dtype=float))
        elif surface_type == "paraxial":
            # ideal thin lens; focal length in geo_p1
            geo_p1 = kwargs.pop("f", kwargs.pop("focal_length", np.inf))
        elif surface_type == "grating":
            # period in geo_p1 (um, differentiable), groove angle in geo_p2,
            # order in geo_aux (static)
            geo_p1 = kwargs.pop("grating_period", np.inf)
            geo_p2 = kwargs.pop("groove_orientation_angle", 0.0)
            geo_aux = ("grating", int(kwargs.pop("grating_order", 0)))
        elif surface_type == "forbes_qbfs":
            # radial_terms dict {n: a_n} -> dense coefficient vector
            terms = kwargs.pop("radial_terms", None) or {}
            geo_p1 = kwargs.pop("norm_radius", None) or 1.0
            n_terms = (max(terms) + 1) if terms else 0
            coeff_arr = np.zeros(n_terms)
            for n, v in terms.items():
                coeff_arr[n] = v
            geo_aux = ("qbfs", n_terms)
        elif surface_type == "forbes_q2d":
            # freeform_coeffs dict {('a'|'b', m, n): c} -> coefficient
            # vector + static (n, m_signed) layout
            terms = kwargs.pop("freeform_coeffs", None) or {}
            geo_p1 = kwargs.pop("norm_radius", None) or 1.0
            nms, vals = [], []
            for (ab, m, n), v in sorted(
                terms.items(), key=lambda kv: (kv[0][2], kv[0][1], kv[0][0])
            ):
                nms.append((n, m if ab.lower() == "a" else -m))
                vals.append(v)
            coeff_arr = np.asarray(vals, float)
            geo_aux = ("q2d", tuple(nms))
        elif surface_type == "nurbs":
            from optiland_tpu.core.nurbs import build_nurbs_def

            coeff_arr, geo_aux = build_nurbs_def(
                radius=radius,
                conic=conic,
                control_points=kwargs.pop("control_points", None),
                weights=kwargs.pop("weights", None),
                u_degree=kwargs.pop("u_degree", None),
                v_degree=kwargs.pop("v_degree", None),
                u_knots=kwargs.pop("u_knots", None),
                v_knots=kwargs.pop("v_knots", None),
                nurbs_norm_x=kwargs.pop("nurbs_norm_x", None),
                nurbs_norm_y=kwargs.pop("nurbs_norm_y", None),
                x_center=kwargs.pop("nurbs_x_center", 0.0),
                y_center=kwargs.pop("nurbs_y_center", 0.0),
                n_points_u=kwargs.pop("n_points_u", 5),
                n_points_v=kwargs.pop("n_points_v", 5),
            )
        elif surface_type == "grid_sag":
            xs = tuple(float(v) for v in kwargs.pop("x_coordinates"))
            ys = tuple(float(v) for v in kwargs.pop("y_coordinates"))
            sags = np.asarray(kwargs.pop("sag_values"), float)
            if sags.shape != (len(ys), len(xs)):
                raise ValueError(
                    f"Shape of sag_values {sags.shape} must "
                    f"match (len(y_coordinates), len(x_coordinates)) = "
                    f"({len(ys)}, {len(xs)})."
                )
            # values go into the coeff vector (differentiable); grid
            # coordinates stay static in aux
            coeff_arr = sags.ravel()
            geo_aux = ("grid", xs, ys)
        elif surface_type in geom.CUSTOM_GEOMETRIES:
            # user-registered family (core.geometry.register_geometry):
            # the two generic scalars and the static aux pass straight
            # through to the registered sag function
            geo_p1 = kwargs.pop("p1", 1.0)
            geo_p2 = kwargs.pop("p2", 1.0)
            geo_aux = kwargs.pop("aux", None)
        phase_profile = kwargs.pop("phase_profile", None)
        coating = kwargs.pop("coating", None)
        bsdf = kwargs.pop("bsdf", None)
        if kwargs:
            raise TypeError(
                f"Unknown surface argument(s) for surface_type "
                f"{surface_type!r}: {sorted(kwargs)}"
            )
        sd = SurfaceDef(
            radius=radius,
            thickness=thickness,
            conic=conic,
            material=material,
            is_stop=is_stop,
            surface_type=surface_type,
            coefficients=tuple(coeff_arr) if coeff_arr.size else (),
            dx=dx,
            dy=dy,
            dz=dz,
            rx=rx,
            ry=ry,
            rz=rz,
            coordinate_system=coordinate_system,
            aperture=aperture,
            comment=comment,
            geo_p1=float(geo_p1),
            geo_p2=float(geo_p2),
            geo_aux=geo_aux,
        )
        sd.phase_profile = phase_profile
        sd.coating = coating
        sd.bsdf = bsdf
        if index is None:
            index = len(self.surfaces)
        self.surfaces.insert(index, sd)
        self._optic._invalidate()
        return sd

    def __len__(self):
        return len(self.surfaces)

    def __getitem__(self, i):
        return self.surfaces[i]

    def __iter__(self):
        return iter(self.surfaces)

    def remove_surface(self, index: int):
        """Delete a surface by index; object/image surfaces are protected
        (reference: surface_group.py remove semantics)."""
        if index <= 0 or index >= len(self.surfaces) - 1:
            raise ValueError(
                "Cannot remove the object or image surface."
            )
        self.surfaces.pop(index)
        self._optic._invalidate()

    @property
    def stop_index(self) -> int:
        for i, s in enumerate(self.surfaces):
            if s.is_stop:
                return i
        return 1

    @stop_index.setter
    def stop_index(self, index: int):
        """Move the stop (reference: surface_group.py:189)."""
        for i, s in enumerate(self.surfaces):
            s.is_stop = i == index
        self._optic._invalidate()

    @property
    def num_surfaces(self) -> int:
        return len(self.surfaces)

    @property
    def radii(self):
        """Per-surface radii of curvature (reference: surface_group.py:164)."""
        return np.asarray([s.radius for s in self.surfaces])

    @property
    def conic(self):
        """Per-surface conic constants (reference: surface_group.py:169)."""
        return np.asarray([s.conic for s in self.surfaces])

    @property
    def positions(self):
        """Cumulative z position of each surface with the object plane as
        the datum (reference: surface_group.py:156)."""
        from optiland_tpu.core.system import positions as _positions

        return np.asarray(_positions(self._optic.system.stack))

    @property
    def total_track(self):
        """Axial length from the first real surface to the image plane
        (reference: surface_group.py:209)."""
        pos = self.positions
        return float(pos[-1] - pos[1])


@dataclasses.dataclass
class Field:
    x: float = 0.0
    y: float = 0.0
    vx: float = 0.0
    vy: float = 0.0
    weight: float = 1.0

    def __setattr__(self, name, value):
        # Relative importance for weighted contexts; 0.0 excludes the field
        # (reference: fields/field.py:30-47 validates on both construction
        # and assignment).
        if name == "weight":
            if value < 0:
                raise ValueError(
                    f"Field weight must be non-negative, got {value}."
                )
            value = float(value)
        object.__setattr__(self, name, value)
        # Direct mutation (f.vx = ..., f.weight = ...) must invalidate the
        # owner's compiled-system cache: vignetting factors are baked into
        # System.vig_x/vig_y at compile time.
        parent = getattr(self, "_parent", None)
        if parent is not None and not name.startswith("_"):
            parent._invalidate()


class FieldGroup:
    """Field list with type registry (reference: fields/field_group.py:21)."""

    def __init__(self, optic: "Optic"):
        self._optic = optic
        self.fields: list[Field] = []
        self.field_type = "angle"
        self.telecentric = False

    def set_type(self, field_type=None, **kwargs):
        if field_type is None:
            field_type = kwargs.pop("type", None)
        self.field_type = field_type
        self._optic._invalidate()

    def add(
        self,
        x: float = 0.0,
        y: float = 0.0,
        vx: float = 0.0,
        vy: float = 0.0,
        weight: float = 1.0,
    ):
        f = Field(x=x, y=y, vx=vx, vy=vy, weight=weight)
        object.__setattr__(f, "_parent", self._optic)
        self.fields.append(f)
        self._optic._invalidate()

    @property
    def weights(self) -> tuple:
        """Per-field weights (reference: fields/field_group.py weights)."""
        return tuple(f.weight for f in self.fields)

    def get_vig_factor(self, Hx, Hy):
        """Nearest-neighbor interpolated vignetting factors (vx, vy) at the
        normalized field point (reference: field_group.py:93-122)."""
        if not self.fields:
            return 0.0, 0.0
        m = self.max_field
        xf = self.x_fields / m if m else self.x_fields
        yf = self.y_fields / m if m else self.y_fields
        Hx = np.atleast_1d(np.asarray(Hx, float))
        Hy = np.atleast_1d(np.asarray(Hy, float))
        d2 = (Hx[:, None] - xf[None, :]) ** 2 + (Hy[:, None] - yf[None, :]) ** 2
        nearest = np.argmin(d2, axis=1)
        vx = np.array([self.fields[i].vx for i in nearest])
        vy = np.array([self.fields[i].vy for i in nearest])
        return vx, vy

    def set_telecentric(self, telecentric: bool):
        self.telecentric = telecentric
        self._optic._invalidate()

    @property
    def x_fields(self):
        return np.array([f.x for f in self.fields])

    @property
    def y_fields(self):
        return np.array([f.y for f in self.fields])

    @property
    def max_field(self):
        if not self.fields:
            return 0.0
        return float(np.max(np.sqrt(self.x_fields**2 + self.y_fields**2)))

    @property
    def max_y_field(self):
        return float(np.max(self.y_fields))

    @property
    def max_x_field(self):
        return float(np.max(self.x_fields))

    @property
    def num_fields(self):
        return len(self.fields)

    def get_field_coords(self):
        m = self.max_field
        if m == 0:
            return [(0.0, 0.0)]
        return [(float(f.x / m), float(f.y / m)) for f in self.fields]


@dataclasses.dataclass
class Wavelength:
    value: float
    is_primary: bool = False
    weight: float = 1.0

    def __setattr__(self, name, value):
        if name == "weight":
            if value < 0:
                raise ValueError(
                    f"Wavelength weight must be non-negative, got {value}."
                )
            value = float(value)
        object.__setattr__(self, name, value)


class WavelengthGroup:
    """Wavelength list (reference: wavelength.py:23-367). Values in um."""

    def __init__(self, optic: "Optic"):
        self._optic = optic
        self.wavelengths: list[Wavelength] = []

    def add(
        self,
        value: float,
        is_primary: bool = False,
        unit: str = "um",
        weight: float = 1.0,
    ):
        # (reference: wavelength.py:98 unit table)
        scale = {"nm": 1e-3, "um": 1.0, "mm": 1e3, "cm": 1e4,
                 "m": 1e6}[unit.lower()]
        self.wavelengths.append(
            Wavelength(value * scale, is_primary, weight=weight)
        )
        self._optic._invalidate()

    @property
    def weights(self) -> tuple:
        """Per-wavelength weights (reference: wavelength.py weights)."""
        return tuple(w.weight for w in self.wavelengths)

    @property
    def primary_index(self) -> int:
        for i, w in enumerate(self.wavelengths):
            if w.is_primary:
                return i
        return 0

    @property
    def primary_wavelength(self) -> float:
        return self.wavelengths[self.primary_index].value

    def get_wavelengths(self):
        return [w.value for w in self.wavelengths]

    @property
    def num_wavelengths(self):
        return len(self.wavelengths)


class Aperture:
    def __init__(self, ap_type: str, value: float):
        self.ap_type = ap_type
        self.value = value


class ParaxialView:
    """Paraxial property accessor mirroring reference Paraxial
    (reference: paraxial.py:32)."""

    def __init__(self, optic: "Optic"):
        self._optic = optic

    def _call(self, fn):
        return fn(self._optic.system)

    def __getattr__(self, name):
        fn = getattr(paraxial_core, name, None)
        if fn is None or name.startswith("_"):
            raise AttributeError(name)
        return functools.partial(_jitted_paraxial, name, self._optic.system)

    def trace_generic(self, y, u, z, wavelength=None, reverse=False, skip=0):
        return paraxial_core.trace_generic(
            self._optic.system, y, u, z, wavelength, reverse=reverse, skip=skip
        )


@functools.lru_cache(maxsize=256)
def _paraxial_jit(name):
    return jax.jit(getattr(paraxial_core, name))


def _jitted_paraxial(name, system):
    return _paraxial_jit(name)(system)


@functools.lru_cache(maxsize=32)
def _trace_jit():
    def run(system, Hx, Hy, Px, Py, wavelength, record, apodization=None,
            pol_state=None, key=None):
        rays = raygen.generate_rays(
            system, Hx, Hy, Px, Py, wavelength, apodization=apodization
        )
        # wavelength is static (a Python float): record=False traces
        # dispatch to the fused Pallas kernels on accelerator backends
        final, history = trace_core.trace(
            system, rays, record=record, key=key, wavelength=wavelength
        )
        if system.cfg.polarized:
            from optiland_tpu.polarization import polarized_intensity

            p = history["p"]
            i_pol = polarized_intensity(
                p, pol_state, rays.L, rays.M, rays.N, rays.i
            )
            final = final.replace(i=i_pol)
            history["i0"] = rays.i
        return final, history

    return jax.jit(
        run,
        static_argnames=("wavelength", "record", "apodization", "pol_state"),
    )


@functools.lru_cache(maxsize=32)
def _trace_jit_dyn():
    """Traced-wavelength variant: wavelength is a dynamic jit argument, so a
    JAX array (e.g. from an outer grad/vmap over wavelength) traces without
    recompiling per value. Skips the Pallas dispatch (which needs a concrete
    wavelength) and uses the XLA path."""

    def run(system, Hx, Hy, Px, Py, wavelength, record, apodization=None,
            pol_state=None, key=None):
        rays = raygen.generate_rays(
            system, Hx, Hy, Px, Py, wavelength, apodization=apodization
        )
        final, history = trace_core.trace(
            system, rays, record=record, key=key
        )
        if system.cfg.polarized:
            from optiland_tpu.polarization import polarized_intensity

            p = history["p"]
            i_pol = polarized_intensity(
                p, pol_state, rays.L, rays.M, rays.N, rays.i
            )
            final = final.replace(i=i_pol)
            history["i0"] = rays.i
        return final, history

    return jax.jit(
        run, static_argnames=("record", "apodization", "pol_state")
    )


def _concrete_wavelength(wavelength):
    """float(wavelength) when concrete (Python/NumPy scalar, or a concrete
    JAX array); the value unchanged when traced (inside jit/grad/vmap)."""
    if isinstance(wavelength, jax.core.Tracer):
        return wavelength
    try:
        return float(wavelength)
    except (TypeError, jax.errors.TracerArrayConversionError,
            jax.errors.ConcretizationTypeError):
        return wavelength


@functools.lru_cache(maxsize=32)
def _trace_rays_jit():
    """Trace a pre-aimed launch bundle (used by the real ray-aiming modes)."""

    def run(system, rays, record, pol_state=None, key=None):
        final, history = trace_core.trace(system, rays, record=record, key=key)
        if system.cfg.polarized:
            from optiland_tpu.polarization import polarized_intensity

            p = history["p"]
            i_pol = polarized_intensity(
                p, pol_state, rays.L, rays.M, rays.N, rays.i
            )
            final = final.replace(i=i_pol)
            history["i0"] = rays.i
        return final, history

    return jax.jit(run, static_argnames=("record", "pol_state"))


class TraceResult:
    """Result bundle mimicking the reference's traced RealRays + recorded
    surface history (reference: surfaces/surface_group.py:108-153)."""

    def __init__(self, final, history):
        self.rays = final
        self.history = history
        for name in ("x", "y", "z", "L", "M", "N", "opd", "w"):
            setattr(self, name, getattr(final, name))
        self.i = final.i
        self.intensity = final.i
        if history is not None and "p" in history:
            self.p = history["p"]
            self._i0 = history.get("i0")

    def get_exit_fields(self, state):
        """Exit 3D E-field list for polarized traces
        (reference: rays/polarized_rays.py:106-120)."""
        from optiland_tpu.polarization import exit_fields

        i0 = self._i0 if self._i0 is not None else jnp.ones_like(self.x)
        return exit_fields(
            self.p, state, self.rays.L0, self.rays.M0, self.rays.N0, i0
        )

    def __repr__(self):
        return f"TraceResult({self.x.shape[0]} rays)"


class Optic:
    """Top-level optical system builder and interface."""

    def __init__(self, name: str | None = None):
        from optiland_tpu.pickup import PickupManager
        from optiland_tpu.solves import SolveManager

        self.name = name
        self.surfaces = SurfaceGroup(self)
        self.fields = FieldGroup(self)
        self.wavelengths = WavelengthGroup(self)
        self.aperture: Aperture | None = None
        self.polarization = "ignore"
        self.obj_space_telecentric = False
        self.pickups = PickupManager(self)
        self.solves = SolveManager(self)
        self.apodization = None
        self.ray_aiming_config: dict = {"method": "paraxial"}
        self._aimer = None
        self._system_cache: System | None = None

    # ---------------- configuration API ----------------

    def add_surface(self, **kwargs):
        return self.surfaces.add(**kwargs)

    def set_aperture(self, aperture_type: str, value: float):
        """Set the system aperture (reference: optic/optic.py:322-331)."""
        if aperture_type not in ("EPD", "imageFNO", "objectNA", "float_by_stop_size"):
            raise ValueError(f"Unknown aperture type {aperture_type}")
        self.aperture = Aperture(aperture_type, value)
        self._invalidate()

    def add_field(self, y: float = 0.0, x: float = 0.0, vx: float = 0.0,
                  vy: float = 0.0, weight: float = 1.0):
        """Convenience alias for fields.add (reference: optic.py:277)."""
        self.fields.add(x=x, y=y, vx=vx, vy=vy, weight=weight)

    def add_wavelength(self, value: float, is_primary: bool = False,
                       unit: str = "um", weight: float = 1.0):
        """Convenience alias for wavelengths.add (reference: optic.py:296)."""
        self.wavelengths.add(value, is_primary=is_primary, unit=unit,
                             weight=weight)

    def set_field_type(self, field_type: str):
        self.fields.set_type(field_type)

    def set_polarization(self, polarization):
        """Set the polarization mode: "ignore", a PolarizationState, or a
        named state string (reference: optic/optic.py set_polarization)."""
        if isinstance(polarization, str) and polarization != "ignore":
            from optiland_tpu.polarization import create_polarization

            polarization = create_polarization(polarization)
        self.polarization = polarization
        self._invalidate()

    def _pol_state(self):
        if self.polarization == "ignore":
            return None
        return self.polarization

    @property
    def polarization_state(self):
        return self._pol_state()

    def _next_key(self):
        """Fresh PRNG key for BSDF scattering traces (None if unused)."""
        if not any(getattr(s, "bsdf", None) is not None
                   for s in self.surfaces.surfaces):
            return None
        if not hasattr(self, "_key"):
            self._key = jax.random.PRNGKey(0)
        self._key, sub = jax.random.split(self._key)
        return sub

    def set_apodization(self, apodization):
        self.apodization = apodization
        self._invalidate()

    def set_ray_aiming(self, method: str = "paraxial", cache: bool = False,
                       **kwargs):
        """Select the ray aiming mode: "paraxial" (jit-traced default),
        "iterative" (Broyden onto the stop), or "robust" (continuation);
        cache=True wraps the aimer with result caching
        (reference: optic/optic.py:516, rays/ray_generator.py:29-43)."""
        from optiland_tpu.core.aiming import create_ray_aimer

        self.ray_aiming_config = {"method": method, "cache": cache, **kwargs}
        self._aimer = create_ray_aimer(method, self, cache=cache, **kwargs)

    def _aimed_trace(self, Hx, Hy, Px, Py, wavelength, record):
        """Trace via a real ray aimer (non-paraxial modes)."""
        x, y, z, L, M, N = self._aimer.aim_rays(
            (Hx, Hy), wavelength, (Px, Py)
        )
        from optiland_tpu.core.rays import RealRays

        Px = jnp.atleast_1d(jnp.asarray(Px, float))
        Py = jnp.atleast_1d(jnp.asarray(Py, float))
        if self.apodization is not None:
            intensity = self.apodization.get_intensity(Px, Py)
        else:
            intensity = jnp.ones_like(Px)
        wl = jnp.ones_like(x) * wavelength
        rays = RealRays.create(x, y, z, L, M, N, intensity, wl)
        final, history = _trace_rays_jit()(
            self.system, rays, record, self._pol_state(), self._next_key()
        )
        return TraceResult(final, history)

    def _invalidate(self):
        self._system_cache = None

    # ---------------- mutation API (reference: optic/optic_updater.py) ----

    def set_radius(self, value: float, surface_number: int):
        self.surfaces.surfaces[surface_number].radius = value
        self._invalidate()

    def set_conic(self, value: float, surface_number: int):
        self.surfaces.surfaces[surface_number].conic = value
        self._invalidate()

    def set_thickness(self, value: float, surface_number: int):
        self.surfaces.surfaces[surface_number].thickness = value
        self._invalidate()

    def set_index(self, value: float, surface_number: int):
        from optiland_tpu.materials import IdealMaterial

        self.surfaces.surfaces[surface_number].material = IdealMaterial(value)
        self._invalidate()

    def set_material(self, material, surface_number: int):
        self.surfaces.surfaces[surface_number].material = material
        self._invalidate()

    def set_asphere_coeff(self, value: float, surface_number: int,
                          coeff_number: int):
        s = self.surfaces.surfaces[surface_number]
        coeffs = list(s.coefficients)
        while len(coeffs) <= coeff_number:
            coeffs.append(0.0)
        coeffs[coeff_number] = value
        s.coefficients = tuple(coeffs)
        self._invalidate()

    @property
    def updater(self) -> "Optic":
        """Reference-API facade: the reference routes mutations through
        ``optic.updater.set_radius(...) / scale_system() / flip()`` etc.
        (reference: optic/optic_updater.py:24). Our Optic exposes the same
        method names directly, so the facade is the optic itself."""
        return self

    def set_norm_radius(self, value: float, surface_number: int):
        """Set a Zernike/Forbes surface's normalization radius, stored in
        geo_p1 (reference: optic_updater.py:125)."""
        self.surfaces.surfaces[surface_number].geo_p1 = value
        self._invalidate()

    def scale_system(self, scale_factor: float):
        """Scale all lengths by a factor, including geometry coefficients
        with their per-type exponents (reference: optic_updater.py:175-204
        + each geometry's ``scale``: even_asphere.py:82-91 C_i s^(1-2(i+1)),
        polynomial.py:93-103 C_ij s^(1-(i+j)), zernike.py:139-147 and
        chebyshev.py:110-119 norm radii + linear coefficients,
        toroidal.py:261-282, plane_grating.py:48-54, grid_sag.py:155-163;
        the reference deliberately leaves odd-asphere coefficients
        unscaled, odd_asphere.py:73-81)."""
        sf = float(scale_factor)
        for s in self.surfaces.surfaces:
            if np.isfinite(s.radius):
                s.radius *= sf
            if np.isfinite(s.thickness):
                s.thickness *= sf
            if isinstance(s.aperture, (int, float)):
                s.aperture *= sf
            elif s.aperture is not None:
                s.aperture.scale(sf)

            st = s.surface_type or "standard"
            c = list(s.coefficients) if s.coefficients else []
            if st == "even_asphere" and c:
                s.coefficients = tuple(
                    ci * sf ** (1 - 2 * (i + 1)) for i, ci in enumerate(c)
                )
            elif st == "polynomial" and c:
                side = int(np.ceil(np.sqrt(len(c))))
                s.coefficients = tuple(
                    ci * sf ** (1 - (k // side + k % side))
                    for k, ci in enumerate(c)
                )
            elif st in ("zernike", "forbes_qbfs", "forbes_q2d"):
                s.coefficients = tuple(ci * sf for ci in c)
                if np.isfinite(s.geo_p1):
                    s.geo_p1 *= sf
            elif st == "chebyshev":
                s.coefficients = tuple(ci * sf for ci in c)
                s.geo_p1 *= sf
                s.geo_p2 *= sf
            elif st == "toroidal":
                if np.isfinite(s.geo_p1):
                    s.geo_p1 *= sf  # Y-Z curve radius
                if c:
                    s.coefficients = tuple(
                        ci * sf ** (1 - 2 * (i + 1))
                        for i, ci in enumerate(c)
                    )
            elif st == "grating":
                s.geo_p1 *= sf  # grating period
            elif st == "grid_sag":
                s.coefficients = tuple(ci * sf for ci in c)
                kind, xs, ys = s.geo_aux
                s.geo_aux = (kind, tuple(v * sf for v in xs),
                             tuple(v * sf for v in ys))
        if self.aperture and self.aperture.ap_type == "EPD":
            self.aperture = Aperture("EPD", self.aperture.value * sf)
        self._invalidate()

    def update(self):
        """Re-apply pickups then solves (reference: optic_updater.py update)."""
        self.pickups.apply()
        self.solves.apply()
        self._invalidate()

    def image_solve(self):
        """Quick-focus the image plane (reference: optic_updater.py)."""
        from optiland_tpu.solves import QuickFocusSolve

        QuickFocusSolve(self).apply()

    def flip(self):
        """Reverse the optical system (reference: surface_group.py:458-552)."""
        surfs = self.surfaces.surfaces
        inner = surfs[1:-1]
        # reverse element order; radii change sign; thickness shifts by one
        thicknesses = [s.thickness for s in inner]
        new_inner = list(reversed(inner))
        # material[j] is the medium AFTER inner surface j; after reversal the
        # medium after new surface i is the medium BEFORE old surface
        # (m-1-i), i.e. reversed(mats[:-1]) with image space appended
        # (assumes air object/image space, like the reference's
        # surface_group.py:458-552 flip).
        mats = [s.material for s in inner]
        new_mats = list(reversed(mats[:-1])) + ["air"] if mats else []
        for i, s in enumerate(new_inner):
            if np.isfinite(s.radius):
                s.radius = -s.radius
            s.material = new_mats[i] if i < len(new_mats) else "air"
        rev_thick = list(reversed(thicknesses[:-1])) + [thicknesses[-1]]
        for s, t in zip(new_inner, rev_thick):
            s.thickness = t
        self.surfaces.surfaces = [surfs[0]] + new_inner + [surfs[-1]]
        self._invalidate()

    # ---------------- compilation ----------------

    @property
    def object_surface(self) -> SurfaceDef:
        return self.surfaces.surfaces[0]

    @property
    def image_surface(self) -> SurfaceDef:
        return self.surfaces.surfaces[-1]

    @property
    def primary_wavelength(self) -> float:
        return self.wavelengths.primary_wavelength

    @property
    def system(self) -> System:
        """Compile (or fetch cached) the immutable system pytree."""
        if self._system_cache is None:
            self._system_cache = self._compile()
        return self._system_cache

    def _compile(self) -> System:
        surfs = self.surfaces.surfaces
        if len(surfs) < 3:
            raise ValueError("System needs at least object, one surface, image.")
        S = len(surfs)

        # Resolve materials; mirror => reflective with unchanged medium.
        prev_mat = AIR
        for s in surfs:
            spec = s.material
            if isinstance(spec, str) and spec.lower() == "mirror":
                s._is_reflective = True
                s._material_obj = prev_mat
            else:
                s._is_reflective = False
                s._material_obj = resolve_material(spec)
            prev_mat = s._material_obj

        dt = jnp.result_type(float)
        max_nc = max([len(s.coefficients) for s in surfs] + [1])
        mats = [s._material_obj for s in surfs]
        max_nt = max([m.n_table.shape[0] for m in mats] + [0])
        max_kt = max([m.k_table.shape[0] for m in mats] + [0])

        def pad_table(tab, n):
            if n == 0:
                return np.zeros((0, 2))
            if tab.shape[0] == 0:
                # benign placeholder: flat zeros over a dummy range
                out = np.zeros((n, 2))
                out[:, 0] = np.linspace(0.1, 20.0, n)
                return out
            out = np.vstack([tab, np.repeat(tab[-1:], n - tab.shape[0], axis=0)])
            return out

        radius = np.array([float(s.radius) for s in surfs])
        geom_code = []
        for s in surfs:
            st = s.surface_type or "standard"
            if st == "grating":
                # plane or standard base shape; diffraction is the interaction
                code = geom.PLANE if np.isinf(s.radius) else geom.STANDARD
            else:
                code = _GEOM_CODES.get(st)
                if code is None:
                    code = geom.CUSTOM_GEOMETRIES.get(st)
            if code is None:
                raise NotImplementedError(f"surface_type {st!r} not yet supported")
            if code == geom.STANDARD and np.isinf(s.radius) and st != "grating":
                code = geom.PLANE
            geom_code.append(code)
        geom_aux = tuple(s.geo_aux for s in surfs)

        coeffs = np.zeros((S, max_nc))
        for i, s in enumerate(surfs):
            if s.coefficients:
                coeffs[i, : len(s.coefficients)] = s.coefficients

        # Flatten chained coordinate systems into the per-surface flat
        # (dx, dy, dz, rx, ry, rz) record the kernels consume. An explicit
        # CS fully defines the surface frame: its effective translation
        # replaces the nominal cumulative-thickness vertex position
        # (reference: coordinate_system.py:144-164 get_effective_transform;
        # surfaces/factories/coordinate_system_factory.py absolute mode).
        th = np.array([float(s.thickness) for s in surfs])
        nominal_pos = np.concatenate(
            [[-th[0]], np.concatenate([[0.0], np.cumsum(th[1:-1])])]
        )
        eff = []
        for i, s in enumerate(surfs):
            if s.coordinate_system is not None:
                (tx, ty, tz), (erx, ery, erz) = (
                    s.coordinate_system.effective_euler_transform()
                )
                eff.append((tx, ty, tz - nominal_pos[i], erx, ery, erz))
            else:
                eff.append((s.dx, s.dy, s.dz, s.rx, s.ry, s.rz))
        e_dx, e_dy, e_dz, e_rx, e_ry, e_rz = (
            [row[k] for row in eff] for k in range(6)
        )

        stack = SurfaceStack(
            radius=jnp.asarray(radius, dt),
            conic=jnp.asarray([float(s.conic) for s in surfs], dt),
            coeffs=jnp.asarray(coeffs, dt),
            geo_p1=jnp.asarray([float(s.geo_p1) for s in surfs], dt),
            geo_p2=jnp.asarray([float(s.geo_p2) for s in surfs], dt),
            thickness=jnp.asarray([float(s.thickness) for s in surfs], dt),
            dx=jnp.asarray([float(v) for v in e_dx], dt),
            dy=jnp.asarray([float(v) for v in e_dy], dt),
            dz=jnp.asarray([float(v) for v in e_dz], dt),
            rx=jnp.asarray([float(v) for v in e_rx], dt),
            ry=jnp.asarray([float(v) for v in e_ry], dt),
            rz=jnp.asarray([float(v) for v in e_rz], dt),
            ap_max=jnp.asarray(
                [
                    float(s.aperture) / 2
                    if isinstance(s.aperture, (int, float))
                    else np.inf
                    for s in surfs
                ],
                dt,
            ),
            mat_coeffs=jnp.stack([jnp.asarray(m.padded_coefficients, dt) for m in mats]),
            ntab=jnp.asarray(
                np.stack([pad_table(m.n_table, max_nt) for m in mats]), dt
            ),
            ktab=jnp.asarray(
                np.stack([pad_table(m.k_table, max_kt) for m in mats]), dt
            ),
        )

        # Decenters without tilts still need the translate path; only the
        # rotation work is gated by has_tilts.
        has_rot = any(r != 0 for r in (*e_rx, *e_ry, *e_rz))
        has_abs = any(m.has_absorption for m in mats)

        # Resolve coatings ("fresnel" shorthand uses the adjacent materials;
        # reference: surfaces/standard_surface.py:106-114 set_fresnel_coating)
        from optiland_tpu.coatings import BaseCoating, FresnelCoating

        coatings_resolved = []
        for i, s in enumerate(surfs):
            c = getattr(s, "coating", None)
            if isinstance(c, str) and c.lower() == "fresnel":
                mat_pre = mats[i - 1] if i > 0 else AIR
                c = FresnelCoating(mat_pre, mats[i])
            coatings_resolved.append(c)
        if self.polarization == "ignore" and any(
            c is not None and c.polarization_dependent for c in coatings_resolved
        ):
            raise ValueError(
                "Polarization must be set when surfaces have "
                "polarization-dependent coatings."
            )

        if self.aperture is None:
            raise ValueError("No aperture is defined on the optical system.")
        if not self.wavelengths.wavelengths:
            raise ValueError("No wavelengths defined on the optical system.")
        if not self.fields.fields:
            raise ValueError("No fields defined on the optical system.")

        cfg = SystemConfig(
            num_surfaces=S,
            stop_index=self.surfaces.stop_index,
            obj_infinite=bool(np.isinf(surfs[0].thickness)),
            geom_codes=tuple(geom_code),
            mat_formulas=tuple(int(m.formula_code) for m in mats),
            reflective=tuple(bool(s._is_reflective) for s in surfs),
            geom_aux=geom_aux,
            apertures=tuple(
                s.aperture if not isinstance(s.aperture, (int, float, type(None)))
                else None
                for s in surfs
            ),
            interactions=tuple(
                ("thin_lens",) if s.surface_type == "paraxial"
                else ("phase", s.phase_profile) if s.phase_profile is not None
                else ("grating", int(s.geo_aux[1])) if (
                    s.surface_type == "grating" and s.geo_aux is not None
                )
                else None
                for s in surfs
            ),
            coatings=tuple(coatings_resolved),
            bsdfs=tuple(getattr(s, "bsdf", None) for s in surfs),
            polarized=self.polarization != "ignore",
            has_tilts=has_rot,
            has_absorption=has_abs,
            aperture_type=self.aperture.ap_type,
            field_type=self.fields.field_type,
            primary_index=self.wavelengths.primary_index,
            obj_telecentric=(self.obj_space_telecentric
                             or self.fields.telecentric),
        )

        return System(
            stack=stack,
            aperture_value=jnp.asarray(self.aperture.value, dt),
            field_x=jnp.asarray(self.fields.x_fields, dt),
            field_y=jnp.asarray(self.fields.y_fields, dt),
            vig_x=jnp.asarray([f.vx for f in self.fields.fields], dt),
            vig_y=jnp.asarray([f.vy for f in self.fields.fields], dt),
            wavelengths=jnp.asarray(self.wavelengths.get_wavelengths(), dt),
            cfg=cfg,
        )

    # ---------------- tracing ----------------

    @property
    def paraxial(self) -> ParaxialView:
        return ParaxialView(self)

    @property
    def aberrations(self):
        """Third-order aberration view (reference API parity:
        Optic.aberrations, optic/optic.py:111-129)."""
        from optiland_tpu.aberrations import Aberrations

        return Aberrations(self)

    def draw(self, **kwargs):
        """2D cross-section with traced rays
        (reference: Optic.draw, optic/optic.py:566)."""
        from optiland_tpu.visualization import draw_system

        return draw_system(self, **kwargs)

    def draw3D(self, **kwargs):
        """3D layout with traced ray bundles
        (reference: Optic.draw3D, optic/optic.py:612)."""
        from optiland_tpu.visualization import OpticViewer3D

        return OpticViewer3D(self).view(**kwargs)

    def draw3D_interactive(self, path=None, open_browser=False, **kwargs):
        """Write the interactive WebGL 3D viewer page (camera orbit/zoom/
        pan + pickable surfaces) and return its path
        (reference capability: visualization/system/optic_viewer_3d.py:22
        — the VTK interactive viewer)."""
        from optiland_tpu.visualization import OpticViewer3DHTML

        return OpticViewer3DHTML(self).view(
            path=path, open_browser=open_browser, **kwargs
        )

    def info(self):
        """Print the prescription tables
        (reference: Optic.info, optic/optic.py:660-690)."""
        from optiland_tpu.visualization import LensInfoViewer

        return LensInfoViewer(self).view()

    def trace(
        self,
        Hx=0.0,
        Hy=0.0,
        wavelength=None,
        num_rays: int = 100,
        distribution="hexapolar",
        record: bool = True,
    ) -> TraceResult:
        """Trace a pupil distribution of real rays
        (reference: raytrace/real_ray_tracer.py:58-118)."""
        if wavelength is None:
            wavelength = self.primary_wavelength
        wavelength = _concrete_wavelength(wavelength)
        if isinstance(distribution, str):
            distribution = create_distribution(distribution)
            distribution.generate_points(num_rays)
        Px = np.atleast_1d(np.asarray(distribution.x, float))
        Py = np.atleast_1d(np.asarray(distribution.y, float))
        Hx = np.atleast_1d(np.asarray(Hx, float))
        Hy = np.atleast_1d(np.asarray(Hy, float))
        nf, npup = len(Hx), len(Px)
        Hx_full = np.repeat(Hx, npup)
        Hy_full = np.repeat(Hy, npup)
        Px_full = np.tile(Px, nf)
        Py_full = np.tile(Py, nf)
        # Vignetting factors are applied INSIDE ray generation from the
        # compiled system's vig_x/vig_y (core/raygen.py:213-230) — do not
        # also scale the pupil here.
        if self._aimer is not None and self._aimer.name != "paraxial":
            return self._aimed_trace(
                Hx_full, Hy_full, Px_full, Py_full, wavelength, record
            )
        fn = _trace_jit() if isinstance(wavelength, float) else _trace_jit_dyn()
        final, history = fn(
            self.system, Hx_full, Hy_full, Px_full, Py_full, wavelength, record,
            self.apodization, self._pol_state(), self._next_key(),
        )
        return TraceResult(final, history)

    def trace_generic(self, Hx, Hy, Px, Py, wavelength, record: bool = True):
        """Trace rays at explicit field/pupil coordinates
        (reference: raytrace/real_ray_tracer.py:120+)."""
        Hx, Hy, Px, Py = np.broadcast_arrays(
            np.atleast_1d(np.asarray(Hx, float)),
            np.atleast_1d(np.asarray(Hy, float)),
            np.atleast_1d(np.asarray(Px, float)),
            np.atleast_1d(np.asarray(Py, float)),
        )
        wavelength = _concrete_wavelength(wavelength)
        if self._aimer is not None and self._aimer.name != "paraxial":
            return self._aimed_trace(Hx, Hy, Px, Py, wavelength, record)
        fn = _trace_jit() if isinstance(wavelength, float) else _trace_jit_dyn()
        final, history = fn(
            self.system, Hx, Hy, Px, Py, wavelength, record, self.apodization,
            self._pol_state(), self._next_key(),
        )
        return TraceResult(final, history)
