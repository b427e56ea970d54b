"""Compiled system description: stacked per-surface parameter pytrees.

The reference represents an optical system as a graph of mutable Python
objects (Optic -> SurfaceGroup -> Surface -> Geometry/Material; reference:
optiland/optic/optic.py:59, surfaces/surface_group.py:27). The TPU-native
representation is a pair of:

  * ``SurfaceStack`` — stacked per-surface arrays (row 0 = object surface,
    last row = image surface). All floating-point leaves are differentiable;
    integer code arrays drive ``lax.switch`` dispatch inside the trace scan.
  * ``SystemConfig`` — hashable static structure (counts, flags, modes) that
    selects the compiled program.

``System`` bundles both plus system-level parameters (aperture value,
fields, wavelengths) and is itself a pytree, so ``jax.jit``/``jax.grad``
work directly on it.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from flax import struct

from optiland_tpu.materials import dispersion


@struct.dataclass
class SurfaceStack:
    """Stacked per-surface parameters (S rows incl. object and image).

    Attributes:
        radius: (S,) radii of curvature (inf for planes).
        conic: (S,) conic constants.
        coeffs: (S, NC) geometry coefficient vectors (zero-padded).
        thickness: (S,) axial distance from surface s to s+1; row 0 is the
            object distance (may be inf), last row is 0.
        dx, dy, dz: (S,) decenters (dz adds to the cumulative-thickness
            vertex position — the flattened form of the reference's chained
            coordinate systems, reference: coordinate_system.py:28-107).
        rx, ry, rz: (S,) Euler tilt angles (radians).
        geom_code: (S,) int32 geometry family codes.
        is_reflective: (S,) bool mirror flags.
        ap_max: (S,) physical-aperture semi-diameters (inf = unbounded).
        mat_formula: (S,) int32 dispersion formula code of material_post.
        mat_coeffs: (S, MAX_COEFFS) dispersion coefficients of material_post.
        ntab: (S, T, 2) tabulated wavelength/index data (T may be 0).
        ktab: (S, TK, 2) tabulated wavelength/extinction data (TK may be 0).
    """

    radius: jnp.ndarray
    conic: jnp.ndarray
    coeffs: jnp.ndarray
    geo_p1: jnp.ndarray
    geo_p2: jnp.ndarray
    thickness: jnp.ndarray
    dx: jnp.ndarray
    dy: jnp.ndarray
    dz: jnp.ndarray
    rx: jnp.ndarray
    ry: jnp.ndarray
    rz: jnp.ndarray
    ap_max: jnp.ndarray
    mat_coeffs: jnp.ndarray
    ntab: jnp.ndarray
    ktab: jnp.ndarray

    @property
    def num_surfaces(self) -> int:
        return self.radius.shape[0]


@dataclasses.dataclass(frozen=True)
class SystemConfig:
    """Hashable static structure of a system (selects the compiled program).

    Geometry family codes, dispersion formula codes, and mirror flags are
    *static*: the trace loop unrolls over surfaces with each step's physics
    resolved at trace time, giving XLA one fully-fused elementwise DAG with
    no data-dependent branches.
    """

    num_surfaces: int
    stop_index: int
    obj_infinite: bool
    geom_codes: tuple  # tuple[int], per surface
    mat_formulas: tuple  # tuple[int], material_post per surface
    reflective: tuple  # tuple[bool], per surface
    geom_aux: tuple = None  # tuple[hashable|None], static per-surface extras
    apertures: tuple = None  # tuple[BaseAperture|None], static clip objects
    # Per-surface interaction spec: None = refract/reflect (default),
    # ("thin_lens",) = ideal lens with f in stack.geo_p1,
    # ("phase", profile) = generalized Snell via a BasePhaseProfile.
    interactions: tuple = None
    coatings: tuple = None  # tuple[BaseCoating|None], static per surface
    bsdfs: tuple = None  # tuple[BaseBSDF|None], static per surface
    polarized: bool = False  # carry the 3x3 polarization matrix p
    has_tilts: bool = False
    has_absorption: bool = False
    aperture_type: str = "EPD"
    field_type: str = "angle"
    primary_index: int = 0
    obj_telecentric: bool = False


@struct.dataclass
class System:
    """A complete optical system: stack + system-level parameters."""

    stack: SurfaceStack
    aperture_value: jnp.ndarray  # scalar
    field_x: jnp.ndarray  # (F,)
    field_y: jnp.ndarray  # (F,)
    vig_x: jnp.ndarray  # (F,)
    vig_y: jnp.ndarray  # (F,)
    wavelengths: jnp.ndarray  # (W,)
    cfg: SystemConfig = struct.field(pytree_node=False)

    @property
    def primary_wavelength(self):
        return self.wavelengths[self.cfg.primary_index]


def positions(stack: SurfaceStack) -> jnp.ndarray:
    """Vertex z-positions of all surfaces (surface 1 at z = 0).

    pos[0] = -thickness[0] (object distance, possibly -inf);
    pos[k] = sum of thickness[1:k] for k >= 1.
    (reference: surfaces/surface_group.py:156-161 derives the same from
    chained coordinate systems.)
    """
    t = stack.thickness
    inner = jnp.concatenate([jnp.zeros((1,), t.dtype), jnp.cumsum(t[1:-1])])
    return jnp.concatenate([(-t[0])[None], inner])


def n_of(formula_code: int, mat_coeffs, ntab, w):
    """Refractive index of one surface's material_post at wavelength(s) w.

    ``formula_code`` is a static Python int, so the formula is selected at
    trace time (no runtime branch).
    """
    if formula_code == dispersion.TABULATED_N:
        return jnp.interp(w, ntab[:, 0], ntab[:, 1])
    return dispersion.n_formula_static(formula_code, mat_coeffs, w)


def k_of(ktab, w):
    """Extinction coefficient from a per-surface table (zeros if empty)."""
    if ktab.shape[0] == 0:
        return jnp.zeros_like(w)
    return jnp.interp(w, ktab[:, 0], ktab[:, 1])


def n_all(stack: SurfaceStack, cfg: SystemConfig, w) -> jnp.ndarray:
    """(S,) refractive indices of every surface's material_post at scalar w."""
    w = jnp.asarray(w, dtype=stack.radius.dtype)
    vals = [
        n_of(cfg.mat_formulas[s], stack.mat_coeffs[s], stack.ntab[s], w)
        for s in range(cfg.num_surfaces)
    ]
    return jnp.stack(vals)
