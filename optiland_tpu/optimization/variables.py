"""Optimization variables: named views into the system pytree.

A variable identifies one scalar leaf-slot of the compiled system (e.g.
radius of surface 2) together with a scaler and optional bounds. Variables
compile to a pure function ``apply(system, x) -> system`` mapping an
optimizer vector into an updated system — the functional replacement for
the reference's mutating VariableBehavior classes
(reference: optiland/optimization/variable/*.py).
"""

from __future__ import annotations

import jax.numpy as jnp

from optiland_tpu.core.system import System
from optiland_tpu.optimization.scaling import IdentityScaler, LinearScaler


class VariableBehavior:
    """Get/set one scalar in the system pytree."""

    default_scaler = IdentityScaler

    def __init__(self, surface_number: int, **kwargs):
        self.surface_number = surface_number

    def get(self, system: System):
        raise NotImplementedError

    def set(self, system: System, value):
        raise NotImplementedError


class RadiusVariable(VariableBehavior):
    """Radius of curvature (reference: variable/radius.py)."""

    @staticmethod
    def default_scaler():
        return LinearScaler(factor=1 / 100.0, offset=-1.0)

    def get(self, system):
        return system.stack.radius[self.surface_number]

    def set(self, system, value):
        stack = system.stack
        return system.replace(
            stack=stack.replace(
                radius=stack.radius.at[self.surface_number].set(value)
            )
        )


class ReciprocalRadiusVariable(VariableBehavior):
    """Curvature 1/R (reference: variable/reciprocal_radius.py)."""

    @staticmethod
    def default_scaler():
        return LinearScaler(factor=10.0)

    def get(self, system):
        r = system.stack.radius[self.surface_number]
        return jnp.where(jnp.isinf(r), 0.0, 1.0 / r)

    def set(self, system, value):
        stack = system.stack
        radius = jnp.where(value == 0, jnp.inf, 1.0 / jnp.where(value == 0, 1.0, value))
        return system.replace(
            stack=stack.replace(
                radius=stack.radius.at[self.surface_number].set(radius)
            )
        )


class ConicVariable(VariableBehavior):
    """Conic constant (reference: variable/conic.py)."""

    def get(self, system):
        return system.stack.conic[self.surface_number]

    def set(self, system, value):
        stack = system.stack
        return system.replace(
            stack=stack.replace(
                conic=stack.conic.at[self.surface_number].set(value)
            )
        )


class ThicknessVariable(VariableBehavior):
    """Axial thickness after a surface (reference: variable/thickness.py)."""

    @staticmethod
    def default_scaler():
        return LinearScaler(factor=1 / 10.0, offset=-1.0)

    def get(self, system):
        return system.stack.thickness[self.surface_number]

    def set(self, system, value):
        stack = system.stack
        return system.replace(
            stack=stack.replace(
                thickness=stack.thickness.at[self.surface_number].set(value)
            )
        )


class AsphereCoeffVariable(VariableBehavior):
    """One aspheric coefficient (reference: variable/asphere_coeff.py)."""

    def __init__(self, surface_number: int, coeff_number: int = 0, **kwargs):
        super().__init__(surface_number)
        self.coeff_number = coeff_number

    @staticmethod
    def default_scaler():
        return LinearScaler(factor=1e4)

    def get(self, system):
        return system.stack.coeffs[self.surface_number, self.coeff_number]

    def set(self, system, value):
        stack = system.stack
        return system.replace(
            stack=stack.replace(
                coeffs=stack.coeffs.at[
                    self.surface_number, self.coeff_number
                ].set(value)
            )
        )


class TiltVariable(VariableBehavior):
    """Surface tilt about x or y (reference: variable/tilt.py)."""

    def __init__(self, surface_number: int, axis: str = "x", **kwargs):
        super().__init__(surface_number)
        self.axis = axis

    def get(self, system):
        return getattr(system.stack, f"r{self.axis}")[self.surface_number]

    def set(self, system, value):
        stack = system.stack
        field = f"r{self.axis}"
        arr = getattr(stack, field).at[self.surface_number].set(value)
        return system.replace(stack=stack.replace(**{field: arr}))


class DecenterVariable(VariableBehavior):
    """Surface decenter in x or y (reference: variable/decenter.py)."""

    def __init__(self, surface_number: int, axis: str = "x", **kwargs):
        super().__init__(surface_number)
        self.axis = axis

    def get(self, system):
        return getattr(system.stack, f"d{self.axis}")[self.surface_number]

    def set(self, system, value):
        stack = system.stack
        field = f"d{self.axis}"
        arr = getattr(stack, field).at[self.surface_number].set(value)
        return system.replace(stack=stack.replace(**{field: arr}))


class CoeffIndexVariable(VariableBehavior):
    """One entry of the surface coefficient vector by flat index — serves
    zernike/odd-asphere/toroidal coefficient variables
    (reference: variable/zernike_coeff.py, polynomial_coeff.py)."""

    def __init__(self, surface_number: int, coeff_number: int = 0, **kwargs):
        super().__init__(surface_number)
        self.coeff_number = coeff_number

    def get(self, system):
        return system.stack.coeffs[self.surface_number, self.coeff_number]

    def set(self, system, value):
        stack = system.stack
        return system.replace(
            stack=stack.replace(
                coeffs=stack.coeffs.at[
                    self.surface_number, self.coeff_number
                ].set(value)
            )
        )


class MatrixCoeffVariable(CoeffIndexVariable):
    """A (row, col) entry of a square row-major coefficient matrix — serves
    chebyshev/polynomial_xy variables (reference: variable/chebyshev_coeff.py,
    polynomial_coeff.py). ``coeff_index`` is the (i, j) tuple; ``side`` the
    matrix side length used at surface build time."""

    def __init__(self, surface_number: int, coeff_index=(0, 0),
                 side: int | None = None, **kwargs):
        i, j = coeff_index
        if side is None:
            raise ValueError(
                "MatrixCoeffVariable requires side= (the square coefficient "
                "matrix side length used when the surface was added)."
            )
        super().__init__(surface_number, coeff_number=i * side + j)


class NormRadiusVariable(VariableBehavior):
    """Normalization radius (geo_p1) of Zernike/Forbes surfaces
    (reference: variable/norm_radius.py)."""

    def get(self, system):
        return system.stack.geo_p1[self.surface_number]

    def set(self, system, value):
        stack = system.stack
        return system.replace(
            stack=stack.replace(
                geo_p1=stack.geo_p1.at[self.surface_number].set(value)
            )
        )


class IndexVariable(VariableBehavior):
    """Refractive index of a constant-index (ideal) material
    (reference: variable/index.py; only CONST_N materials are continuously
    adjustable — catalog glasses are categorical, see MaterialVariable)."""

    def __init__(self, surface_number: int, wavelength=None, **kwargs):
        super().__init__(surface_number)

    @staticmethod
    def default_scaler():
        return LinearScaler(factor=1.0, offset=-1.5)

    def get(self, system):
        return system.stack.mat_coeffs[self.surface_number, 0]

    def set(self, system, value):
        from optiland_tpu.materials.dispersion import CONST_N

        if system.cfg.mat_formulas[self.surface_number] != CONST_N:
            raise ValueError(
                "index variables require a constant-index (ideal) material "
                f"on surface {self.surface_number}; use a 'material' "
                "variable for catalog glasses."
            )
        stack = system.stack
        return system.replace(
            stack=stack.replace(
                mat_coeffs=stack.mat_coeffs.at[
                    self.surface_number, 0
                ].set(value)
            )
        )


class GridSagVariable(CoeffIndexVariable):
    """One node of a grid-sag surface's sag table (stored in the coeff
    vector, row-major) (reference: variable/grid_sag.py)."""

    def __init__(self, surface_number: int, row: int = 0, col: int = 0,
                 num_cols: int | None = None, **kwargs):
        if num_cols is None:
            raise ValueError("GridSagVariable requires num_cols=len(x_grid).")
        super().__init__(surface_number, coeff_number=row * num_cols + col)


class NurbsControlPointVariable(CoeffIndexVariable):
    """z-coordinate of a NURBS control point (reference: variable/nurbs.py).

    The coefficient vector stores P as (3, nu, nv) row-major followed by W.
    """

    def __init__(self, surface_number: int, index_u: int = 0,
                 index_v: int = 0, nu: int | None = None,
                 nv: int | None = None, axis: int = 2, **kwargs):
        if nu is None or nv is None:
            raise ValueError(
                "NurbsControlPointVariable requires nu=/nv= (control grid "
                "shape)."
            )
        super().__init__(
            surface_number,
            coeff_number=axis * nu * nv + index_u * nv + index_v,
        )


class NurbsWeightVariable(CoeffIndexVariable):
    """Weight of a NURBS control point (reference: variable/nurbs.py)."""

    def __init__(self, surface_number: int, index_u: int = 0,
                 index_v: int = 0, nu: int | None = None,
                 nv: int | None = None, **kwargs):
        if nu is None or nv is None:
            raise ValueError(
                "NurbsWeightVariable requires nu=/nv= (control grid shape)."
            )
        super().__init__(
            surface_number,
            coeff_number=3 * nu * nv + index_u * nv + index_v,
        )


class GenericVariable(VariableBehavior):
    """User-defined variable from getter/setter functions on the system.

    The JAX analog of the reference's TorchVariable
    (reference: optimization/variable/torch.py): expose any scalar that a
    pure function can read from / write into the system pytree.
    """

    def __init__(self, getter, setter, **kwargs):
        super().__init__(kwargs.pop("surface_number", 0))
        self._getter = getter
        self._setter = setter

    def get(self, system):
        return self._getter(system)

    def set(self, system, value):
        return self._setter(system, value)


_BEHAVIORS = {
    "radius": RadiusVariable,
    "reciprocal_radius": ReciprocalRadiusVariable,
    "conic": ConicVariable,
    "thickness": ThicknessVariable,
    "asphere_coeff": AsphereCoeffVariable,
    "tilt": TiltVariable,
    "decenter": DecenterVariable,
    "zernike_coeff": CoeffIndexVariable,
    "polynomial_coeff": MatrixCoeffVariable,
    "chebyshev_coeff": MatrixCoeffVariable,
    "forbes_qbfs_coeff": CoeffIndexVariable,
    "forbes_qnormalslope_coeff": CoeffIndexVariable,
    "forbes_q2d_coeff": CoeffIndexVariable,
    "norm_radius": NormRadiusVariable,
    "index": IndexVariable,
    "grid_sag": GridSagVariable,
    "nurbs_control_point": NurbsControlPointVariable,
    "nurbs_weight": NurbsWeightVariable,
    "generic": GenericVariable,
}


class MaterialVariable:
    """Categorical glass variable: value is the glass NAME, substitutions
    mutate the Optic directly (reference: optimization/variable/material.py:24).

    Not part of the continuous optimization vector — consumed by
    GlassExpert's greedy search.
    """

    def __init__(self, optic, surface_number: int, glass_selection,
                 **kwargs):
        self.optic = optic
        self.surface_number = surface_number
        self.glass_selection = list(glass_selection)

    @property
    def value(self) -> str:
        mat = self.optic.surfaces.surfaces[self.surface_number].material
        if isinstance(mat, str):
            return mat
        return getattr(mat, "name", str(mat))

    def update(self, glass_name: str):
        self.optic.set_material(glass_name, self.surface_number)

    def __str__(self):
        return f"Material, Surface {self.surface_number}"


class Variable:
    """A typed optimization variable with scaler and bounds
    (reference: variable/variable.py:40)."""

    def __init__(
        self,
        optic,
        var_type: str,
        scaler=None,
        min_val=None,
        max_val=None,
        **kwargs,
    ):
        if var_type not in _BEHAVIORS:
            raise ValueError(f"Unknown variable type {var_type!r}")
        self.optic = optic
        self.var_type = var_type
        self.behavior = _BEHAVIORS[var_type](**kwargs)
        if scaler is None:
            ds = getattr(type(self.behavior), "default_scaler", IdentityScaler)
            scaler = ds()
        self.scaler = scaler
        self.min_val = min_val
        self.max_val = max_val

    def initial_scaled_value(self, system) -> float:
        return float(self.scaler.scale(self.behavior.get(system)))

    def apply(self, system, scaled_value):
        value = self.scaler.inverse_scale(scaled_value)
        if self.min_val is not None or self.max_val is not None:
            lo = -jnp.inf if self.min_val is None else self.min_val
            hi = jnp.inf if self.max_val is None else self.max_val
            value = jnp.clip(value, lo, hi)
        return self.behavior.set(system, value)
