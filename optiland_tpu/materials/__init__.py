"""Material models for optiland_tpu.

A material is a lightweight descriptor that compiles down to numeric
dispersion payloads — a formula code plus a padded coefficient vector, and
optional tabulated n/k arrays — which the trace engine evaluates inside
``lax.scan`` via ``lax.switch``. This replaces the reference's per-material
Python objects called during the trace
(reference: optiland/materials/base.py:22, material.py:22, ideal.py:22,
abbe.py:232).

Classes:
    IdealMaterial: constant n and k.
    Material: by-name lookup in the refractiveindex.info catalog.
    MaterialFile: parse a refractiveindex.info YAML file directly.
    AbbeMaterial: (nd, Vd) model, polynomial or Buchdahl.
    AbbeMaterialE: (ne, Ve) Buchdahl e-line model.
    Mirror: sentinel handled by the surface factory (reflective surfaces).
"""

from __future__ import annotations

import numpy as np

from optiland_tpu.materials import dispersion
from optiland_tpu.materials.catalog import (
    get_catalog,
    get_glass_model_coefficients,
)
from optiland_tpu.materials.dispersion import (
    BUCHDAHL,
    CONST_N,
    MAX_COEFFS,
    TABULATED_N,
    k_from_table,
    n_from_formula,
    n_from_table,
    pad_coefficients,
)

_EMPTY_TABLE = np.zeros((0, 2))


class BaseMaterial:
    """Base class for material descriptors.

    Attributes:
        formula_code: dispersion formula code (see materials.dispersion).
        coefficients: raw (unpadded) coefficient array.
        n_table: (T, 2) tabulated wavelength/index data (may be empty).
        k_table: (T, 2) tabulated wavelength/extinction data (may be empty).
    """

    _registry: dict[str, type] = {}

    formula_code: int = CONST_N
    coefficients: np.ndarray = np.zeros(1)
    n_table: np.ndarray = _EMPTY_TABLE
    k_table: np.ndarray = _EMPTY_TABLE

    def __init_subclass__(cls, **kwargs):
        super().__init_subclass__(**kwargs)
        BaseMaterial._registry[cls.__name__] = cls

    @property
    def padded_coefficients(self):
        return pad_coefficients(np.asarray(self.coefficients, dtype=float))

    def n(self, wavelength):
        """Refractive index at wavelength(s) in micrometers."""
        if self.formula_code == TABULATED_N:
            return n_from_table(
                self.n_table[:, 0], self.n_table[:, 1], wavelength
            )
        return n_from_formula(
            self.formula_code, self.padded_coefficients, wavelength
        )

    def k(self, wavelength):
        """Extinction coefficient at wavelength(s) in micrometers."""
        import jax.numpy as jnp

        if self.k_table.shape[0] == 0:
            return jnp.zeros_like(jnp.asarray(wavelength, dtype=float))
        return k_from_table(self.k_table[:, 0], self.k_table[:, 1], wavelength)

    @property
    def has_absorption(self) -> bool:
        return self.k_table.shape[0] > 0 and bool(np.any(self.k_table[:, 1] > 0))

    def abbe(self):
        """Abbe number V_d = (n_d - 1)/(n_F - n_C) at the Fraunhofer
        d/F/C lines (reference: materials/base.py:236-252)."""
        nD = self.n(0.5875618)
        nF = self.n(0.4861327)
        nC = self.n(0.6562725)
        return (nD - 1.0) / (nF - nC)

    def to_dict(self) -> dict:
        return {"type": type(self).__name__}

    @classmethod
    def from_dict(cls, data: dict) -> "BaseMaterial":
        mat_type = data["type"]
        if mat_type not in cls._registry:
            raise ValueError(f"Unknown material type: {mat_type}")
        return cls._registry[mat_type]._from_dict(data)


class IdealMaterial(BaseMaterial):
    """Material with constant refractive index and extinction coefficient.

    Reference parity: optiland/materials/ideal.py:22.
    """

    def __init__(self, n: float, k: float = 0.0):
        self.index = float(n)
        self.absorb_coef = float(k)
        self.formula_code = CONST_N
        self.coefficients = np.array([float(n)])
        self.n_table = _EMPTY_TABLE
        if k != 0.0:
            # Constant k encoded as a flat two-point table.
            self.k_table = np.array([[0.1, float(k)], [20.0, float(k)]])
        else:
            self.k_table = _EMPTY_TABLE

    def to_dict(self):
        d = super().to_dict()
        d.update({"index": self.index, "absorb_coef": self.absorb_coef})
        return d

    @classmethod
    def _from_dict(cls, data):
        return cls(data["index"], data.get("absorb_coef", 0.0))

    def __eq__(self, other):
        return (
            isinstance(other, IdealMaterial)
            and self.index == other.index
            and self.absorb_coef == other.absorb_coef
        )

    def __hash__(self):
        return hash(("IdealMaterial", self.index, self.absorb_coef))


AIR = IdealMaterial(1.0)


class _CatalogBacked(BaseMaterial):
    """Common initialization from a catalog payload dict."""

    def _load_payload(self, payload: dict):
        self.formula_code = payload["formula_code"]
        self.coefficients = np.asarray(payload["coefficients"], dtype=float)
        self.n_table = np.asarray(payload["n_table"], dtype=float)
        self.k_table = np.asarray(payload["k_table"], dtype=float)
        self.therm_coeffs = np.asarray(payload["therm_coeffs"], dtype=float)
        self.t0 = payload["t0"]
        self.nd = payload.get("nd", float("nan"))
        self.vd = payload.get("vd", float("nan"))
        if self.formula_code < 0:
            raise ValueError(
                f"Material {payload.get('name')} has no refractive index data."
            )


class Material(_CatalogBacked):
    """Material resolved by name from the refractiveindex.info catalog.

    Reference parity: optiland/materials/material.py:22 (robust search with
    Levenshtein ranking over the catalog index).
    """

    def __init__(
        self,
        name: str,
        reference: str | None = None,
        robust_search: bool = True,
        min_wavelength: float | None = None,
        max_wavelength: float | None = None,
    ):
        self.name = name
        self.reference = reference
        payload = get_catalog().find(
            name,
            reference,
            min_wavelength=min_wavelength,
            max_wavelength=max_wavelength,
            robust=robust_search,
        )
        self.material_data = payload
        self._load_payload(payload)

    def to_dict(self):
        d = super().to_dict()
        d.update({"name": self.name, "reference": self.reference})
        return d

    @classmethod
    def _from_dict(cls, data):
        return cls(data["name"], data.get("reference"))

    def __eq__(self, other):
        return (
            isinstance(other, Material)
            and self.name == other.name
            and self.reference == other.reference
        )

    def __hash__(self):
        return hash(("Material", self.name, self.reference))


class MaterialFile(_CatalogBacked):
    """Material parsed directly from a refractiveindex.info YAML file.

    Reference parity: optiland/materials/material_file.py:22.
    """

    def __init__(self, filename: str):
        self.filename = filename
        from optiland_tpu.materials.yaml_io import parse_material_yaml

        m = parse_material_yaml(filename)
        payload = {
            "formula_code": m["formula_code"],
            "coefficients": m["coeffs"],
            "n_table": m["ntab"],
            "k_table": m["ktab"],
            "therm_coeffs": m["therm"],
            "t0": m["t0"],
            "nd": m["nd"],
            "vd": m["vd"],
            "name": filename,
        }
        self._load_payload(payload)

    def to_dict(self):
        d = super().to_dict()
        d.update({"filename": self.filename})
        return d

    @classmethod
    def _from_dict(cls, data):
        return cls(data["filename"])


class AbbeMaterial(BaseMaterial):
    """Material defined by refractive index at the d-line and Abbe number.

    Models (reference parity: optiland/materials/abbe.py:232):
        "polynomial": cubic polynomial in wavelength fitted over the Schott
            catalog (valid 0.38-0.75 um).
        "buchdahl": 3-term Buchdahl dispersion model about the d-line.
    """

    V1_COEFFS = (0.004160, 4.462559, 2.326660, 0.002330, -0.003697, -4.697604)
    V2_COEFFS = (0.066434, -7.636396, 12.597434, -0.037014, 5.551013)
    V3_COEFFS = (-0.032218, 2.230357, -103.318994, -0.009654, 1.934983)
    WAVE_REF = 0.5875618
    ALPHA = 2.5

    def __init__(self, n: float, abbe: float, model: str = "polynomial"):
        self.index = float(n)
        self.abbe = float(abbe)
        self.model_name = model
        if model == "polynomial":
            feats = np.array(
                [n, abbe, n**2, abbe**2, n**3, abbe**3], dtype=float
            )
            p = feats @ get_glass_model_coefficients()  # highest power first
            deg = p.shape[0] - 1
            # Encode polyval as formula 5 (Cauchy-style power series).
            coeffs = [p[-1]]
            for i in range(deg):
                coeffs += [p[deg - 1 - i], i + 1]
            self.formula_code = dispersion.FORMULA_5
            self.coefficients = np.array(coeffs)
        elif model == "buchdahl":
            v1, v2, v3 = self._buchdahl_coefficients(n, abbe)
            self.formula_code = BUCHDAHL
            self.coefficients = np.array(
                [n, v1, v2, v3, self.WAVE_REF, self.ALPHA]
            )
        else:
            raise ValueError(
                f"Unknown model: {model}. Valid options: 'polynomial', 'buchdahl'"
            )

    @classmethod
    def _buchdahl_coefficients(cls, nd, vd):
        inv_v, inv_v2 = 1.0 / vd, 1.0 / vd**2
        nd_sq, nd_div_v = nd**2, nd / vd
        c = cls.V1_COEFFS
        v1 = c[0] + c[1] * inv_v + c[2] * inv_v2 + c[3] * nd + c[4] * nd_sq + c[5] * nd_div_v
        c = cls.V2_COEFFS
        v2 = c[0] + c[1] * inv_v + c[2] * inv_v2 + c[3] * nd_sq + c[4] * nd_div_v
        c = cls.V3_COEFFS
        v3 = c[0] + c[1] * inv_v + c[2] * inv_v2 + c[3] * nd_sq + c[4] * nd_div_v
        return v1, v2, v3

    def to_dict(self):
        d = super().to_dict()
        d.update({"index": self.index, "abbe": self.abbe, "model": self.model_name})
        return d

    @classmethod
    def _from_dict(cls, data):
        return cls(data["index"], data["abbe"], data.get("model", "polynomial"))

    def __eq__(self, other):
        return (
            isinstance(other, AbbeMaterial)
            and self.index == other.index
            and self.abbe == other.abbe
            and self.model_name == other.model_name
        )

    def __hash__(self):
        return hash(("AbbeMaterial", self.index, self.abbe, self.model_name))


class AbbeMaterialE(BaseMaterial):
    """Material defined by e-line index and Abbe number (Buchdahl model).

    Reference parity: optiland/materials/abbe.py:314 (BuchdahlEModel fit).
    """

    WAVE_REF = 0.546074
    ALPHA = 2.5

    def __init__(self, n: float, abbe: float):
        self.index = float(n)
        self.abbe = float(abbe)
        ne, ve = n, abbe
        inv_v, inv_v2 = 1.0 / ve, 1.0 / ve**2
        n_sq, n_div_v = ne**2, ne / ve
        v1 = -0.01271580 + 5.86039368 * inv_v - 0.00840567 * n_sq - 6.04120358 * n_div_v
        v2 = -0.11714561 - 19.45035516 * inv_v - 0.18747797 * n_sq + 14.33541100 * n_div_v
        v3 = (
            18.43536735 * inv_v
            - 241.00526954 * inv_v2
            + 0.10881050 * n_sq
            - 4.93439893 * n_div_v
        )
        self.formula_code = BUCHDAHL
        self.coefficients = np.array([n, v1, v2, v3, self.WAVE_REF, self.ALPHA])

    def to_dict(self):
        d = super().to_dict()
        d.update({"index": self.index, "abbe": self.abbe})
        return d

    @classmethod
    def _from_dict(cls, data):
        return cls(data["index"], data["abbe"])


def resolve_material(spec) -> BaseMaterial:
    """Resolve the user-facing material spec used by ``surfaces.add``.

    Accepts: BaseMaterial instance, "air", "mirror" (handled by caller),
    a material name string, a (name, reference) tuple, or a numeric index.
    """
    if isinstance(spec, BaseMaterial):
        return spec
    if spec is None:
        return AIR
    if isinstance(spec, (int, float)):
        return IdealMaterial(float(spec))
    if isinstance(spec, tuple):
        return Material(spec[0], spec[1])
    if isinstance(spec, str):
        if spec.lower() == "air":
            return AIR
        return Material(spec)
    raise ValueError(f"Cannot resolve material spec: {spec!r}")


__all__ = [
    "AIR",
    "AbbeMaterial",
    "AbbeMaterialE",
    "BaseMaterial",
    "IdealMaterial",
    "Material",
    "MaterialFile",
    "dispersion",
    "get_catalog",
    "resolve_material",
]
