"""Headless panel view-models: the full editing/analysis logic of the GUI
panels, testable without Qt.

The Qt widgets in ``optiland_tpu_gui`` are thin bindings over these
models, mirroring the reference's panel feature set:
  * ``LensEditorModel`` — the spreadsheet lens-data editor with per-type
    dynamic columns, cell descriptors (kind/choices/editable), TSV
    clipboard copy/paste, row insert/remove/move, and undo integration
    (reference: optiland_gui/lens_editor.py — per-type delegates and
    editing UX).
  * ``AnalysisPanelModel`` — tabbed analysis sessions with schema-driven
    settings, re-run, PNG figure export, CSV data export
    (reference: optiland_gui/analysis_panel.py:1-1664).
  * ``SystemPropertiesModel`` — paged system properties (aperture,
    fields, wavelengths, polarization, environment, notes) with staged
    edits and apply/revert
    (reference: optiland_gui/system_properties_panel.py).
"""

from __future__ import annotations

import dataclasses
import io

import numpy as np

from optiland_tpu.services.gui_support import (
    SURFACE_TYPE_FIELDS,
    AnalysisSession,
)

# ---------------------------------------------------------------------------
# Lens editor
# ---------------------------------------------------------------------------

_BASE_COLUMNS = ("Type", "Comment", "Radius", "Thickness", "Material",
                 "Conic", "Semi-Diameter")

# extra spreadsheet columns per surface type (reference: the per-type
# column delegates of optiland_gui/lens_editor.py; here each maps onto
# SurfaceService.get_type_params/set_type_params)
_TYPE_COLUMNS = {
    "even_asphere": tuple(f"A{2 * (i + 2)}" for i in range(6)),
    "odd_asphere": tuple(f"B{i + 3}" for i in range(6)),
    "polynomial": tuple(f"C{i}" for i in range(6)),
    "toroidal": ("R rot",),
    "biconic": ("Ry", "ky"),
    "grating": ("Period", "Order", "Groove angle"),
}

_MATERIAL_CHOICES = (
    "air", "mirror", "N-BK7", "N-SF11", "F2", "N-SK16", "SF5", "N-LAK22",
    "N-SF5", "N-SK2", "SK16", "N-F2",
)


@dataclasses.dataclass
class CellSpec:
    """Descriptor of one editable cell (drives the Qt delegate choice)."""

    kind: str  # "choice" | "float" | "text" | "readonly"
    choices: tuple = ()
    editable: bool = True


class LensEditorModel:
    """Spreadsheet model over SurfaceService with per-type dynamic columns.

    Row labels, cell access, and structural edits match the reference LDE;
    every mutation snapshots for undo through the connector.
    """

    def __init__(self, connector):
        self.c = connector
        self.svc = connector.surfaces

    # ---------------- shape ----------------

    def row_count(self) -> int:
        return self.svc.get_surface_count()

    def extra_columns(self) -> list[str]:
        """Union of the extra columns needed by the types present (the
        reference shows type-specific columns; a union keeps the grid
        rectangular)."""
        cols: list[str] = []
        optic = self.c.get_optic()
        for s in optic.surfaces.surfaces:
            for name in _TYPE_COLUMNS.get(s.surface_type or "standard", ()):
                if name not in cols:
                    cols.append(name)
        return cols

    def column_headers(self) -> list[str]:
        return list(_BASE_COLUMNS) + self.extra_columns()

    def row_label(self, row: int) -> str:
        n = self.row_count()
        optic = self.c.get_optic()
        if row == 0:
            return "OBJ"
        if row == n - 1:
            return "IMG"
        if getattr(optic.surfaces.surfaces[row], "is_stop", False):
            return f"STO {row}"
        return str(row)

    def stop_row(self):
        for i, s in enumerate(self.c.get_optic().surfaces.surfaces):
            if getattr(s, "is_stop", False):
                return i
        return None

    # ---------------- cells ----------------

    def cell_spec(self, row: int, col: int) -> CellSpec:
        headers = self.column_headers()
        name = headers[col]
        if name == "Type":
            return CellSpec(
                "choice",
                tuple(self.svc.get_available_surface_types()),
                editable=0 < row < self.row_count() - 1,
            )
        if name == "Comment":
            return CellSpec("text")
        if name == "Material":
            return CellSpec("choice", _MATERIAL_CHOICES,
                            editable=row < self.row_count() - 1)
        if name in _BASE_COLUMNS:
            return CellSpec("float")
        # extra column: editable only when the row's type declares it
        t = self.c.get_optic().surfaces.surfaces[row].surface_type
        owned = name in _TYPE_COLUMNS.get(t or "standard", ())
        return CellSpec("float" if owned else "readonly", editable=owned)

    def get_cell(self, row: int, col: int):
        headers = self.column_headers()
        name = headers[col]
        if name in _BASE_COLUMNS:
            return self.svc.get_surface_data(row, _BASE_COLUMNS.index(name))
        t = self.c.get_optic().surfaces.surfaces[row].surface_type
        tcols = _TYPE_COLUMNS.get(t or "standard", ())
        if name not in tcols:
            return None
        return self._get_extra(row, t, tcols.index(name))

    def set_cell(self, row: int, col: int, value) -> bool:
        """Returns True when the model changed (False: not editable)."""
        spec = self.cell_spec(row, col)
        if not spec.editable:
            return False
        headers = self.column_headers()
        name = headers[col]
        if name in _BASE_COLUMNS:
            self.svc.set_surface_data(
                row, _BASE_COLUMNS.index(name), value
            )
            return True
        t = self.c.get_optic().surfaces.surfaces[row].surface_type
        tcols = _TYPE_COLUMNS.get(t or "standard", ())
        self._set_extra(row, t, tcols.index(name), float(value))
        return True

    def _get_extra(self, row, t, k):
        p = self.svc.get_type_params(row)
        if t in ("even_asphere", "odd_asphere", "polynomial"):
            coeffs = p.get("coefficients", [])
            return coeffs[k] if k < len(coeffs) else 0.0
        if t == "toroidal":
            return p.get("radius_y", 0.0)
        if t == "biconic":
            return (p.get("radius_y", 0.0), p.get("conic_y", 0.0))[k]
        if t == "grating":
            return (
                p.get("grating_period", 0.0),
                p.get("grating_order", 0),
                p.get("groove_orientation_angle", 0.0),
            )[k]
        return None

    def _set_extra(self, row, t, k, value):
        if t in ("even_asphere", "odd_asphere", "polynomial"):
            p = self.svc.get_type_params(row)
            coeffs = list(p.get("coefficients", []))
            while len(coeffs) <= k:
                coeffs.append(0.0)
            coeffs[k] = value
            self.svc.set_type_params(row, coefficients=coeffs)
        elif t == "toroidal":
            self.svc.set_type_params(row, radius_y=value)
        elif t == "biconic":
            key = ("radius_y", "conic_y")[k]
            self.svc.set_type_params(row, **{key: value})
        elif t == "grating":
            key = ("grating_period", "grating_order",
                   "groove_orientation_angle")[k]
            self.svc.set_type_params(row, **{key: value})

    # ---------------- structure ----------------

    def insert_row(self, at: int):
        self.svc.add_surface(index=at)

    def remove_row(self, row: int):
        self.svc.remove_surface(row)

    def move_row(self, row: int, delta: int):
        """Swap a surface with its neighbor (reference LDE drag-reorder)."""
        n = self.row_count()
        other = row + delta
        if not (0 < row < n - 1 and 0 < other < n - 1):
            raise ValueError("can only move interior surfaces")
        self.c.snapshot()
        optic = self.c.get_optic()
        ss = optic.surfaces.surfaces
        ss[row], ss[other] = ss[other], ss[row]
        optic._invalidate()
        self.c.notify("surface_changed", row=row, col=-1)

    def set_stop(self, row: int):
        self.svc.set_stop_surface(row)

    # ---------------- per-surface properties form ----------------
    # (reference: lens_editor.py:38-117 SurfacePropertiesWidget — the
    # expandable per-type parameter form under a surface row)

    def properties_form(self, row: int) -> list:
        """Ordered (key, kind, value) field specs for the surface's
        extended per-type parameters. kinds: 'float', 'int', 'choice:*'
        (colon-separated options), 'floats' (comma-separated list)."""
        params = self.svc.get_type_params(row)
        kinds = {
            "coefficients": "floats",
            "zernike_type": "choice:fringe:standard:noll",
            "grating_order": "int",
        }
        out = []
        for key, value in params.items():
            kind = kinds.get(key, "float")
            if kind == "floats":
                value = ", ".join(f"{float(v):g}" for v in value)
            out.append((key, kind, value))
        return out

    def apply_properties(self, row: int, values: dict) -> str | None:
        """Parse + write form text back; returns an error message instead
        of raising (the widget shows it inline)."""
        parsed = {}
        try:
            for key, kind, _ in self.properties_form(row):
                if key not in values:
                    continue
                text = values[key]
                if kind == "floats":
                    parsed[key] = [
                        float(tok) for tok in str(text).replace(",", " ")
                        .split()
                    ]
                elif kind == "int":
                    parsed[key] = int(text)
                elif kind.startswith("choice:"):
                    opts = kind.split(":")[1:]
                    if str(text) not in opts:
                        return f"{key}: must be one of {opts}"
                    parsed[key] = str(text)
                else:
                    parsed[key] = float(text)
        except (TypeError, ValueError) as err:
            return f"invalid value: {err}"
        if not parsed:
            return None
        try:
            self.svc.set_type_params(row, **parsed)
        except (KeyError, ValueError) as err:
            return str(err)
        return None

    def variable_kwargs(self, row: int, col: int):
        """(variable_type, kwargs) to add the cell as an optimization
        variable, or None when the cell isn't a variable candidate
        (reference: lens_editor.py:332-348 request-add-variable)."""
        headers = self.column_headers()
        if not (0 < row < self.row_count() - 1):
            return None
        if col >= len(headers):
            return None
        name = headers[col]
        mapping = {
            "Radius": ("radius", {}),
            "Thickness": ("thickness", {}),
            "Conic": ("conic", {}),
            "Material": ("material", {}),
        }
        if name not in mapping:
            return None
        var_type, extra = mapping[name]
        return var_type, {"surface_number": row, **extra}

    # ---------------- clipboard (TSV) ----------------

    def copy_rows(self, rows: list[int]) -> str:
        """Spreadsheet-interchange TSV block of the selected rows."""
        headers = self.column_headers()
        lines = ["\t".join(headers)]
        for r in sorted(rows):
            vals = []
            for cidx in range(len(headers)):
                v = self.get_cell(r, cidx)
                vals.append("" if v is None else str(v))
            lines.append("\t".join(vals))
        return "\n".join(lines)

    def paste_block(self, row0: int, col0: int, tsv: str) -> int:
        """Paste a TSV block anchored at (row0, col0); skips non-editable
        cells. Returns the number of cells written. One undo snapshot for
        the whole paste."""
        self.c.snapshot()
        written = 0
        headers = self.column_headers()
        lines = [ln for ln in tsv.splitlines() if ln.strip()]
        if lines and lines[0].split("\t")[:1] == ["Type"]:
            lines = lines[1:]  # tolerate a copied header row
        for dr, line in enumerate(lines):
            r = row0 + dr
            if r >= self.row_count():
                break
            for dc, text in enumerate(line.split("\t")):
                cidx = col0 + dc
                if cidx >= len(headers) or not text:
                    continue
                spec = self.cell_spec(r, cidx)
                if not spec.editable:
                    continue
                try:
                    val = float(text) if spec.kind == "float" else text
                except ValueError:
                    continue
                if self.set_cell(r, cidx, val):
                    written += 1
        return written


# ---------------------------------------------------------------------------
# Analysis panel
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class AnalysisTab:
    seq: int
    name: str
    record: object  # AnalysisRecord
    title: str


class AnalysisPanelModel:
    """Tabbed analysis panel over AnalysisSession: run analyses with
    schema-driven settings into tabs; re-run, close, export PNG/CSV
    (reference: optiland_gui/analysis_panel.py figure tabs + toolbars)."""

    def __init__(self, connector, limit: int = 25):
        self.session = AnalysisSession(connector.analysis, limit=limit)
        self.tabs: list[AnalysisTab] = []
        self.active: int | None = None

    # ---------------- registry/settings ----------------

    def available(self) -> list[str]:
        return sorted(self.session.registry())

    def settings_schema(self, name: str):
        return self.session.schema(name)

    # ---------------- tabs ----------------

    def run(self, name: str, **kwargs) -> AnalysisTab:
        self.remember_settings(name, kwargs)
        rec = self.session.run(name, **kwargs)
        args = ", ".join(f"{k}={v}" for k, v in sorted(kwargs.items()))
        tab = AnalysisTab(
            seq=rec.seq, name=name, record=rec,
            title=f"{name} [{rec.seq}]" + (f" ({args})" if args else ""),
        )
        self.tabs.append(tab)
        self.active = len(self.tabs) - 1
        return tab

    def rerun(self, tab_index: int) -> AnalysisTab:
        """Re-run a tab's analysis with its stored settings against the
        CURRENT system, replacing the tab in place."""
        old = self.tabs[tab_index]
        rec = self.session.rerun(old.seq)
        tab = AnalysisTab(
            seq=rec.seq, name=old.name, record=rec, title=old.title
        )
        self.tabs[tab_index] = tab
        self.active = tab_index
        return tab

    def close_tab(self, tab_index: int):
        self.tabs.pop(tab_index)
        if not self.tabs:
            self.active = None
        elif self.active is not None and self.active >= len(self.tabs):
            self.active = len(self.tabs) - 1

    def clone_tab(self, tab_index: int) -> AnalysisTab:
        """Duplicate a page: run the same analysis with the same stored
        settings as a NEW tab against the current system (reference:
        analysis_panel.py:930-951 clone-page context action)."""
        src = self.tabs[tab_index]
        return self.run(src.name, **dict(src.record.kwargs))

    # ---------------- last-used settings ----------------
    # (reference: analysis_panel.py:1050-1103 populate/apply/load)

    def remember_settings(self, name: str, kwargs: dict):
        self._last_settings = getattr(self, "_last_settings", {})
        self._last_settings[name] = dict(kwargs)

    def recall_settings(self, name: str) -> dict:
        return dict(getattr(self, "_last_settings", {}).get(name, {}))

    def save_settings(self, path: str) -> str:
        """Persist the per-analysis last-used settings to JSON."""
        import json

        with open(path, "w") as f:
            json.dump(
                getattr(self, "_last_settings", {}), f, indent=1,
                default=str,
            )
        return path

    def load_settings(self, path: str) -> dict:
        import json

        with open(path) as f:
            data = json.load(f)
        self._last_settings = {
            str(k): dict(v) for k, v in data.items() if isinstance(v, dict)
        }
        return self._last_settings

    # ---------------- plot cursor readout ----------------

    @staticmethod
    def cursor_readout(x, y) -> str:
        """Status-bar text under the plot cursor (reference:
        analysis_panel.py:1005-1016 on_mouse_move_on_plot)."""
        if x is None or y is None:
            return ""
        return f"x={float(x):+.5g}   y={float(y):+.5g}"

    # ---------------- export ----------------

    def export_png(self, tab_index: int, path: str) -> str:
        """Render the tab's analysis figure to a PNG file (Agg backend,
        headless-safe) — the reference panel's toolbar save action."""
        import matplotlib

        matplotlib.use("Agg", force=False)
        import matplotlib.pyplot as plt

        rec = self.tabs[tab_index].record
        out = rec.result.view()
        fig = out[0] if isinstance(out, tuple) else out
        if not hasattr(fig, "savefig"):
            fig = getattr(fig, "figure", None) or plt.gcf()
        fig.savefig(path, dpi=150)
        plt.close(fig)
        return path

    def export_csv(self, tab_index: int, path: str) -> str:
        """Dump the analysis's numeric data arrays as CSV columns."""
        rec = self.tabs[tab_index].record
        data = getattr(rec.result, "data", None)
        cols: dict[str, np.ndarray] = {}

        def walk(prefix, node):
            if isinstance(node, dict):
                for k, v in node.items():
                    walk(f"{prefix}{k}." if prefix else f"{k}.", v)
            else:
                arr = np.ravel(np.asarray(node, float))
                cols[prefix.rstrip(".")] = arr

        if isinstance(data, dict):
            walk("", data)
        elif data is not None:
            cols["data"] = np.ravel(np.asarray(data, float))
        else:
            raise ValueError(
                f"analysis {self.tabs[tab_index].name!r} has no exportable "
                "data"
            )
        n = max(len(v) for v in cols.values())
        buf = io.StringIO()
        buf.write(",".join(cols.keys()) + "\n")
        for i in range(n):
            buf.write(",".join(
                f"{v[i]!r}" if i < len(v) else "" for v in cols.values()
            ) + "\n")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        return path


# ---------------------------------------------------------------------------
# System properties
# ---------------------------------------------------------------------------


class SystemPropertiesModel:
    """Paged system properties with staged edits: ``load()`` the current
    state, mutate the staged dict, ``apply()`` writes it back through one
    undo snapshot (reference: optiland_gui/system_properties_panel.py)."""

    PAGES = ("Aperture", "Fields", "Wavelengths", "Polarization",
             "Environment", "Notes")

    def __init__(self, connector):
        self.c = connector
        self.staged: dict = {}
        self.load()

    # ---------------- read ----------------

    def load(self):
        o = self.c.get_optic()
        ap = getattr(o, "aperture", None)
        self.staged = {
            "aperture": {
                "type": getattr(ap, "ap_type", "EPD") if ap else "EPD",
                "value": float(getattr(ap, "value", 0.0)) if ap else 0.0,
            },
            "fields": {
                "type": o.fields.field_type,
                "telecentric": bool(o.fields.telecentric),
                "points": [
                    {"x": f.x, "y": f.y, "vx": f.vx, "vy": f.vy,
                     "weight": f.weight}
                    for f in o.fields.fields
                ],
            },
            "wavelengths": [
                {"value": w.value, "primary": w.is_primary,
                 "weight": w.weight}
                for w in o.wavelengths.wavelengths
            ],
            "polarization": self._pol_name(
                getattr(o, "polarization", "ignore")
            ),
            "environment": self._env_state(o),
            "notes": getattr(o, "comment", "") or "",
        }
        return self.staged

    @staticmethod
    def _pol_name(pol):
        """Display string for a polarization setting: 'ignore', a named
        state ('H', 'RCP', ...), or the state's repr for custom ones."""
        if isinstance(pol, str):
            return pol
        from optiland_tpu.polarization import create_polarization

        for name in ("H", "V", "L+45", "L-45", "RCP", "LCP"):
            ref = create_polarization(name)
            if all(
                getattr(pol, a, None) == getattr(ref, a, None)
                for a in ("Ex", "Ey", "phase_x", "phase_y")
            ):
                return name
        return repr(pol)

    @staticmethod
    def _env_state(o):
        env = getattr(o, "environment", None)
        if env is None:
            return {"temperature": 20.0, "pressure": 101325.0}
        return {
            "temperature": float(getattr(env, "temperature", 20.0)),
            "pressure": float(getattr(env, "pressure", 101325.0)),
        }

    # ---------------- staged edits ----------------

    def set_aperture(self, ap_type: str, value: float):
        self.staged["aperture"] = {"type": ap_type, "value": float(value)}

    def set_field_type(self, ftype: str):
        self.staged["fields"]["type"] = ftype

    def add_field(self, x=0.0, y=0.0, vx=0.0, vy=0.0, weight=1.0):
        self.staged["fields"]["points"].append(
            {"x": x, "y": y, "vx": vx, "vy": vy, "weight": weight}
        )

    def remove_field(self, idx: int):
        self.staged["fields"]["points"].pop(idx)

    def add_wavelength(self, value_um: float, primary=False, weight=1.0):
        self.staged["wavelengths"].append(
            {"value": float(value_um), "primary": primary, "weight": weight}
        )

    def remove_wavelength(self, idx: int):
        self.staged["wavelengths"].pop(idx)

    def set_primary_wavelength(self, idx: int):
        for i, w in enumerate(self.staged["wavelengths"]):
            w["primary"] = i == idx

    def set_polarization(self, state):
        self.staged["polarization"] = state

    def set_notes(self, text: str):
        self.staged["notes"] = text

    # ---------------- apply/revert ----------------

    def dirty(self) -> bool:
        current = SystemPropertiesModel(self.c).staged
        return current != self.staged

    def revert(self):
        self.load()

    def apply(self):
        """Write every staged page back in one undo step."""
        self.c.snapshot()
        o = self.c.get_optic()
        ap = self.staged["aperture"]
        o.set_aperture(ap["type"], ap["value"])
        o.fields.fields.clear()
        o.fields.set_type(self.staged["fields"]["type"])
        o.fields.set_telecentric(self.staged["fields"]["telecentric"])
        for p in self.staged["fields"]["points"]:
            o.fields.add(x=p["x"], y=p["y"], vx=p["vx"], vy=p["vy"],
                         weight=p["weight"])
        o.wavelengths.wavelengths.clear()
        if not any(w["primary"] for w in self.staged["wavelengths"]):
            if self.staged["wavelengths"]:
                self.staged["wavelengths"][0]["primary"] = True
        for w in self.staged["wavelengths"]:
            o.wavelengths.add(w["value"], is_primary=w["primary"],
                              weight=w["weight"])
        if self.staged["polarization"] != getattr(o, "polarization",
                                                  "ignore"):
            o.set_polarization(self.staged["polarization"])
        o.comment = self.staged["notes"]
        o._invalidate()
        self.c.notify("optic_loaded")


__all__ = [
    "AnalysisPanelModel",
    "AnalysisTab",
    "CellSpec",
    "LensEditorModel",
    "SystemPropertiesModel",
]


# ---------------------------------------------------------------------------
# Viewer panel
# ---------------------------------------------------------------------------


class ViewerPanelModel:
    """Headless viewer-panel logic: render settings, 2D surface hit-test,
    image export, and the interactive WebGL export
    (reference: optiland_gui/viewer_panel.py, 832 LoC — view switching,
    per-view settings, interactivity)."""

    DISTRIBUTIONS = ("hexapolar", "uniform", "random", "ring", "cross")

    def __init__(self, connector):
        self.c = connector
        self.settings = {
            "fields": "all",        # or list of (Hx, Hy)
            "wavelengths": "primary",
            "num_rays": 12,
            "distribution": "hexapolar",
        }
        self.picked: int | None = None

    # ---------------- rendering ----------------

    def draw_2d(self, ax):
        from optiland_tpu.visualization import draw_system

        s = self.settings
        draw_system(
            self.c.get_optic(), ax=ax, fields=s["fields"],
            wavelengths=s["wavelengths"], num_rays=s["num_rays"],
        )
        return ax

    def draw_3d(self, ax):
        from optiland_tpu.visualization import OpticViewer3D

        s = self.settings
        OpticViewer3D(self.c.get_optic()).view(
            ax=ax, fields=s["fields"], wavelengths=s["wavelengths"],
            num_rays=s["num_rays"],
        )
        return ax

    def export_png(self, path: str, view: str = "2d", dpi: int = 150):
        import matplotlib

        matplotlib.use("Agg", force=False)
        from matplotlib.figure import Figure

        fig = Figure(figsize=(8, 5), tight_layout=True)
        if view == "3d":
            self.draw_3d(fig.add_subplot(111, projection="3d"))
        else:
            self.draw_2d(fig.add_subplot(111))
        fig.savefig(path, dpi=dpi)
        return path

    def export_interactive_html(self, path: str | None = None) -> str:
        """Standalone WebGL page with orbit/zoom/pan + pickable surfaces
        (visualization.webgl.OpticViewer3DHTML)."""
        from optiland_tpu.visualization import OpticViewer3DHTML

        s = self.settings
        return OpticViewer3DHTML(self.c.get_optic()).view(
            path=path, num_rays=s["num_rays"],
        )

    # ---------------- 2D hit-test ----------------

    def pick_2d(self, z_click: float, y_click: float,
                tolerance: float = 2.0):
        """Surface index nearest to a (z, y) click on the 2D layout, or
        None outside ``tolerance`` (mm). Distances measure to each
        surface's cross-section curve z(y) = pos + sag(0, y)."""
        import jax.numpy as jnp

        from optiland_tpu.core import geometry as geom_mod
        from optiland_tpu.core.system import positions

        optic = self.c.get_optic()
        system = optic.system
        stack, cfg = system.stack, system.cfg
        pos = np.asarray(positions(stack))
        best = None
        best_d = tolerance
        for idx in range(1, cfg.num_surfaces):
            try:
                sag = float(np.asarray(geom_mod.sag_static(
                    cfg.geom_codes[idx], stack.radius[idx],
                    stack.conic[idx], stack.coeffs[idx],
                    jnp.asarray(0.0), jnp.asarray(y_click),
                    p1=stack.geo_p1[idx], p2=stack.geo_p2[idx],
                    aux=cfg.geom_aux[idx] if cfg.geom_aux else None,
                )))
            except Exception:
                sag = 0.0
            if not np.isfinite(sag):
                sag = 0.0
            z_surf = pos[idx] + float(stack.dz[idx]) + sag
            d = abs(z_surf - z_click)
            if d < best_d:
                best_d = d
                best = idx
        self.picked = best
        return best

    def picked_info(self) -> dict | None:
        """Prescription summary of the picked surface (the reference's
        click-to-inspect affordance)."""
        if self.picked is None:
            return None
        optic = self.c.get_optic()
        s = optic.surfaces.surfaces[self.picked]
        mat = getattr(s, "material", None)
        return {
            "index": self.picked,
            "type": s.surface_type or "standard",
            "radius": float(np.asarray(s.radius, float)),
            "thickness": float(np.asarray(s.thickness, float)),
            "conic": float(getattr(s, "conic", 0.0) or 0.0),
            "material": mat if isinstance(mat, str) else (
                getattr(mat, "name", None) if mat is not None else "air"
            ),
            "is_stop": bool(getattr(s, "is_stop", False)),
        }

    # ---------------- settings ----------------

    def set_num_rays(self, n: int):
        self.settings["num_rays"] = max(1, int(n))

    def set_distribution(self, name: str):
        if name not in self.DISTRIBUTIONS:
            raise ValueError(f"unknown distribution {name!r}")
        self.settings["distribution"] = name

    def set_wavelengths(self, which):
        self.settings["wavelengths"] = which

    def set_fields(self, which):
        self.settings["fields"] = which


# ---------------------------------------------------------------------------
# Optimization panel
# ---------------------------------------------------------------------------


class OptimizationPanelModel:
    """Headless optimization-panel logic: typed operand/variable rows with
    schema validation, merit-definition save/load, problem building, an
    async run with live merit history and cancel, and the pandas report
    tables as text (reference: optiland_gui/optimization_panel.py,
    1,257 LoC + services/optimization_service.py)."""

    RAY_INPUT_KEYS = ("Hx", "Hy", "Px", "Py", "wavelength", "num_rays",
                      "distribution", "surface_number")

    def __init__(self, connector):
        self.c = connector
        self.svc = connector.optimization
        self.operands: list[dict] = []
        self.variables: list[dict] = []
        self.merit_history: list[float] = []
        self.worker = None

    # ---------------- schemas ----------------

    @staticmethod
    def operand_types() -> list[str]:
        from optiland_tpu.optimization.operands import OPERAND_REGISTRY

        return sorted(OPERAND_REGISTRY)

    @staticmethod
    def variable_types() -> list[str]:
        from optiland_tpu.optimization.variables import _BEHAVIORS

        return sorted(_BEHAVIORS)

    @staticmethod
    def operand_input_keys(name: str) -> tuple:
        """The operand function's own keyword names (what the per-type
        editor should offer), introspected from the registry."""
        import inspect

        from optiland_tpu.optimization.operands import OPERAND_REGISTRY

        fn = OPERAND_REGISTRY[name]
        params = list(inspect.signature(fn).parameters)[1:]  # drop system
        return tuple(params)

    # ---------------- rows ----------------

    def add_operand(self, op_type: str, target=None, min_val=None,
                    max_val=None, weight: float = 1.0, **input_data):
        if op_type not in self.operand_types():
            raise ValueError(f"unknown operand type {op_type!r}")
        allowed = set(self.operand_input_keys(op_type))
        if {"Px", "Py"} & allowed:
            # the Operand wrapper compiles distribution specs into pupil
            # arrays (optimization/operands.py:362-366)
            allowed |= {"num_rays", "distribution"}
        bad = set(input_data) - allowed
        if bad:
            raise ValueError(
                f"operand {op_type!r} does not accept {sorted(bad)}; "
                f"valid inputs: {sorted(allowed)}"
            )
        if target is None and min_val is None and max_val is None:
            raise ValueError("operand needs a target or min/max bounds")
        self.operands.append({
            "type": op_type, "target": target, "min_val": min_val,
            "max_val": max_val, "weight": weight, **input_data,
        })
        return len(self.operands) - 1

    def add_variable(self, var_type: str, **kwargs):
        if var_type not in self.variable_types():
            raise ValueError(f"unknown variable type {var_type!r}")
        self.variables.append({"type": var_type, **kwargs})
        return len(self.variables) - 1

    def remove_operand(self, idx: int):
        self.operands.pop(idx)

    def remove_variable(self, idx: int):
        self.variables.pop(idx)

    # ---------------- merit definition persistence ----------------

    def to_dict(self) -> dict:
        return {"operands": list(self.operands),
                "variables": list(self.variables)}

    def from_dict(self, data: dict):
        self.operands = [dict(o) for o in data.get("operands", [])]
        self.variables = [dict(v) for v in data.get("variables", [])]

    def save(self, path: str):
        import json

        with open(path, "w") as fh:
            json.dump(self.to_dict(), fh, indent=1)
        return path

    def load(self, path: str):
        import json

        with open(path) as fh:
            self.from_dict(json.load(fh))

    # ---------------- build / evaluate / run ----------------

    def build(self):
        ops = []
        for o in self.operands:
            spec = {k: v for k, v in o.items() if v is not None}
            ops.append(spec)
        return self.svc.build_problem(ops, self.variables)

    def current_merit(self) -> float:
        p = self.svc.problem or self.build()
        return float(p.sum_squared())

    def run_async(self, optimizer: str = "generic", on_progress=None,
                  **kwargs):
        """Start the optimizer on a worker thread; per-iteration merits
        stream into ``merit_history`` (and ``on_progress``)."""
        from optiland_tpu.services.gui_support import OptimizationWorker

        self.build()
        self.merit_history = []

        def progress(p):
            self.merit_history.append(p.merit)
            if on_progress is not None:
                on_progress(p)

        self.worker = OptimizationWorker(self.svc, on_progress=progress)
        self.worker.start(optimizer=optimizer, **kwargs)
        return self.worker

    def cancel(self):
        if self.worker is not None:
            self.worker.cancel()

    # ---------------- reporting ----------------

    def _info_text(self, which: str) -> str:
        import io
        from contextlib import redirect_stdout

        p = self.svc.problem or self.build()
        buf = io.StringIO()
        with redirect_stdout(buf):
            getattr(p, which)(show=True)
        return buf.getvalue()

    def operand_info_text(self) -> str:
        return self._info_text("operand_info")

    def variable_info_text(self) -> str:
        return self._info_text("variable_info")

    def merit_info_text(self) -> str:
        return self._info_text("merit_info")


class SagViewerModel:
    """Headless model for the surface-sag viewer tab (reference:
    optiland_gui/viewer_panel.py:57-242 SagViewer): surface picker,
    cross-section curves, live cursor readout, CSV export. The Qt widget
    only binds these arrays to a canvas."""

    def __init__(self, connector):
        self.connector = connector
        self.surface_index = 1
        self.y_cross = 0.0
        self.x_cross = 0.0
        self.num_points = 101

    # ---------------- population ----------------

    def surface_labels(self) -> list:
        o = self.connector.get_optic()
        n = len(o.surfaces.surfaces)
        return [f"S{i} ({o.surfaces.surfaces[i].surface_type or 'standard'})"
                for i in range(1, n - 1)]

    def surface_range(self) -> tuple:
        """(lo, hi) valid surface indices (object/image excluded)."""
        n = len(self.connector.get_optic().surfaces.surfaces)
        return 1, max(1, n - 2)

    def set_surface(self, idx: int):
        lo, hi = self.surface_range()
        self.surface_index = int(min(max(idx, lo), hi))

    # ---------------- data ----------------

    def max_extent(self, buffer_factor: float = 1.1) -> float:
        import numpy as np

        system = self.connector.get_optic().system
        ap = float(np.asarray(system.stack.ap_max)[self.surface_index])
        if not np.isfinite(ap) or ap <= 0:
            ap = 10.0
        return ap * buffer_factor

    def _sag(self, xs, ys):
        import jax.numpy as jnp
        import numpy as np

        from optiland_tpu.core import geometry as geom

        system = self.connector.get_optic().system
        stack, cfg = system.stack, system.cfg
        s = self.surface_index
        aux = cfg.geom_aux[s] if cfg.geom_aux is not None else None
        z = geom.sag_static(
            cfg.geom_codes[s], stack.radius[s], stack.conic[s],
            stack.coeffs[s], jnp.asarray(xs), jnp.asarray(ys),
            p1=stack.geo_p1[s], p2=stack.geo_p2[s], aux=aux,
        )
        return np.asarray(z)

    def profiles(self):
        """(r, sag_x_cut, sag_y_cut): cross-sections through the current
        (x_cross, y_cross) lines."""
        import numpy as np

        ext = self.max_extent()
        r = np.linspace(-ext, ext, self.num_points)
        zx = self._sag(r, np.full_like(r, self.y_cross))
        zy = self._sag(np.full_like(r, self.x_cross), r)
        return r, zx, zy

    def sag_map(self, n: int = 41):
        """(X, Y, Z) grid for the 2-D contour view."""
        import numpy as np

        ext = self.max_extent()
        lin = np.linspace(-ext, ext, n)
        X, Y = np.meshgrid(lin, lin)
        Z = self._sag(X.ravel(), Y.ravel()).reshape(X.shape)
        return X, Y, Z

    def cursor_readout(self, x: float, y: float) -> str:
        """Status-bar text under the mouse (reference SagViewer
        on_mouse_move_on_plot)."""
        z = float(self._sag([x], [y])[0])
        return f"x={x:+.3f}  y={y:+.3f}  sag={z:+.6f} mm"

    def export_csv(self, path: str) -> str:
        import numpy as np

        r, zx, zy = self.profiles()
        np.savetxt(
            path, np.column_stack([r, zx, zy]), delimiter=",",
            header="r_mm,sag_along_x_mm,sag_along_y_mm", comments="",
        )
        return path


class ViewNavModel:
    """2-D viewer navigation state: home bounds, wheel zoom about the
    cursor, drag pan, reset — the testable core of the reference's
    MatplotlibViewer mouse handlers (viewer_panel.py:460-567). The Qt
    event handlers translate events into these calls and apply the
    returned (xlim, ylim) to the axes."""

    def __init__(self):
        self.home = None       # ((x0, x1), (y0, y1))
        self.xlim = None
        self.ylim = None
        self._drag_anchor = None

    def set_home(self, xlim, ylim):
        self.home = (tuple(xlim), tuple(ylim))
        if self.xlim is None:
            self.xlim, self.ylim = self.home

    @property
    def is_zoomed(self) -> bool:
        return self.home is not None and (
            tuple(self.xlim) != self.home[0]
            or tuple(self.ylim) != self.home[1]
        )

    def zoom_at(self, factor: float, x: float, y: float):
        """factor < 1 zooms in; the anchor point stays fixed on screen."""
        (x0, x1), (y0, y1) = self.xlim, self.ylim
        self.xlim = (x - (x - x0) * factor, x + (x1 - x) * factor)
        self.ylim = (y - (y - y0) * factor, y + (y1 - y) * factor)
        return self.xlim, self.ylim

    def begin_drag(self, x: float, y: float):
        self._drag_anchor = (x, y, self.xlim, self.ylim)

    def drag_to(self, x: float, y: float):
        if self._drag_anchor is None:
            return self.xlim, self.ylim
        ax, ay, (x0, x1), (y0, y1) = self._drag_anchor
        dx, dy = ax - x, ay - y
        self.xlim = (x0 + dx, x1 + dx)
        self.ylim = (y0 + dy, y1 + dy)
        return self.xlim, self.ylim

    def end_drag(self):
        self._drag_anchor = None

    def reset(self):
        if self.home is not None:
            self.xlim, self.ylim = self.home
        return self.xlim, self.ylim


class Command:
    __slots__ = ("label", "callback", "shortcut", "category")

    def __init__(self, label, callback, shortcut="", category=""):
        self.label = label
        self.callback = callback
        self.shortcut = shortcut
        self.category = category


class CommandPaletteModel:
    """Registry + fuzzy filter behind the command palette (reference:
    optiland_gui widgets/command_palette). Subsequence match with
    word-start bonuses; execute() runs the callback and reports errors
    as a string instead of raising into the Qt event loop."""

    def __init__(self):
        self.commands: list = []

    def register(self, label, callback, shortcut="", category=""):
        self.commands.append(Command(label, callback, shortcut, category))

    @staticmethod
    def _score(query: str, label: str):
        q = query.lower()
        s = label.lower()
        if not q:
            return 0.0
        pos = -1
        score = 0.0
        for ch in q:
            nxt = s.find(ch, pos + 1)
            if nxt < 0:
                return None
            score += 2.0 if (nxt == 0 or s[nxt - 1] in " /:_-") else 1.0
            if nxt == pos + 1:
                score += 0.5
            pos = nxt
        return score / (1 + len(s) * 0.01)

    def filter(self, query: str) -> list:
        scored = []
        for c in self.commands:
            sc = self._score(query, f"{c.category} {c.label}".strip())
            if sc is not None:
                scored.append((sc, c))
        scored.sort(key=lambda t: (-t[0], t[1].label))
        return [c for _, c in scored]

    def execute(self, command) -> str | None:
        try:
            command.callback()
            return None
        except Exception as err:  # surfaced as a toast, not a crash
            return f"{type(err).__name__}: {err}"


class TerminalModel:
    """Embedded Python console state (reference:
    optiland_gui/widgets/python_terminal.py): persistent namespace with
    the live connector/optic, stdout/stderr capture, and shell-style
    history recall."""

    def __init__(self, connector):
        import numpy as np

        self.connector = connector
        self.namespace = {
            "connector": connector,
            "np": np,
            "get_optic": connector.get_optic,
        }
        self.history: list[str] = []
        self._hist_pos = 0

    def run(self, code: str) -> str:
        """Execute one input; returns captured output (repr of the value
        for expressions, print output, or the traceback tail)."""
        import io
        import traceback
        from contextlib import redirect_stderr, redirect_stdout

        self.history.append(code)
        self._hist_pos = len(self.history)
        self.namespace["optic"] = self.connector.get_optic()
        buf = io.StringIO()
        try:
            with redirect_stdout(buf), redirect_stderr(buf):
                try:
                    result = eval(  # noqa: S307 - user REPL by design
                        compile(code, "<terminal>", "eval"), self.namespace
                    )
                    if result is not None:
                        print(repr(result))
                except SyntaxError:
                    exec(  # noqa: S102 - user REPL by design
                        compile(code, "<terminal>", "exec"), self.namespace
                    )
        except Exception:
            tb = traceback.format_exc().splitlines()
            buf.write("\n".join(tb[-3:]))
        return buf.getvalue()

    def recall(self, direction: int) -> str:
        """History recall: direction -1 = up, +1 = down."""
        if not self.history:
            return ""
        self._hist_pos = min(
            max(self._hist_pos + direction, 0), len(self.history)
        )
        if self._hist_pos == len(self.history):
            return ""
        return self.history[self._hist_pos]


class ToastModel:
    """Transient notification queue (reference: optiland_gui toasts):
    the window drains it on a timer; levels map to styling."""

    LEVELS = ("info", "success", "warning", "error")

    def __init__(self, limit: int = 5):
        self.queue: list[tuple[str, str]] = []
        self.limit = limit

    def push(self, message: str, level: str = "info"):
        if level not in self.LEVELS:
            level = "info"
        self.queue.append((message, level))
        del self.queue[: -self.limit]

    def drain(self) -> list[tuple[str, str]]:
        out, self.queue = self.queue, []
        return out
