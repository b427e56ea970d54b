"""Matplotlib integration helpers for the GUI — theme styling, analysis
parameter introspection, and canvas interaction math.

Qt-free on purpose (reference: optiland_gui/gui_plot_utils.py:22-150
mixes these into the Qt layer): everything here runs headless, so the
test suite exercises the exact code the widgets call.
"""

from __future__ import annotations

import inspect


def apply_plot_theme(theme: str = "light") -> dict:
    """String-named wrapper over utils.apply_plot_theme (reference:
    gui_plot_utils.py:22-44 apply_gui_matplotlib_styles keeps a parallel
    entry point). Returns the applied rcParams mapping so widgets (and
    tests) can verify the active style."""
    import matplotlib as mpl

    from optiland_tpu_gui import utils

    dark = theme == "dark"
    utils.apply_plot_theme(dark)
    # report the EFFECTIVE style: utils also syncs the shared
    # visualization theme registry, which may refine individual keys
    keys = utils._DARK if dark else utils._LIGHT
    return {k: mpl.rcParams[k] for k in keys}


_SKIP_PARAMS = {"self", "optic", "wavelength", "wavelengths", "args", "kwargs"}


def analysis_parameters(analysis_class: type) -> dict:
    """Introspect an analysis class ``__init__`` into a settings schema:
    {name: {"default": ..., "annotation": ..., "kind": "int|float|str|bool"}}
    (reference: gui_plot_utils.py:55-108 get_analysis_parameters). The GUI
    builds its per-analysis settings forms from this — no per-class
    hand-written dialogs."""
    try:
        sig = inspect.signature(analysis_class.__init__)
    except (TypeError, ValueError):  # builtins / odd metaclasses
        return {}
    out: dict = {}
    for name, p in sig.parameters.items():
        if name in _SKIP_PARAMS or p.kind in (
            inspect.Parameter.VAR_POSITIONAL, inspect.Parameter.VAR_KEYWORD
        ):
            continue
        default = None if p.default is inspect.Parameter.empty else p.default
        if isinstance(default, bool):
            kind = "bool"
        elif isinstance(default, int):
            kind = "int"
        elif isinstance(default, float):
            kind = "float"
        elif isinstance(default, str):
            kind = "str"
        else:
            kind = "other"
        out[name] = {"default": default, "kind": kind}
    return out


def zoom_limits(xlim, ylim, xdata, ydata, direction: str,
                base_scale: float = 1.2):
    """New (xlim, ylim) for a scroll-zoom about the cursor (reference:
    gui_plot_utils.py:110-150 handle_matplotlib_scroll_zoom). Pure math so
    the interaction is unit-testable; the widget feeds it the mpl event
    and applies the result."""
    scale = 1.0 / base_scale if direction == "up" else base_scale
    x0, x1 = xlim
    y0, y1 = ylim
    # keep the data point under the cursor fixed
    new_w = (x1 - x0) * scale
    new_h = (y1 - y0) * scale
    relx = (x1 - xdata) / (x1 - x0) if x1 != x0 else 0.5
    rely = (y1 - ydata) / (y1 - y0) if y1 != y0 else 0.5
    return (
        (xdata - new_w * (1 - relx), xdata + new_w * relx),
        (ydata - new_h * (1 - rely), ydata + new_h * rely),
    )


def pan_limits(xlim, ylim, dx_frac: float, dy_frac: float):
    """Shift the view by a fraction of its width/height (drag-pan)."""
    w = xlim[1] - xlim[0]
    h = ylim[1] - ylim[0]
    return (
        (xlim[0] + dx_frac * w, xlim[1] + dx_frac * w),
        (ylim[0] + dy_frac * h, ylim[1] + dy_frac * h),
    )


def resize_hit_area(x: float, y: float, width: float, height: float,
                    margin: float = 6.0) -> str | None:
    """Which resize handle (edge/corner) a window-local point hits —
     'top-left', 'bottom', ... or None for the interior (reference:
    frameless_window.py:138-163 _get_resize_area). Pure geometry shared
    by FramelessWindow's mouse handlers and the tests."""
    on_left = x <= margin
    on_right = x >= width - margin
    on_top = y <= margin
    on_bottom = y >= height - margin
    if on_top and on_left:
        return "top-left"
    if on_top and on_right:
        return "top-right"
    if on_bottom and on_left:
        return "bottom-left"
    if on_bottom and on_right:
        return "bottom-right"
    if on_top:
        return "top"
    if on_bottom:
        return "bottom"
    if on_left:
        return "left"
    if on_right:
        return "right"
    return None


_CURSOR_FOR_AREA = {
    "top": "size-ver", "bottom": "size-ver",
    "left": "size-hor", "right": "size-hor",
    "top-left": "size-fdiag", "bottom-right": "size-fdiag",
    "top-right": "size-bdiag", "bottom-left": "size-bdiag",
}


def cursor_for_area(area: str | None) -> str:
    """Logical cursor name for a resize area (the widget maps these to
    Qt.CursorShape; reference: frameless_window.py:165-182)."""
    return _CURSOR_FOR_AREA.get(area, "arrow")


def resized_geometry(geom, area: str, dx: float, dy: float,
                     min_w: float = 400.0, min_h: float = 300.0):
    """Apply a drag delta to an (x, y, w, h) rect for the given resize
    area, honoring minimum sizes. Returns the new (x, y, w, h)."""
    x, y, w, h = geom
    if "left" in area:
        new_w = max(min_w, w - dx)
        x += w - new_w
        w = new_w
    if "right" in area:
        w = max(min_w, w + dx)
    if "top" in area:
        new_h = max(min_h, h - dy)
        y += h - new_h
        h = new_h
    if "bottom" in area:
        h = max(min_h, h + dy)
    return (x, y, w, h)
