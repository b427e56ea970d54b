"""Plot theme registry (reference: optiland/visualization/themes.py:36-164)."""

from __future__ import annotations

import contextlib
import dataclasses


@dataclasses.dataclass
class Theme:
    """A named bundle of matplotlib rcParams."""

    name: str
    rcparams: dict

    _registry: dict = dataclasses.field(default=None, repr=False)


_THEMES: dict[str, Theme] = {}


def register_theme(theme: Theme):
    _THEMES[theme.name] = theme
    return theme


register_theme(Theme("default", {}))
register_theme(
    Theme(
        "dark",
        {
            "figure.facecolor": "#1e1e1e",
            "axes.facecolor": "#1e1e1e",
            "axes.edgecolor": "#cccccc",
            "axes.labelcolor": "#eeeeee",
            "text.color": "#eeeeee",
            "xtick.color": "#cccccc",
            "ytick.color": "#cccccc",
            "grid.color": "#444444",
        },
    )
)
register_theme(
    Theme(
        "paper",
        {
            "font.size": 9,
            "axes.linewidth": 0.8,
            "lines.linewidth": 1.0,
            "figure.dpi": 150,
        },
    )
)

_current = "default"


def set_theme(name: str):
    """Activate a registered theme globally."""
    global _current
    import matplotlib

    if name not in _THEMES:
        raise ValueError(f"Unknown theme {name!r}; available: {list(_THEMES)}")
    matplotlib.rcParams.update(_THEMES[name].rcparams)
    _current = name


@contextlib.contextmanager
def theme_context(name: str):
    """Temporarily activate a theme."""
    import matplotlib

    if name not in _THEMES:
        raise ValueError(f"Unknown theme {name!r}; available: {list(_THEMES)}")
    with matplotlib.rc_context(_THEMES[name].rcparams):
        yield
