"""GUI-side utilities: matplotlib plot theming synchronized with the Qt
theme, and a logging handler that surfaces warnings as toasts
(reference: optiland_gui/utils/plot_theme.py:49,
optiland_gui/utils/logging_handler.py:17-70,
optiland_gui/gui_plot_utils.py)."""

from __future__ import annotations

import logging

_DARK = {
    "figure.facecolor": "#1e1f24",
    "axes.facecolor": "#26272d",
    "axes.edgecolor": "#8a8f98",
    "axes.labelcolor": "#e8e8ec",
    "text.color": "#e8e8ec",
    "xtick.color": "#c5c9d0",
    "ytick.color": "#c5c9d0",
    "grid.color": "#3a3c44",
    "legend.facecolor": "#26272d",
}
_LIGHT = {
    "figure.facecolor": "white",
    "axes.facecolor": "white",
    "axes.edgecolor": "#444444",
    "axes.labelcolor": "black",
    "text.color": "black",
    "xtick.color": "#333333",
    "ytick.color": "#333333",
    "grid.color": "#dddddd",
    "legend.facecolor": "white",
}


def apply_plot_theme(is_dark: bool) -> None:
    """Point matplotlib rcParams at the active GUI theme so embedded plots
    match the window chrome (reference: plot_theme.py:49)."""
    import matplotlib

    matplotlib.rcParams.update(_DARK if is_dark else _LIGHT)
    # keep the shared visualization themes in sync
    try:
        from optiland_tpu.visualization.themes import set_theme

        set_theme("dark" if is_dark else "default")
    except Exception:  # theme registry optional
        pass


class GuiLoggingHandler(logging.Handler):
    """Route warning+ log records to the GUI as toast notifications
    (reference: logging_handler.py:26-62). The toast callable is injected
    so this module stays importable without Qt."""

    def __init__(self, show_toast, level=logging.WARNING) -> None:
        super().__init__(level=level)
        self._show_toast = show_toast

    def emit(self, record: logging.LogRecord) -> None:
        try:
            prefix = "⚠" if record.levelno < logging.ERROR else "✖"
            self._show_toast(f"{prefix} {record.getMessage()}")
        except Exception:  # never let UI errors break logging
            self.handleError(record)


def install_logging(show_toast, root_logger_name: str = "optiland_tpu"):
    """Attach a GuiLoggingHandler to the library's logger
    (reference: logging_handler.py:64-70)."""
    handler = GuiLoggingHandler(show_toast)
    logging.getLogger(root_logger_name).addHandler(handler)
    return handler
