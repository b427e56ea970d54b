"""GUI constants and QSS themes (reference: optiland_gui/config.py:1-26).

Two stylesheet themes mirroring the reference's dark/light QSS resources;
kept inline (the reference loads .qss files from a resources dir).
"""

from __future__ import annotations

APP_NAME = "Optiland TPU"
ORG_NAME = "optiland_tpu"
DEFAULT_WINDOW_SIZE = (1440, 900)
MAX_RECENT_FILES = 8

_DARK_QSS = """
QWidget { background-color: #1e1f22; color: #d4d4d8; }
QMainWindow::separator { background: #2b2d31; width: 3px; height: 3px; }
QTableWidget { gridline-color: #2b2d31; selection-background-color: #31435f; }
QHeaderView::section { background-color: #26272b; border: 0; padding: 4px; }
QPushButton { background-color: #2f3136; border: 1px solid #3a3c42;
              border-radius: 4px; padding: 5px 12px; }
QPushButton:hover { background-color: #3a3c42; }
QLineEdit, QComboBox, QDoubleSpinBox, QSpinBox, QPlainTextEdit {
    background-color: #26272b; border: 1px solid #3a3c42;
    border-radius: 3px; padding: 3px; }
QDockWidget::title { background: #26272b; padding: 5px; }
QTabBar::tab { background: #26272b; padding: 6px 14px; }
QTabBar::tab:selected { background: #31435f; }
QToolBar { background: #26272b; border: 0; spacing: 4px; }
QMenuBar { background-color: #1e1f22; }
QMenuBar::item:selected, QMenu::item:selected { background: #31435f; }
"""

_LIGHT_QSS = """
QWidget { background-color: #fafafa; color: #1f2328; }
QTableWidget { gridline-color: #e1e4e8; selection-background-color: #cfe3ff; }
QHeaderView::section { background-color: #f0f1f3; border: 0; padding: 4px; }
QPushButton { background-color: #f0f1f3; border: 1px solid #d0d3d8;
              border-radius: 4px; padding: 5px 12px; }
QPushButton:hover { background-color: #e4e6ea; }
QLineEdit, QComboBox, QDoubleSpinBox, QSpinBox, QPlainTextEdit {
    background-color: #ffffff; border: 1px solid #d0d3d8;
    border-radius: 3px; padding: 3px; }
QDockWidget::title { background: #f0f1f3; padding: 5px; }
QTabBar::tab { background: #f0f1f3; padding: 6px 14px; }
QTabBar::tab:selected { background: #cfe3ff; }
QToolBar { background: #f0f1f3; border: 0; spacing: 4px; }
"""

THEMES = {"dark": _DARK_QSS, "light": _LIGHT_QSS}
DEFAULT_THEME = "dark"

# matplotlib theme names from optiland_tpu.visualization.themes matching the
# QSS theme, so embedded plots follow the application style.
PLOT_THEMES = {"dark": "dark", "light": "default"}


def get_stylesheet(theme: str = DEFAULT_THEME) -> str:
    return THEMES.get(theme, _DARK_QSS)
