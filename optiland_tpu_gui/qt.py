"""Single import point for Qt symbols.

Every GUI module imports Qt through this shim so the dependency surface is
one line and a missing PySide6 produces one clear error message (the
reference imports PySide6 directly in every module; we centralize it so the
rest of the repo — and the test suite on Qt-less machines — never touches
Qt at import time).
"""

from __future__ import annotations

try:
    from PySide6 import QtCore, QtGui, QtWidgets  # noqa: F401
    from PySide6.QtCore import QObject, Qt, QTimer, Signal  # noqa: F401
    from PySide6.QtGui import (  # noqa: F401
        QAction,
        QKeySequence,
        QShortcut,
    )
    from PySide6.QtWidgets import (  # noqa: F401
        QApplication,
        QCheckBox,
        QComboBox,
        QDockWidget,
        QDoubleSpinBox,
        QFileDialog,
        QFormLayout,
        QGroupBox,
        QHBoxLayout,
        QHeaderView,
        QLabel,
        QLineEdit,
        QMainWindow,
        QMenu,
        QMessageBox,
        QPlainTextEdit,
        QPushButton,
        QSpinBox,
        QSplitter,
        QTableWidget,
        QTableWidgetItem,
        QTabWidget,
        QToolBar,
        QVBoxLayout,
        QWidget,
    )

    HAS_QT = True
except ImportError as _err:  # pragma: no cover - exercised on Qt-less hosts
    HAS_QT = False
    _IMPORT_ERROR = _err

    def __getattr__(name):
        raise ImportError(
            f"optiland_tpu_gui requires PySide6 (missing symbol {name!r}); "
            "install PySide6 to use the GUI. The headless equivalent of "
            "every GUI action is available in optiland_tpu.services."
        ) from _IMPORT_ERROR
