"""GUI entry point (reference: optiland_gui/run_gui.py; console script
``optiland`` in the reference's pyproject.toml:37-38).
"""

from __future__ import annotations

import sys


def main(argv=None):
    from optiland_tpu_gui.main_window import MainWindow
    from optiland_tpu_gui.qt import QApplication

    argv = list(sys.argv if argv is None else argv)
    frameless = "--frameless" in argv
    if frameless:
        argv.remove("--frameless")
    app = QApplication.instance() or QApplication(argv)

    optic = None
    if len(argv) > 1:
        path = argv[1]
        from optiland_tpu import fileio

        if path.endswith(".zmx"):
            optic = fileio.load_zemax_file(path)
        elif path.endswith(".seq"):
            optic = fileio.load_codev_file(path)
        elif path.endswith(".json"):
            optic = fileio.load_optiland_file(path)

    window = MainWindow(optic, frameless=frameless)
    window.show()
    return app.exec()


if __name__ == "__main__":
    raise SystemExit(main())
