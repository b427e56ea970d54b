#!/usr/bin/env bash
# CI-style Qt widget test runner (reference CI analog:
# .github/workflows/ci.yml xvfb + QT_QPA_PLATFORM=offscreen).
#
# This environment cannot `pip install PySide6` (no package installs), so
# the 6 Qt widget tests in tests/test_gui.py skip here; the headless
# equivalents of every panel behavior run unconditionally in
# tests/test_view_models.py and tests/test_gui_support.py. On a machine
# with PySide6 available, this script runs the FULL GUI tier the way CI
# would:
#
#   pip install 'PySide6>=6.6'   # or: pip install .[gui]
#   bash tools/run_qt_tests.sh
set -euo pipefail

export QT_QPA_PLATFORM="${QT_QPA_PLATFORM:-offscreen}"
export MPLBACKEND=Agg

python - <<'EOF'
import importlib.util, sys
if importlib.util.find_spec("PySide6") is None:
    sys.exit(
        "PySide6 is not importable. Install it first "
        "(pip install 'PySide6>=6.6' or pip install '.[gui]')."
    )
EOF

exec python -m pytest tests/test_gui.py tests/test_view_models.py \
    tests/test_gui_support.py -v "$@"
