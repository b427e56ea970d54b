"""Execute every tutorial script end-to-end (slow tier).

The examples/ directory is the user-facing learning path (docs/index.md);
each script must run standalone on CPU. Mirrors the reference's executed
documentation notebooks (reference: docs/examples/*.ipynb run in CI).
"""

import os
import subprocess
import sys

import pytest

EXAMPLES_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"
)
SCRIPTS = sorted(
    f for f in os.listdir(EXAMPLES_DIR) if f.endswith(".py")
)


@pytest.mark.slow
@pytest.mark.parametrize("script", SCRIPTS)
def test_example_runs(script, tmp_path):
    env = dict(os.environ)
    repo = os.path.dirname(EXAMPLES_DIR)
    # Drop the remote-TPU PJRT plugin from PYTHONPATH for these forced-CPU
    # subprocesses: the plugin probes its tunnel at import time even under
    # JAX_PLATFORMS=cpu, and a wedged tunnel then hangs every example
    # (observed round 5: scripts sat 14+ minutes at 2 s of CPU time).
    env["PYTHONPATH"] = os.pathsep.join(
        p
        for p in (env.get("PYTHONPATH", "").split(os.pathsep) + [repo])
        if p and "axon" not in p
    )
    env.update(
        JAX_PLATFORMS="cpu",
        MPLBACKEND="Agg",
        OPTILAND_TPU_EXAMPLE_FAST="1",  # scripts may shrink workloads
        MPLCONFIGDIR=str(tmp_path),
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(EXAMPLES_DIR, script)],
        capture_output=True, text=True, timeout=900, env=env,
        cwd=str(tmp_path),
    )
    assert proc.returncode == 0, (
        f"{script} failed\nstdout:\n{proc.stdout[-2000:]}\n"
        f"stderr:\n{proc.stderr[-2000:]}"
    )
