"""Test configuration: force CPU with 8 virtual devices and float64.

Parity suites run in float64 (matching the reference's NumPy default);
multi-chip sharding tests run on a virtual 8-device CPU mesh.
"""

import os

# Force CPU: parity suites run float64, which TPU only emulates (and the
# ambient environment may point JAX at a remote TPU via JAX_PLATFORMS).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("OPTILAND_TPU_X64", "1")

import jax  # noqa: E402

# A pytest plugin may have imported jax before this conftest ran, in which
# case the env var above came too late — set the config value directly so
# tests never touch a remote TPU backend.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent XLA compilation cache: the suite is compile-dominated (large
# unrolled trace graphs in f64), and repeat runs hit the cache for a ~3x
# wall-clock cut. Disable with OPTILAND_TPU_TEST_CACHE=0.
_CACHE = os.environ.get(
    "OPTILAND_TPU_TEST_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "optiland_tpu_xla"),
)
if _CACHE != "0":
    # One subdirectory per xdist worker: a single writer per directory
    # means no cross-process lock is needed, no half-written reads, and —
    # unlike the max_size+lock configuration — no lost writes (the LRU
    # eviction bookkeeping races under concurrency and silently drops
    # entries with "Error writing persistent compilation cache entry").
    worker = os.environ.get("PYTEST_XDIST_WORKER", "main")
    cache_dir = os.path.join(_CACHE, worker)
    os.makedirs(cache_dir, exist_ok=True)
    # Single-writer guarantee ACROSS pytest processes too: a concurrent
    # second `pytest` run reuses the same worker ids, and two writers in
    # one directory can corrupt entries (observed as one-off numeric
    # failures in otherwise-green tests). Hold a flock for the session;
    # if another live run owns it, fall back to a private cold directory.
    import fcntl
    import tempfile

    _lockf = open(os.path.join(cache_dir, ".writer_lock"), "w")
    try:
        fcntl.flock(_lockf, fcntl.LOCK_EX | fcntl.LOCK_NB)
    except OSError:
        cache_dir = tempfile.mkdtemp(prefix=f"optiland_xla_{worker}_")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


@pytest.fixture(scope="session")
def goldens():
    """Loader for reference-generated golden arrays."""

    cache = {}

    def load(name):
        if name not in cache:
            cache[name] = np.load(os.path.join(GOLDEN_DIR, f"{name}.npz"))
        return cache[name]

    return load


def assert_allclose(actual, desired, rtol=1e-5, atol=1e-7):
    """Comparison helper with the reference test suite's tolerances
    (reference: tests/utils.py:9-23)."""
    np.testing.assert_allclose(
        np.asarray(actual), np.asarray(desired), rtol=rtol, atol=atol
    )
