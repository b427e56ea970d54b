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

# LLVM recursion while compiling the largest interpret-mode Pallas kernel
# bodies (a full surface-chain VJP inlined into one function) can exceed
# the default 8 MB stack and SIGSEGV the worker mid-compile — observed as
# roaming one-off "failures" where xdist reports the running test failed
# with "node down: Not properly terminated". The hard limit is unlimited
# here; lift the soft limit for every test process.
import resource

_soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
try:
    resource.setrlimit(resource.RLIMIT_STACK, (resource.RLIM_INFINITY, _hard))
except (ValueError, OSError):  # hard limit finite: raise to it instead
    resource.setrlimit(resource.RLIMIT_STACK, (_hard, _hard))

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
    # This module is imported TWICE per process (pytest loads it as
    # `conftest`, test modules import `tests.conftest` for the helpers),
    # so the cache setup must be idempotent: without the per-pid guard the
    # second import's flock below conflicts with the first's (flock is
    # per-open-file-description, even within one process) and silently
    # switched every worker to a cold throwaway cache.
    # Namespace the cache by host-CPU identity. XLA:CPU stores AOT results
    # compiled with the build host's exact machine features; loading an
    # entry produced on a different CPU generation logs "Machine type used
    # for XLA:CPU compilation doesn't match ... could lead to execution
    # errors such as SIGILL" and was the source of the rare mid-suite
    # worker segfaults (crash inside compilation_cache.get_executable_and
    # _time -> deserialize_executable). A per-CPU-model subdirectory makes
    # cross-machine cache hits impossible; the crash-retry hook below is
    # now a pure safety net.
    def _cpu_tag():
        import hashlib

        try:
            with open("/proc/cpuinfo") as f:
                lines = f.read().splitlines()
            model = next((l for l in lines if "model name" in l), "")
            flags = next((l for l in lines if l.startswith("flags")), "")
        except OSError:
            import platform

            model, flags = platform.machine(), platform.processor()
        return hashlib.sha1((model + flags).encode()).hexdigest()[:12]

    if os.environ.get("_OPTILAND_TPU_CACHE_PID") != str(os.getpid()):
        cache_dir = os.path.join(_CACHE, _cpu_tag(), worker)
        os.makedirs(cache_dir, exist_ok=True)
        # Single-writer guarantee ACROSS pytest processes: a concurrent
        # second `pytest` run reuses the same worker ids, and two writers
        # in one directory can corrupt entries (observed as one-off
        # numeric failures in otherwise-green tests). Hold a flock for
        # the session; if another live run owns it, fall back to a
        # private cold directory.
        import fcntl
        import tempfile

        _lockf = open(os.path.join(cache_dir, ".writer_lock"), "w")
        try:
            fcntl.flock(_lockf, fcntl.LOCK_EX | fcntl.LOCK_NB)
        except OSError:
            cache_dir = tempfile.mkdtemp(
                prefix=f"optiland_xla_{worker}_"
            )
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 0.5
        )
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        os.environ["_OPTILAND_TPU_CACHE_PID"] = str(os.getpid())

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


# ---------------------------------------------------------------------------
# Crash resilience — root-caused in round 5 as an UPSTREAM jaxlib bug; the
# retry hook is the bounded mitigation.
#
# Evidence (2026-08-21, PYTHONFAULTHANDLER=1 full-suite run): exactly one
# worker per full run dies with "Fatal Python error: Aborted" with the
# main thread inside jax/_src/compiler.py:362 backend_compile_and_load —
# i.e. a C++ abort() inside jaxlib 0.9.0's XLA:CPU compiler while
# compiling an ordinary jitted function (the victim test roams run to
# run and always passes in isolation).
#
# Hypotheses tested and falsified this round:
#   * stale persistent-cache entries built on a different CPU generation
#     (XLA logged "machine features don't match ... SIGILL" on AOT
#     loads) — REAL and fixed by the per-CPU-model cache namespace
#     above, but the abort still reproduced 3/3 quiet-tree runs after;
#   * XLA:CPU parallel codegen (--xla_cpu_parallel_codegen_split_count=1)
#     — still 1 abort per run, at +46% suite wall-clock; not adopted.
# jaxlib cannot be upgraded/pinned in this environment (no package
# installation), so the abort is managed, not fixed: reschedule the
# crashed test once on a fresh worker (it shows as `1 rerun` in the
# tally); a second crash of the SAME test is reported normally — real
# crashers cannot hide.
# ---------------------------------------------------------------------------

_crash_retried: set = set()


def pytest_handlecrashitem(crashitem, report, sched):
    if crashitem not in _crash_retried and hasattr(
        sched, "mark_test_pending"
    ):
        _crash_retried.add(crashitem)
        sched.mark_test_pending(crashitem)
        report.outcome = "rerun"
