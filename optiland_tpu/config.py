"""Global numeric configuration for optiland_tpu.

The reference framework (optiland) defaults to float64 NumPy; parity test
suites therefore run in float64 (JAX x64 mode, typically on CPU). On TPU
hardware, float64 is software-emulated and slow, so performance-mode runs use
float32 (or bfloat16 inside Pallas kernels where tolerable).

x64 is enabled at import time unless the environment variable
``OPTILAND_TPU_X64`` is set to ``"0"``. Working dtype for array construction
is controlled with :func:`set_precision`.

Replaces the reference's backend precision knobs
(reference: optiland/backend/__init__.py:120-141, torch_backend.py:64-103)
with a single JAX-native dtype configuration.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_X64 = os.environ.get("OPTILAND_TPU_X64", "1") != "0"
if _X64:
    jax.config.update("jax_enable_x64", True)

# Optional persistent XLA compile cache: deep unrolled traces compile for
# tens of seconds in f64 on CPU; pointing OPTILAND_TPU_COMPILE_CACHE at a
# directory makes repeat runs (scripts, notebooks, CI) start warm. Use one
# directory per process when running many processes concurrently — the
# cache's cross-process bookkeeping can drop writes under contention.
_CACHE_DIR = os.environ.get("OPTILAND_TPU_COMPILE_CACHE")
if _CACHE_DIR:
    # Per-CPU-model subdirectory: XLA:CPU AOT entries embed the build
    # host's machine features and can SIGILL/SEGV when loaded on a
    # different CPU generation (see tests/conftest.py for the incident
    # writeup) — never share entries across machines.
    import hashlib as _hashlib

    try:
        with open("/proc/cpuinfo") as _f:
            _lines = _f.read().splitlines()
        _cpu = next((l for l in _lines if "model name" in l), "") + next(
            (l for l in _lines if l.startswith("flags")), ""
        )
    except OSError:
        import platform as _platform

        _cpu = _platform.machine() + _platform.processor()
    _CACHE_DIR = os.path.join(
        _CACHE_DIR, _hashlib.sha1(_cpu.encode()).hexdigest()[:12]
    )
    os.makedirs(_CACHE_DIR, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

_PRECISIONS = {
    "float32": jnp.float32,
    "float64": jnp.float64,
}

_working_dtype = jnp.float64 if _X64 else jnp.float32


def set_precision(precision: str) -> None:
    """Set the working floating-point precision ("float32" or "float64")."""
    global _working_dtype
    if precision not in _PRECISIONS:
        raise ValueError(
            f"Unknown precision {precision!r}; expected one of {list(_PRECISIONS)}"
        )
    if precision == "float64" and not jax.config.read("jax_enable_x64"):
        jax.config.update("jax_enable_x64", True)
    _working_dtype = _PRECISIONS[precision]


def get_precision() -> str:
    """Return the current working precision as a string."""
    return "float64" if _working_dtype == jnp.float64 else "float32"


def dtype() -> jnp.dtype:
    """Return the current working dtype."""
    return _working_dtype
