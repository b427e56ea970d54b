"""ctypes bindings for the native (C++/OpenMP) kernels.

The TPU compute path is JAX/Pallas; these native kernels serve the CPU
runtime the way the reference's numba kernels do (reference:
optiland/psf/huygens_fresnel_strategies.py NumbaSummation). Built from
native/huygens.cpp by native/build.sh; the loader attempts an on-demand
build if the shared library is missing and falls back to the jnp path
when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(__file__)
_LIB_PATH = os.path.join(_DIR, "libhuygens.so")
_lib = None
_load_failed = False


def _try_build():
    src = os.path.join(_DIR, "..", "..", "native", "huygens.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-ffast-math", "-fopenmp",
             "-shared", "-fPIC", "-o", _LIB_PATH, src, "-lmvec", "-lm"],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib():
    """The loaded shared library, or None when unavailable."""
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _try_build():
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _load_failed = True
        return None
    dptr = ctypes.POINTER(ctypes.c_double)
    i64 = ctypes.c_int64
    lib.huygens_sum.argtypes = [dptr] * 3 + [i64] + [dptr] * 6 + [i64] + [
        ctypes.c_double, ctypes.c_double, dptr, dptr
    ]
    lib.huygens_sum.restype = None
    lib.huygens_psf.argtypes = [dptr] * 3 + [i64] + [dptr] * 6 + [i64] + [
        ctypes.c_double, ctypes.c_double, dptr
    ]
    lib.huygens_psf.restype = None
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def _as_c(a):
    arr = np.ascontiguousarray(np.asarray(a, np.float64))
    return arr, arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def huygens_field_native(image_x, image_y, image_z, pupil_x, pupil_y,
                         pupil_z, pupil_amp, pupil_opd_mm, wavelength_mm,
                         Rp):
    """Coherent Huygens field at flat image points (complex128 (P,))."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native huygens kernel unavailable")
    ix, pix = _as_c(image_x)
    iy, piy = _as_c(image_y)
    iz, piz = _as_c(image_z)
    px_, ppx = _as_c(pupil_x)
    py_, ppy = _as_c(pupil_y)
    pz_, ppz = _as_c(pupil_z)
    amp = np.asarray(pupil_amp)
    ar, par = _as_c(np.real(amp))
    ai, pai = _as_c(np.imag(amp) if np.iscomplexobj(amp) else
                    np.zeros_like(ar))
    od, pod = _as_c(pupil_opd_mm)
    n_img = ix.size
    n_pup = px_.size
    out_re = np.empty(n_img)
    out_im = np.empty(n_img)
    lib.huygens_sum(
        pix, piy, piz, ctypes.c_int64(n_img),
        ppx, ppy, ppz, par, pai, pod, ctypes.c_int64(n_pup),
        ctypes.c_double(float(wavelength_mm)), ctypes.c_double(float(Rp)),
        out_re.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out_im.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out_re + 1j * out_im


def huygens_psf_native(image_x, image_y, image_z, pupil_x, pupil_y, pupil_z,
                       pupil_amp, pupil_opd_mm, wavelength_mm, Rp):
    """|field|^2 at flat image points (float64 (P,))."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native huygens kernel unavailable")
    ix, pix = _as_c(image_x)
    iy, piy = _as_c(image_y)
    iz, piz = _as_c(image_z)
    px_, ppx = _as_c(pupil_x)
    py_, ppy = _as_c(pupil_y)
    pz_, ppz = _as_c(pupil_z)
    amp = np.asarray(pupil_amp)
    ar, par = _as_c(np.real(amp))
    ai, pai = _as_c(np.imag(amp) if np.iscomplexobj(amp) else
                    np.zeros_like(ar))
    od, pod = _as_c(pupil_opd_mm)
    n_img = ix.size
    n_pup = px_.size
    out = np.empty(n_img)
    lib.huygens_psf(
        pix, piy, piz, ctypes.c_int64(n_img),
        ppx, ppy, ppz, par, pai, pod, ctypes.c_int64(n_pup),
        ctypes.c_double(float(wavelength_mm)), ctypes.c_double(float(Rp)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out
