"""ctypes bindings for the native (C++) float64 factor engine.

Builds ``csrc/host_factor.cpp`` on first import (cached as
``libhostfactor.so`` next to the sources) and exposes thin NumPy
wrappers. Falls back cleanly — callers check ``available()`` and use
the SciPy path otherwise, so a missing compiler never breaks the
library.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

__all__ = ["available", "gram", "cholesky_lower", "tri_inverse_lower",
           "border_append"]

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "csrc",
    "host_factor.cpp")
_SO = os.path.join(os.path.dirname(_SRC), "libhostfactor.so")

_D = ctypes.POINTER(ctypes.c_double)


def _build() -> Optional[str]:
    if os.path.exists(_SO) and (os.path.getmtime(_SO)
                                >= os.path.getmtime(_SRC)):
        return _SO
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120)
        return _SO
    except Exception:
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    so = _build() if os.path.exists(_SRC) else None
    if so is None:
        return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None

    ci = ctypes.c_int
    cd = ctypes.c_double
    lib.gram_rbf.argtypes = [_D, ci, _D, ci, ci, _D, cd, _D]
    lib.gram_matern32.argtypes = [_D, ci, _D, ci, ci, _D, cd, _D]
    lib.gram_matern52.argtypes = [_D, ci, _D, ci, ci, _D, cd, _D]
    lib.gram_exponential.argtypes = [_D, ci, _D, ci, ci, _D, cd, _D]
    lib.gram_ratquad.argtypes = [_D, ci, _D, ci, ci, _D, cd, cd, _D]
    lib.gram_stdperiodic.argtypes = [_D, ci, _D, ci, ci, _D, _D, cd, _D]
    lib.gram_linear.argtypes = [_D, ci, _D, ci, ci, _D, _D]
    lib.gram_cosine.argtypes = [_D, ci, _D, ci, ci, _D, cd, _D]
    lib.gram_poly.argtypes = [_D, ci, _D, ci, ci, cd, cd, cd, cd, _D]
    lib.gram_mlp.argtypes = [_D, ci, _D, ci, ci, _D, cd, cd, _D]
    lib.cholesky_lower.argtypes = [_D, ci, ci]
    lib.tri_inverse_lower.argtypes = [_D, ci, ci, _D]
    lib.border_append.argtypes = [_D, _D, _D, ci, ci, _D, cd, cd, _D]
    for f in (lib.gram_rbf, lib.gram_matern32, lib.gram_matern52,
              lib.gram_exponential, lib.gram_ratquad,
              lib.gram_stdperiodic, lib.gram_linear, lib.gram_cosine,
              lib.gram_poly, lib.gram_mlp,
              lib.cholesky_lower, lib.tri_inverse_lower,
              lib.border_append):
        f.restype = ci
    _LIB = lib
    return _LIB


def available() -> bool:
    """Whether the native engine compiled and loaded on this host."""
    return _load() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(_D)


def gram(kind: str, X: np.ndarray, Z: np.ndarray, ls: np.ndarray,
         var: float, power: float = None, period=None,
         scale: float = None, bias: float = None) -> np.ndarray:
    """Float64 gram k(X, Z): 'rbf'|'matern32'|'matern52'|'exponential'
    |'cosine'|'ratquad' (pass ``power``)|'stdperiodic' (pass
    ``period``)|'linear' (per-dim weights ride ``ls``; ``var`` unused)
    |'poly' (pass ``scale``/``bias``; order rides ``power``)
    |'mlp' (weight variances ride ``ls``, bias_variance rides
    ``bias``)."""
    lib = _load()
    X = np.ascontiguousarray(X, dtype=np.float64)
    Z = np.ascontiguousarray(Z, dtype=np.float64)
    d = X.shape[1]
    ls = np.ascontiguousarray(np.broadcast_to(
        np.asarray(ls, dtype=np.float64).reshape(-1), (d,)))
    out = np.empty((X.shape[0], Z.shape[0]), dtype=np.float64)
    if kind == "linear":
        rc = lib.gram_linear(_ptr(X), X.shape[0], _ptr(Z), Z.shape[0],
                             d, _ptr(ls), _ptr(out))
    elif kind == "poly":
        rc = lib.gram_poly(_ptr(X), X.shape[0], _ptr(Z), Z.shape[0], d,
                           float(var), float(scale), float(bias),
                           float(power), _ptr(out))
    elif kind == "mlp":
        rc = lib.gram_mlp(_ptr(X), X.shape[0], _ptr(Z), Z.shape[0], d,
                          _ptr(ls), float(var), float(bias), _ptr(out))
    elif kind == "ratquad":
        rc = lib.gram_ratquad(_ptr(X), X.shape[0], _ptr(Z), Z.shape[0],
                              d, _ptr(ls), float(var), float(power),
                              _ptr(out))
    elif kind == "stdperiodic":
        T = np.ascontiguousarray(np.broadcast_to(
            np.asarray(period, dtype=np.float64).reshape(-1), (d,)))
        rc = lib.gram_stdperiodic(_ptr(X), X.shape[0], _ptr(Z),
                                  Z.shape[0], d, _ptr(T), _ptr(ls),
                                  float(var), _ptr(out))
    else:
        fn = {"rbf": lib.gram_rbf, "matern32": lib.gram_matern32,
              "matern52": lib.gram_matern52,
              "exponential": lib.gram_exponential,
              "cosine": lib.gram_cosine}[kind]
        rc = fn(_ptr(X), X.shape[0], _ptr(Z), Z.shape[0], d, _ptr(ls),
                float(var), _ptr(out))
    if rc != 0:
        raise RuntimeError(f"native gram failed (rc={rc})")
    return out


def cholesky_lower(A: np.ndarray, n: int) -> None:
    """In-place lower Cholesky of A[:n, :n] (A row-major, square)."""
    lib = _load()
    assert A.flags["C_CONTIGUOUS"] and A.dtype == np.float64
    rc = lib.cholesky_lower(_ptr(A), n, A.shape[1])
    if rc != 0:
        raise np.linalg.LinAlgError(
            f"matrix not positive definite at pivot {rc}")


def tri_inverse_lower(L: np.ndarray, n: int, out: np.ndarray) -> None:
    """out[:n, :n] = inv(L[:n, :n]) for lower-triangular L (in place)."""
    lib = _load()
    rc = lib.tri_inverse_lower(_ptr(L), n, L.shape[1], _ptr(out))
    if rc != 0:
        raise RuntimeError(f"native tri_inverse failed (rc={rc})")


def border_append(L: np.ndarray, Linv: np.ndarray, w: np.ndarray,
                  pos: int, kvec: np.ndarray, kxx_plus_noise: float,
                  y: float) -> float:
    """Bordered Cholesky append at row ``pos``; returns the new diag."""
    lib = _load()
    kvec = np.ascontiguousarray(kvec, dtype=np.float64)
    dd = ctypes.c_double(0.0)
    rc = lib.border_append(_ptr(L), _ptr(Linv), _ptr(w), pos, L.shape[1],
                           _ptr(kvec), float(kxx_plus_noise), float(y),
                           ctypes.byref(dd))
    if rc != 0:
        raise np.linalg.LinAlgError(
            f"native border_append failed (rc={rc})")
    return dd.value
