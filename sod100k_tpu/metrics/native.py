"""Python bindings for the native SalMetric library.

Mirrors the reference's Cython entry point
(SalMetric/python/salmetric.pyx: do_evaluation(num_thread, sal_lst, gt_lst)).
Two mechanisms, same surface:

- a compiled CPython extension module (native/salmetric/py_salmetric.cc ->
  build/_salmetric_native.so), the reference's compiled-binding counterpart
  — preferred when it builds/loads (releases the GIL during evaluation);
- a ctypes binding over the C ABI (sal_metric.cc: salmetric_evaluate) as
  the always-available fallback.

Both build on first use via make if the toolchain is available.
"""

from __future__ import annotations

import ctypes
import importlib.machinery
import importlib.util
import os
import subprocess
from typing import Optional, Sequence

_DIR = os.path.join(os.path.dirname(__file__), "..", "native", "salmetric")
_LIB = os.path.join(_DIR, "build", "libsalmetric.so")
_BIN = os.path.join(_DIR, "build", "salmetric")
_EXT = os.path.join(_DIR, "build", "_salmetric_native.so")

_lib: Optional[ctypes.CDLL] = None
_ext = None
_ext_failed = False


def load_extension():
    """Import the compiled CPython extension module; None when unavailable
    (build failure is remembered so the ctypes path is used silently)."""
    global _ext, _ext_failed
    if _ext is not None or _ext_failed:
        return _ext
    try:
        if not os.path.exists(_EXT):
            # target the extension explicitly: build() short-circuits when
            # the (possibly prebuilt) CLI + C-ABI library already exist
            subprocess.run(["make", "-C", _DIR, "build/_salmetric_native.so"],
                           check=True, capture_output=True)
        loader = importlib.machinery.ExtensionFileLoader(
            "_salmetric_native", _EXT)
        spec = importlib.util.spec_from_loader("_salmetric_native", loader)
        mod = importlib.util.module_from_spec(spec)
        loader.exec_module(mod)
        _ext = mod
    except Exception:
        _ext_failed = True
    return _ext


def build(force: bool = False) -> bool:
    """Build the native library/CLI via make (force=True rebuilds
    unconditionally with make -B). Returns True; raises RuntimeError with
    the captured stderr when the toolchain/build fails."""
    if not force and os.path.exists(_LIB) and os.path.exists(_BIN):
        return True
    cmd = ["make", "-C", _DIR] + (["-B"] if force else [])
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        out = getattr(e, "stderr", b"") or b""
        raise RuntimeError(f"native salmetric build failed: {out.decode()[-2000:]}")


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        build()
        _lib = ctypes.CDLL(_LIB)
        _lib.salmetric_evaluate.restype = ctypes.c_int
        _lib.salmetric_evaluate.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_double),
        ]
    return _lib


def cli_path() -> str:
    """Path to the built `salmetric` CLI (reference-compatible contract)."""
    build()
    return _BIN


def do_evaluation(num_thread: int, sal_lst: Sequence[str], gt_lst: Sequence[str],
                  print_stdout: bool = True) -> dict:
    """Evaluate sal/gt path lists natively; returns the metric dict.

    Signature mirrors the reference binding (salmetric.pyx:20-31); unlike it,
    the results are also returned structured rather than stdout-only.
    Dispatches to the compiled extension module when it loads (identical
    dict; GIL released during evaluation), else the ctypes C-ABI path.
    """
    assert len(sal_lst) == len(gt_lst) and sal_lst, "empty or mismatched lists"
    ext = load_extension()
    if ext is not None:
        return ext.do_evaluation(int(num_thread), list(sal_lst), list(gt_lst),
                                 print_stdout=bool(print_stdout))
    lib = _load()
    n = len(sal_lst)
    sal_arr = (ctypes.c_char_p * n)(*[s.encode() for s in sal_lst])
    gt_arr = (ctypes.c_char_p * n)(*[s.encode() for s in gt_lst])
    out = (ctypes.c_double * (7 + 512))()
    rc = lib.salmetric_evaluate(sal_arr, gt_arr, n, int(num_thread),
                                int(print_stdout), out)
    if rc < 0:
        raise RuntimeError("salmetric_evaluate failed")
    return {
        "images": rc,
        "mae": out[0],
        "max_f": out[1],
        "mean_f": out[2],
        "precision_at_max": out[3],
        "recall_at_max": out[4],
        "mean_precision": out[5],
        "mean_recall": out[6],
        "precision": list(out[7:7 + 256]),
        "recall": list(out[7 + 256:7 + 512]),
    }
