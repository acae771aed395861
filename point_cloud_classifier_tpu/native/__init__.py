"""Native (C++) runtime components with build-on-first-use + ctypes bindings.

The compute path is jax/XLA/Pallas; host-side hot loops that gate the offline
pipeline live here as C++.  First import compiles ``edge_builder.cpp`` with
the system toolchain into a cached shared library; any failure falls back to
the pure-Python implementations transparently (``native_available()`` tells
you which one you got).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, List, Optional

import numpy as np

_THIS_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_THIS_DIR, "edge_builder.cpp")
_LIB = os.path.join(_THIS_DIR, "libedge_builder.so")

_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            [
                "g++",
                "-O2",
                "-shared",
                "-fPIC",
                "-std=c++17",
                _SRC,
                "-o",
                _LIB,
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except (subprocess.SubprocessError, FileNotFoundError, OSError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed or os.environ.get("PCC_NATIVE") == "0":
        return None
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        if not _build():
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        _build_failed = True
        return None
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.build_event_edges.restype = ctypes.c_int64
    lib.build_event_edges.argtypes = [
        ctypes.c_int64,  # n_steps
        i64p,  # pids
        ctypes.POINTER(ctypes.c_double),  # times
        i64p,  # step_keys
        ctypes.c_int64,  # n_parent_rows
        i64p,  # child_ids
        i64p,  # parent_ids
        i64p,  # out_src
        i64p,  # out_dst
        ctypes.c_int64,  # cap
        i64p,  # out_parentless
        i64p,  # n_parentless
    ]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def _as_i64(a) -> np.ndarray:
    return np.ascontiguousarray(a, dtype=np.int64)


def build_event_edges_native(
    pids: np.ndarray,
    times: np.ndarray,
    step_keys: np.ndarray,
    parent_map: Dict[int, List[int]],
) -> Optional[np.ndarray]:
    """C++ edge builder; returns [2, 2E] int64 edges or None if unavailable.

    Same contract as ``data.graph.build_event_edges`` (the Python oracle).
    """
    lib = _load()
    if lib is None:
        return None

    pids64 = _as_i64(pids)
    times64 = np.ascontiguousarray(times, dtype=np.float64)
    keys64 = _as_i64(step_keys)

    # tie-order parity guard: the oracle (and the reference) order each
    # particle's temporal chain with np.argsort, whose introsort is only
    # insertion-sort-stable for short arrays.  The C++ stable_sort matches
    # that exactly when chains are short OR tie-free; if any particle has a
    # long chain with duplicated times, defer to the Python oracle.
    # (single lexsort + adjacent-dup scan: a per-particle loop here costs
    # more than the C++ saves on small events)
    uniq, counts = np.unique(pids64, return_counts=True)
    if counts.max() > 15:
        order = np.lexsort((times64, pids64))
        sp, stt = pids64[order], times64[order]
        dup = (sp[1:] == sp[:-1]) & (stt[1:] == stt[:-1])
        if dup.any():
            big = set(uniq[counts > 15].tolist())
            if any(int(p) in big for p in sp[:-1][dup]):
                return None
    child_rows: List[int] = []
    parent_rows: List[int] = []
    for child, parents in parent_map.items():
        for p in parents:
            child_rows.append(int(child))
            parent_rows.append(int(p))
    child64 = _as_i64(child_rows)
    parent64 = _as_i64(parent_rows)

    n = len(pids64)
    cap = max(64, 8 * n)
    i64p = ctypes.POINTER(ctypes.c_int64)
    while True:
        out_src = np.empty(cap, dtype=np.int64)
        out_dst = np.empty(cap, dtype=np.int64)
        parentless = np.empty(max(n, 1), dtype=np.int64)
        n_parentless = ctypes.c_int64(0)
        rc = lib.build_event_edges(
            n,
            pids64.ctypes.data_as(i64p),
            times64.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            keys64.ctypes.data_as(i64p),
            len(child64),
            child64.ctypes.data_as(i64p),
            parent64.ctypes.data_as(i64p),
            out_src.ctypes.data_as(i64p),
            out_dst.ctypes.data_as(i64p),
            cap,
            parentless.ctypes.data_as(i64p),
            ctypes.byref(n_parentless),
        )
        if rc == -1:
            cap *= 4
            continue
        if rc == -2:
            raise AssertionError(
                "Incident particle has parents, which should not happen"
            )
        if rc == -3:
            raise AssertionError("nodes with no parents found")
        for pid in parentless[: n_parentless.value]:
            print(f"No parents exist for particle {pid}")
        return np.stack([out_src[:rc], out_dst[:rc]])
