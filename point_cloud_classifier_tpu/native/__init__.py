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
from typing import Dict, List, Optional, Tuple

import numpy as np

_THIS_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_THIS_DIR, "edge_builder.cpp")
_LIB = os.path.join(_THIS_DIR, "libedge_builder.so")

_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _compile_and_load(
    src: str, lib_path: str, failed_flag: List[bool]
) -> Optional[ctypes.CDLL]:
    """Build-on-first-use: compile ``src`` if stale, dlopen, or fall back."""
    if failed_flag[0] or os.environ.get("PCC_NATIVE") == "0":
        return None
    if not os.path.exists(src):
        # source stripped (partial install / mid-branch-switch): a present
        # .so is still usable; a missing one falls back to Python — either
        # way never crash on the getmtime below (round-5 review finding)
        if os.path.exists(lib_path):
            try:
                return ctypes.CDLL(lib_path)
            except OSError:
                failed_flag[0] = True
                return None
        failed_flag[0] = True
        return None
    if not os.path.exists(lib_path) or os.path.getmtime(lib_path) < os.path.getmtime(
        src
    ):
        # compile to a per-process temp then atomically rename: concurrent
        # builders (forked dataset-creation workers, parallel test runs)
        # must never dlopen a half-written .so
        tmp_path = f"{lib_path}.tmp{os.getpid()}"
        try:
            subprocess.run(
                ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", src, "-o", tmp_path],
                check=True,
                capture_output=True,
                timeout=120,
            )
            os.replace(tmp_path, lib_path)
        except (subprocess.SubprocessError, FileNotFoundError, OSError):
            failed_flag[0] = True
            return None
        finally:
            if os.path.exists(tmp_path):
                try:
                    os.remove(tmp_path)
                except OSError:
                    pass
    try:
        return ctypes.CDLL(lib_path)
    except OSError:
        failed_flag[0] = True
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    failed = [_build_failed]
    lib = _compile_and_load(_SRC, _LIB, failed)
    if lib is None:
        globals()["_build_failed"] = failed[0]
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


# ---------------------------------------------------------------------------
# batch packer: the loaders' host-side assembly loops (batch_packer.cpp)
# ---------------------------------------------------------------------------

_PACKER_SRC = os.path.join(_THIS_DIR, "batch_packer.cpp")
_PACKER_LIB = os.path.join(_THIS_DIR, "libbatch_packer.so")
_packer_lib: Optional[ctypes.CDLL] = None
_packer_failed = [False]

_I64 = ctypes.c_int64
_VP = ctypes.c_void_p


def _load_packer() -> Optional[ctypes.CDLL]:
    global _packer_lib
    if _packer_lib is not None:
        return _packer_lib
    lib = _compile_and_load(_PACKER_SRC, _PACKER_LIB, _packer_failed)
    if lib is None:
        return None
    lib.pack_pointcloud.restype = _I64
    lib.pack_pointcloud.argtypes = [
        _VP, _I64, _I64,  # flat, feat_dim, itemsize
        _VP,  # offsets
        _VP, _I64, _I64,  # idx, k, b
        _VP, _I64,  # keep_cols, n_keep
        _VP, _I64,  # fac_cols, n_fac
        _I64,  # p_pad
        _VP, _VP,  # points, event_feats
        _VP, _I64,  # seg, seg_itemsize
        _VP,  # seg_counts
    ]
    lib.pack_pointcloud_dense.restype = _I64
    lib.pack_pointcloud_dense.argtypes = [
        _VP, _I64, _I64,  # flat, feat_dim, itemsize
        _VP,  # offsets
        _VP, _I64, _I64,  # idx, k, b
        _VP, _I64,  # keep_cols, n_keep
        _VP, _I64,  # fac_cols, n_fac
        _I64,  # m
        _VP, _VP,  # points, event_feats
        _VP,  # seg_counts
    ]
    lib.pack_graph_flat.restype = _I64
    lib.pack_graph_flat.argtypes = [
        _VP, _I64, _I64,  # feats, feat_dim, itemsize
        _VP,  # node_offsets
        _VP, _VP, _VP,  # src, dst, edge_offsets
        _VP, _I64,  # weights, use_weights
        _VP, _I64, _I64,  # idx, k, b
        _I64, _I64,  # n_pad, e_pad
        _VP,  # nodes
        _VP, _I64,  # node_seg, seg_itemsize
        _VP,  # seg_counts
        _VP, _VP, _I64,  # src_out, dst_out, idx_itemsize
        _VP, _VP, _I64,  # edge_w, edge_mask, w_itemsize
    ]
    lib.pack_graph_inrow.restype = _I64
    lib.pack_graph_inrow.argtypes = [
        _VP, _I64, _I64,  # feats, feat_dim, itemsize
        _VP,  # node_offsets
        _VP, _VP, _VP,  # src, dst, edge_offsets
        _VP, _I64,  # weights, use_weights
        _VP, _I64, _I64,  # idx, k, b
        _I64, _I64,  # m_pad, d_pad
        _VP, _VP,  # nodes, node_mask
        _VP, _I64,  # in_src, idx_itemsize
        _VP, _I64,  # in_w, w_itemsize
        _I64,  # fill_nodes
    ]
    lib.pack_graph_dense.restype = _I64
    lib.pack_graph_dense.argtypes = [
        _VP, _I64, _I64,  # feats, feat_dim, itemsize
        _VP,  # node_offsets
        _VP, _VP, _VP,  # src, dst, edge_offsets
        _VP, _I64,  # weights, use_weights
        _VP, _I64, _I64,  # idx, k, b
        _I64,  # m_pad
        _VP,  # nodes
        _VP, _I64,  # adj, adj_itemsize
        _VP,  # node_mask
    ]
    _packer_lib = lib
    return lib


def packer_available() -> bool:
    return _load_packer() is not None


def _ptr(a: Optional[np.ndarray]):
    return 0 if a is None else a.ctypes.data_as(_VP)


def pack_pointcloud_native(
    flat: np.ndarray,
    offsets: np.ndarray,
    idx: np.ndarray,
    b: int,
    keep_cols: np.ndarray,
    fac_cols: np.ndarray,
    p_pad: int,
    points: np.ndarray,
    event_feats: Optional[np.ndarray],
    seg: np.ndarray,
    seg_counts: np.ndarray,
) -> bool:
    """Fill a point-cloud batch in C++; False -> caller uses the Python loop.

    Same semantics as the loop in ``data.batching.PointCloudLoader.__iter__``
    (the Python oracle; reference collate at utils/data.py:651-663).  Output
    arrays must be pre-initialised to their padding values.
    """
    lib = _load_packer()
    if lib is None:
        return False
    rc = lib.pack_pointcloud(
        _ptr(flat), flat.shape[1], flat.itemsize,
        _ptr(offsets),
        _ptr(idx), len(idx), b,
        _ptr(keep_cols), len(keep_cols),
        _ptr(fac_cols), len(fac_cols),
        p_pad,
        _ptr(points), _ptr(event_feats),
        _ptr(seg), seg.itemsize,
        _ptr(seg_counts),
    )
    return rc >= 0


def pack_pointcloud_dense_native(
    flat: np.ndarray,
    offsets: np.ndarray,
    idx: np.ndarray,
    b: int,
    keep_cols: np.ndarray,
    fac_cols: np.ndarray,
    m: int,
    points: np.ndarray,
    event_feats: Optional[np.ndarray],
    seg_counts: np.ndarray,
) -> bool:
    """Fill a DENSE point-cloud batch (per-cloud padded rows [b, m, Fw]) in
    C++; False -> caller uses the vectorized numpy assembly.

    Same semantics as ``data.batching.PointCloudLoader._dense_batch`` (the
    Python oracle).  ``points`` is the [b, m, n_keep] buffer viewed as
    [b*m, n_keep]; outputs must be pre-initialised to their padding values.
    """
    lib = _load_packer()
    if lib is None:
        return False
    rc = lib.pack_pointcloud_dense(
        _ptr(flat), flat.shape[1], flat.itemsize,
        _ptr(offsets),
        _ptr(idx), len(idx), b,
        _ptr(keep_cols), len(keep_cols),
        _ptr(fac_cols), len(fac_cols),
        m,
        _ptr(points), _ptr(event_feats),
        _ptr(seg_counts),
    )
    return rc >= 0


def pack_graph_flat_native(
    feats: np.ndarray,
    node_offsets: np.ndarray,
    src: np.ndarray,
    dst: np.ndarray,
    edge_offsets: np.ndarray,
    weights: np.ndarray,
    use_weights: bool,
    idx: np.ndarray,
    b: int,
    n_pad: int,
    e_pad: int,
    nodes: np.ndarray,
    node_seg: np.ndarray,
    seg_counts: np.ndarray,
    src_out: np.ndarray,
    dst_out: np.ndarray,
    edge_w: np.ndarray,
    edge_mask: np.ndarray,
) -> bool:
    """Fill a flat-layout graph batch in C++ (oracle: GraphLoader.__iter__).

    ``weights`` must already be in the wire dtype (same itemsize as
    ``edge_w``) — the loader converts once at construction.
    """
    lib = _load_packer()
    if lib is None:
        return False
    if weights.itemsize != edge_w.itemsize:
        # memory-safety precondition for the C++ buffer reads — must
        # survive python -O (asserts are stripped there)
        raise ValueError(
            f"wire-dtype mismatch: weights itemsize {weights.itemsize} != "
            f"edge_w itemsize {edge_w.itemsize}"
        )
    rc = lib.pack_graph_flat(
        _ptr(feats), feats.shape[1], feats.itemsize,
        _ptr(node_offsets),
        _ptr(src), _ptr(dst), _ptr(edge_offsets),
        _ptr(weights), int(use_weights),
        _ptr(idx), len(idx), b,
        n_pad, e_pad,
        _ptr(nodes),
        _ptr(node_seg), node_seg.itemsize,
        _ptr(seg_counts),
        _ptr(src_out), _ptr(dst_out), src_out.itemsize,
        _ptr(edge_w), _ptr(edge_mask), edge_w.itemsize,
    )
    return rc >= 0


def pack_graph_dense_native(
    feats: np.ndarray,
    node_offsets: np.ndarray,
    src: np.ndarray,
    dst: np.ndarray,
    edge_offsets: np.ndarray,
    weights: np.ndarray,
    use_weights: bool,
    idx: np.ndarray,
    b: int,
    m_pad: int,
    nodes: np.ndarray,
    adj: np.ndarray,
    node_mask: np.ndarray,
) -> bool:
    """Fill a dense-layout graph batch in C++ (oracle: GraphLoader._dense_batch)."""
    lib = _load_packer()
    if lib is None:
        return False
    rc = lib.pack_graph_dense(
        _ptr(feats), feats.shape[1], feats.itemsize,
        _ptr(node_offsets),
        _ptr(src), _ptr(dst), _ptr(edge_offsets),
        _ptr(weights), int(use_weights),
        _ptr(idx), len(idx), b,
        m_pad,
        _ptr(nodes),
        _ptr(adj), adj.itemsize,
        _ptr(node_mask),
    )
    return rc >= 0


def pack_graph_inrow_native(
    feats: np.ndarray,
    node_offsets: np.ndarray,
    src: np.ndarray,
    dst: np.ndarray,
    edge_offsets: np.ndarray,
    weights: np.ndarray,
    use_weights: bool,
    idx: np.ndarray,
    b: int,
    m_pad: int,
    d_pad: int,
    nodes: np.ndarray,
    node_mask: np.ndarray,
    in_src: np.ndarray,
    in_w: np.ndarray,
    fill_nodes: bool = True,
) -> bool:
    """Fill an in-row dense-wire batch in C++ (oracle:
    GraphLoader._dense_wire_batch's numpy path).  ``weights`` must already
    be wire-dtype (same itemsize as ``in_w``).  ``fill_nodes=False`` skips
    the node/mask memcpy for a second (out-row mirror) pass over buffers
    the first pass already filled."""
    lib = _load_packer()
    if lib is None:
        return False
    if weights.itemsize != in_w.itemsize:
        # memory-safety precondition for the C++ buffer reads — must
        # survive python -O (asserts are stripped there)
        raise ValueError(
            f"wire-dtype mismatch: weights itemsize {weights.itemsize} != "
            f"in_w itemsize {in_w.itemsize}"
        )
    rc = lib.pack_graph_inrow(
        _ptr(feats), feats.shape[1], feats.itemsize,
        _ptr(node_offsets),
        _ptr(src), _ptr(dst), _ptr(edge_offsets),
        _ptr(weights), int(use_weights),
        _ptr(idx), len(idx), b,
        m_pad, d_pad,
        _ptr(nodes), _ptr(node_mask),
        _ptr(in_src), in_src.itemsize,
        _ptr(in_w), in_w.itemsize,
        int(fill_nodes),
    )
    return rc >= 0
