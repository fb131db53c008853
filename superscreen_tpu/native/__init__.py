"""Native (C++) geometry kernel with lazy build and ctypes bindings.

Provides the equivalents of the reference's native geometry dependencies
(Triangle for Delaunay meshing, GEOS for polygon predicates) as a small
self-contained C++ core.  The shared library is compiled from
``geomcore.cpp`` with g++ on first use and cached next to the source; on
any failure (no compiler, unsupported platform) everything silently falls
back to the scipy/NumPy implementations.

Set ``SUPERSCREEN_TPU_NATIVE=0`` to disable the native kernel.
"""

import ctypes
import logging
import os
import subprocess
import sys
import tempfile
from typing import Optional

import numpy as np

logger = logging.getLogger("native")

__all__ = [
    "available",
    "delaunay",
    "points_in_polygon",
    "segments_intersect_batch",
]

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "geomcore.cpp")
_LIB_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    f"libgeomcore-{sys.implementation.cache_tag}.so",
)


def _build() -> Optional[str]:
    """Compiles the shared library (cached)."""
    if os.path.exists(_LIB_PATH) and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(
        _SRC
    ):
        return _LIB_PATH
    cmd = [
        "g++",
        "-O3",
        "-std=c++17",
        "-shared",
        "-fPIC",
        _SRC,
        "-o",
        _LIB_PATH,
    ]
    try:
        with tempfile.TemporaryFile() as err:
            subprocess.run(cmd, check=True, stdout=err, stderr=err, timeout=120)
        return _LIB_PATH
    except Exception as exc:  # pragma: no cover - depends on toolchain
        logger.info(f"Native geometry kernel unavailable ({exc}).")
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("SUPERSCREEN_TPU_NATIVE", "1") == "0":
        return None
    path = _build()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError as exc:  # pragma: no cover
        logger.info(f"Failed to load native geometry kernel: {exc}")
        return None
    c_double_p = ctypes.POINTER(ctypes.c_double)
    c_int_p = ctypes.POINTER(ctypes.c_int)
    c_u8_p = ctypes.POINTER(ctypes.c_uint8)
    lib.delaunay.argtypes = [c_double_p, ctypes.c_int, c_int_p, ctypes.c_int]
    lib.delaunay.restype = ctypes.c_int
    lib.points_in_polygon.argtypes = [
        c_double_p, ctypes.c_int, c_double_p, ctypes.c_int, c_u8_p,
    ]
    lib.points_in_polygon.restype = None
    lib.segments_intersect_batch.argtypes = [
        c_double_p, c_double_p, c_double_p, c_double_p, ctypes.c_int, c_u8_p,
    ]
    lib.segments_intersect_batch.restype = None
    _LIB = lib
    return _LIB


def available() -> bool:
    """True if the native kernel compiled and loaded."""
    return _load() is not None


def _as_c_double(arr: np.ndarray):
    arr = np.ascontiguousarray(arr, dtype=np.float64)
    return arr, arr.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def delaunay(points: np.ndarray) -> Optional[np.ndarray]:
    """Delaunay triangulation via the native Bowyer-Watson kernel.

    Args:
        points: ``(n, 2)`` coordinates.

    Returns:
        ``(m, 3)`` triangle indices, or None if the native kernel is
        unavailable or failed (callers fall back to scipy).
    """
    lib = _load()
    if lib is None:
        return None
    points = np.ascontiguousarray(points, dtype=np.float64)
    n = len(points)
    # Deterministic sub-resolution jitter: mesh point sets are highly
    # degenerate for Delaunay (hex lattices and circular rings are exactly
    # cocircular), which breaks plain double-precision predicates.  A
    # reproducible jitter ~1e-9 of the bounding box breaks ties without
    # affecting triangle quality.
    span = max(np.ptp(points[:, 0]), np.ptp(points[:, 1]), 1e-300)
    jitter = np.random.default_rng(12345).uniform(
        -1.0, 1.0, size=points.shape
    )
    jittered = points + 1e-9 * span * jitter
    n = len(points)
    max_tris = 2 * n + 16
    out = np.empty((max_tris, 3), dtype=np.int32)
    _, pts_p = _as_c_double(jittered)
    count = lib.delaunay(
        pts_p, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), max_tris
    )
    if count < 0:
        return None
    tris = np.ascontiguousarray(out[:count]).astype(np.int64)
    # Normalize to CCW orientation (as scipy.spatial.Delaunay produces).
    xy = points[tris]
    signed = 0.5 * np.linalg.det(xy[:, [2, 0]] - xy[:, [1, 2]])
    flip = signed < 0
    tris[flip] = tris[flip][:, ::-1]
    return tris


def points_in_polygon(poly: np.ndarray, query: np.ndarray) -> Optional[np.ndarray]:
    """Batch even-odd point-in-polygon via the native kernel (or None)."""
    lib = _load()
    if lib is None:
        return None
    poly, poly_p = _as_c_double(np.asarray(poly))
    query, query_p = _as_c_double(np.atleast_2d(query))
    out = np.empty(len(query), dtype=np.uint8)
    lib.points_in_polygon(
        poly_p, len(poly), query_p, len(query),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out.astype(bool)


def segments_intersect_batch(a0, a1, b0, b1) -> Optional[np.ndarray]:
    """Proper-intersection tests for segment pairs via the native kernel."""
    lib = _load()
    if lib is None:
        return None
    a0, a0p = _as_c_double(np.atleast_2d(a0))
    a1, a1p = _as_c_double(np.atleast_2d(a1))
    b0, b0p = _as_c_double(np.atleast_2d(b0))
    b1, b1p = _as_c_double(np.atleast_2d(b1))
    n = len(a0)
    out = np.empty(n, dtype=np.uint8)
    lib.segments_intersect_batch(
        a0p, a1p, b0p, b1p, n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out.astype(bool)
