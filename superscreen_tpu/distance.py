"""Pairwise distance and q-matrix kernels (top-level API parity with the
reference ``superscreen/distance.py``; numba is replaced by blocked JAX
kernels running on TPU)."""

import numpy as np

from .ops import kernels as _kernels

__all__ = [
    "cdist",
    "q_matrix",
    "sqeuclidean_distance_2d",
    "sqeuclidean_distance_3d",
    "euclidean_distance_2d",
    "euclidean_distance_3d",
]


def _pairwise_sq(XA: np.ndarray, XB: np.ndarray, ndim: int) -> np.ndarray:
    XA = np.asarray(XA, dtype=float)
    XB = np.asarray(XB, dtype=float)
    if XA.shape[1] != ndim or XB.shape[1] != ndim:
        raise ValueError(
            f"Expected (n, {ndim}) arrays, got {XA.shape} and {XB.shape}."
        )
    diff = XA[:, None, :] - XB[None, :, :]
    return np.einsum("ijk,ijk->ij", diff, diff)


def sqeuclidean_distance_2d(XA: np.ndarray, XB: np.ndarray) -> np.ndarray:
    """Squared Euclidean distances between 2D point sets (parity with the
    reference ``distance.py:6``)."""
    return _pairwise_sq(XA, XB, 2)


def sqeuclidean_distance_3d(XA: np.ndarray, XB: np.ndarray) -> np.ndarray:
    """Squared Euclidean distances between 3D point sets (reference
    ``distance.py:18``)."""
    return _pairwise_sq(XA, XB, 3)


def euclidean_distance_2d(XA: np.ndarray, XB: np.ndarray) -> np.ndarray:
    """Euclidean distances between 2D point sets (reference ``distance.py:31``)."""
    return np.sqrt(_pairwise_sq(XA, XB, 2))


def euclidean_distance_3d(XA: np.ndarray, XB: np.ndarray) -> np.ndarray:
    """Euclidean distances between 3D point sets (reference ``distance.py:43``)."""
    return np.sqrt(_pairwise_sq(XA, XB, 3))


def cdist(XA: np.ndarray, XB: np.ndarray, metric: str = "euclidean") -> np.ndarray:
    """Pairwise distances between observations in 2D or 3D space.

    Args:
        XA: ``(mA, n)`` array with n in (2, 3).
        XB: ``(mB, n)`` array with n in (2, 3).
        metric: "euclidean" or "sqeuclidean".

    Returns:
        ``(mA, mB)`` distance matrix.
    """
    XA = np.asarray(XA)
    XB = np.asarray(XB)
    metrics = ("euclidean", "sqeuclidean")
    if metric not in metrics:
        raise ValueError(f"Metric must be one of {metrics!r}, got {metric!r}.")
    if XA.shape[1] != XB.shape[1]:
        raise ValueError(
            f"XA.shape[1] ({XA.shape[1]}) must be equal to "
            f"XB.shape[1] ({XB.shape[1]})."
        )
    if XA.shape[1] not in (2, 3):
        raise ValueError(
            f"Expected shape (n, 2) or (n, 3) arrays, got {XA.shape} and "
            f"{XB.shape}."
        )
    return np.asarray(_kernels.cdist(XA, XB, metric=metric))


def q_matrix(points: np.ndarray, dtype=None) -> np.ndarray:
    """The matrix ``q_ij = 1/(4 pi |r_i - r_j|^3)`` with zero diagonal."""
    return np.asarray(_kernels.q_matrix(points, dtype=dtype))
