"""Top-level FEM API (parity with the reference ``superscreen/fem.py``).

Thin wrappers around :mod:`superscreen_tpu.ops.fem`; dense matrices are
returned for API compatibility, while the solver itself uses the COO forms.
"""

from typing import Literal, Optional, Tuple

import numpy as np

from .ops import fem as _fem

__all__ = [
    "triangle_areas",
    "in_polygon",
    "centroids",
    "adjacency_matrix",
    "calculate_weights",
    "laplace_operator",
    "gradient_triangles",
    "gradient_vertices",
]

triangle_areas = _fem.triangle_areas
in_polygon = _fem.in_polygon
centroids = _fem.centroids
adjacency_matrix = _fem.adjacency_matrix


def calculate_weights(
    points: np.ndarray,
    triangles: np.ndarray,
    method: str,
    sparse: bool = False,
) -> np.ndarray:
    """The edge-weight matrix for the given method ("uniform",
    "inv_euclidean", or "half_cotangent")."""
    coo = _fem._weights_coo(points, triangles, method)
    if sparse:
        return coo
    return coo.to_dense()


def laplace_operator(
    points: np.ndarray,
    triangles: np.ndarray,
    masses: Optional[np.ndarray] = None,
    weight_method: Literal[
        "uniform", "half_cotangent", "inv_euclidean"
    ] = "half_cotangent",
) -> np.ndarray:
    """The dense Laplace-Beltrami operator ``inv(M) @ L``."""
    return _fem.laplace_operator(
        points, triangles, masses=masses, weight_method=weight_method
    )


def gradient_triangles(
    points: np.ndarray,
    triangles: np.ndarray,
    areas: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Dense triangle gradient operators ``(Gx, Gy)`` of shape ``(m, n)``."""
    Gx, Gy = _fem.gradient_triangles_coo(points, triangles, areas=areas)
    return Gx.to_dense(), Gy.to_dense()


def gradient_vertices(
    points: np.ndarray,
    triangles: np.ndarray,
    areas: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Dense vertex gradient operators ``(gx, gy)`` of shape ``(n, n)``."""
    gx, gy = _fem.gradient_vertices_coo(points, triangles, areas=areas)
    return gx.to_dense(), gy.to_dense()
