"""Host-side geometry helpers.

API parity with the reference ``superscreen/geometry.py`` (circle, ellipse,
box, rotate, translate, path_vectors, close_curve, ensure_unique), implemented
with plain NumPy.  These run on the host as part of device construction and
meshing; nothing here is on the solver hot path.
"""

from typing import Optional, Tuple

import numpy as np

__all__ = [
    "unit_vector",
    "path_vectors",
    "rotation_matrix",
    "rotate",
    "translate",
    "ellipse",
    "circle",
    "box",
    "close_curve",
    "ensure_unique",
]


def unit_vector(vector: np.ndarray) -> np.ndarray:
    """Normalizes ``vector`` along its last axis."""
    norm = np.linalg.norm(vector, axis=-1, keepdims=True)
    return vector / norm


def path_vectors(path: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Edge lengths and outward unit normals for a path.

    For each edge ``dr`` of the path, the normal is ``dr x z`` normalized
    (reference: ``superscreen/geometry.py:12-29``).

    Args:
        path: Shape ``(n, 2)`` array of coordinates representing a
            continuous path.

    Returns:
        A tuple ``(edge_lengths, unit_normals)`` with shapes ``(n - 1,)``
        and ``(n - 1, 2)``.
    """
    dr = np.diff(path, axis=0)
    # (dx, dy, 0) x (0, 0, 1) = (dy, -dx, 0)
    normals = np.stack([dr[:, 1], -dr[:, 0]], axis=1)
    edge_lengths = np.linalg.norm(dr, axis=1)
    unit_normals = normals / edge_lengths[:, np.newaxis]
    return edge_lengths, unit_normals


def rotation_matrix(angle_radians: float) -> np.ndarray:
    """Returns a 2D counterclockwise rotation matrix."""
    c = np.cos(angle_radians)
    s = np.sin(angle_radians)
    return np.array([[c, -s], [s, c]])


def rotate(coords: np.ndarray, angle_degrees: float) -> np.ndarray:
    """Rotates ``(n, 2)`` coordinates counterclockwise about the origin."""
    coords = np.asarray(coords)
    assert coords.ndim == 2 and coords.shape[1] == 2
    R = rotation_matrix(np.radians(angle_degrees))
    return coords @ R.T


def translate(coords: np.ndarray, dx: float, dy: float) -> np.ndarray:
    """Translates ``(n, 2)`` coordinates by ``(dx, dy)``."""
    coords = np.asarray(coords)
    assert coords.ndim == 2 and coords.shape[1] == 2
    return coords + np.array([[dx, dy]])


def ellipse(
    a: float,
    b: float,
    points: int = 100,
    center: Tuple[float, float] = (0, 0),
    angle: float = 0,
) -> np.ndarray:
    """Counterclockwise coordinates of an ellipse with semi-axes ``a, b``,
    rotated by ``angle`` (degrees) about the origin **before** translating
    to ``center``."""
    x0, y0 = center
    theta = np.linspace(0, 2 * np.pi, points, endpoint=False)
    coords = np.stack([a * np.cos(theta), b * np.sin(theta)], axis=1)
    coords = coords + np.array([[x0, y0]])
    if angle:
        coords = rotate(coords, angle)
    return coords


def circle(
    radius: float, points: int = 100, center: Tuple[float, float] = (0, 0)
) -> np.ndarray:
    """Counterclockwise coordinates of a circle."""
    return ellipse(radius, radius, points=points, center=center, angle=0)


def box(
    width: float,
    height: Optional[float] = None,
    points: int = 101,
    center: Tuple[float, float] = (0, 0),
    angle: float = 0,
) -> np.ndarray:
    """Counterclockwise coordinates of a rectangle with the given width and
    height (reference: ``superscreen/geometry.py:128-179``)."""
    width = abs(width)
    if height is None:
        height = width
    height = abs(height)
    x0, y0 = center
    perimeter = 2 * (width + height)
    x_points = round(points * width / perimeter)
    y_points = round(points * height / perimeter)
    xs = np.concatenate(
        [
            width / 2 * np.ones(y_points),
            np.linspace(width / 2, -width / 2, x_points),
            -width / 2 * np.ones(y_points),
            np.linspace(-width / 2, width / 2, x_points),
        ]
    )
    ys = np.concatenate(
        [
            np.linspace(-height / 2, height / 2, y_points),
            height / 2 * np.ones(x_points),
            np.linspace(height / 2, -height / 2, y_points),
            -height / 2 * np.ones(x_points),
        ]
    )
    coords = np.stack([xs, ys], axis=1) + np.array([[x0, y0]])
    if angle:
        coords = rotate(coords, angle)
    return coords


def close_curve(points: np.ndarray) -> np.ndarray:
    """Appends the first point to the end of the curve if it is not closed."""
    points = np.asarray(points)
    if not np.allclose(points[0], points[-1]):
        points = np.concatenate([points, points[:1]], axis=0)
    return points


def ensure_unique(coords: np.ndarray) -> np.ndarray:
    """Removes duplicate coordinates, preserving order of first appearance."""
    coords = np.asarray(coords)
    _, ix = np.unique(coords, return_index=True, axis=0)
    return coords[np.sort(ix)]
