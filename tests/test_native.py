import numpy as np
import pytest

from superscreen_tpu import geometry as geo
from superscreen_tpu import native


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native geometry kernel unavailable"
)


def _edgeset(t):
    e = np.concatenate([t[:, [0, 1]], t[:, [1, 2]], t[:, [2, 0]]])
    return set(map(tuple, np.sort(e, axis=1).tolist()))


@pytest.mark.parametrize("n", [50, 500, 3000])
def test_delaunay_matches_scipy_random(n):
    """Same hull area and triangle count as scipy, nearly identical edge
    sets (the tie-breaking jitter may flip diagonals of near-cocircular
    quads), and the empty-circumcircle property holds."""
    from scipy.spatial import Delaunay

    rng = np.random.default_rng(n)
    pts = rng.random((n, 2)) * 10
    tris = native.delaunay(pts)
    ref = Delaunay(pts).simplices
    assert tris is not None
    # Hull slivers (zero-area qhull artifacts or circumcircles beyond the
    # super-triangle scale) may differ by a couple of triangles.
    assert abs(len(tris) - len(ref)) <= 3

    def area(t):
        xy = pts[t]
        return np.abs(
            0.5 * np.linalg.det(xy[:, [2, 0]] - xy[:, [1, 2]])
        ).sum()

    assert np.isclose(area(tris), area(ref), rtol=1e-9)
    e1, e2 = _edgeset(tris), _edgeset(ref)
    assert len(e1 ^ e2) <= max(2, n // 250)

    # Empty-circumcircle property on a sample of triangles.
    sample = tris[rng.choice(len(tris), size=min(50, len(tris)), replace=False)]
    for t in sample:
        a, b, c = pts[t]
        d = np.linalg.det(
            np.array(
                [
                    [a[0] - c[0], a[1] - c[1]],
                    [b[0] - c[0], b[1] - c[1]],
                ]
            )
        )
        ux = (
            np.sum((a - c) * (a + c)) * (b[1] - c[1])
            - np.sum((b - c) * (b + c)) * (a[1] - c[1])
        ) / (2 * d)
        uy = (
            np.sum((b - c) * (b + c)) * (a[0] - c[0])
            - np.sum((a - c) * (a + c)) * (b[0] - c[0])
        ) / (2 * d)
        center = np.array([ux, uy])
        r = np.linalg.norm(a - center)
        dist = np.linalg.norm(pts - center, axis=1)
        inside = dist < r * (1 - 1e-7)
        inside[t] = False
        assert not inside.any()


def test_delaunay_lattice_points():
    """Hex-lattice + circle-ring point sets (maximally cocircular) must
    triangulate to a valid cover of the convex hull."""
    from superscreen_tpu.device.mesh_generation import (
        _hex_lattice,
        triangle_areas,
    )

    ring = geo.circle(3.0, points=64)
    lattice = _hex_lattice((np.array([-3, -3]), np.array([3, 3])), 0.35)
    keep = np.linalg.norm(lattice, axis=1) < 2.7
    pts = np.concatenate([ring, lattice[keep]])
    tris = native.delaunay(pts)
    assert tris is not None
    areas = np.abs(triangle_areas(pts, tris))
    # The triangulation covers the hull of the ring (area ~ pi r^2 for the
    # polygonal ring).
    from superscreen_tpu import polygon_ops as pops

    hull_area = pops.polygon_area(ring)
    assert np.isclose(areas.sum(), hull_area, rtol=1e-6)
    # Valid mesh: every interior edge shared by exactly 2 triangles.
    e = np.concatenate([tris[:, [0, 1]], tris[:, [1, 2]], tris[:, [2, 0]]])
    e = np.sort(e, axis=1)
    _, counts = np.unique(e, axis=0, return_counts=True)
    assert counts.max() <= 2


def test_points_in_polygon_matches_numpy():
    from superscreen_tpu import polygon_ops as pops

    rng = np.random.default_rng(0)
    poly = geo.circle(2, points=33)
    q = rng.random((500, 2)) * 6 - 3
    nat = native.points_in_polygon(poly, q)
    ref = pops.points_in_polygon(poly, q)
    assert np.array_equal(nat, ref)


def test_segments_intersect_batch():
    a0 = np.array([[0.0, 0.0], [0.0, 0.0]])
    a1 = np.array([[1.0, 1.0], [1.0, 0.0]])
    b0 = np.array([[0.0, 1.0], [5.0, -1.0]])
    b1 = np.array([[1.0, 0.0], [5.0, 1.0]])
    out = native.segments_intersect_batch(a0, a1, b0, b1)
    assert out.tolist() == [True, False]
