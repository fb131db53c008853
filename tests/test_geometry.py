import numpy as np
import pytest

from superscreen_tpu import geometry as geo
from superscreen_tpu import polygon_ops as pops


def test_circle_ellipse():
    c = geo.circle(2.0, points=80)
    assert c.shape == (80, 2)
    assert np.allclose(np.linalg.norm(c, axis=1), 2.0)
    # CCW orientation
    assert pops.signed_area(c) > 0
    e = geo.ellipse(2.0, 1.0, points=64, center=(1, 1))
    assert e.shape == (64, 2)


def test_box():
    b = geo.box(2.0, 1.0, points=101)
    assert np.isclose(np.ptp(b[:, 0]), 2.0)
    assert np.isclose(np.ptp(b[:, 1]), 1.0)
    assert np.isclose(pops.polygon_area(b), 2.0)
    sq = geo.box(3.0)
    assert np.isclose(pops.polygon_area(sq), 9.0)


def test_rotate_translate():
    pts = geo.box(1.0)
    rot = geo.rotate(pts, 90)
    assert np.allclose(pops.polygon_area(rot), pops.polygon_area(pts))
    assert np.allclose(geo.rotate(np.array([[1.0, 0.0]]), 90), [[0, 1]], atol=1e-12)
    t = geo.translate(pts, 2, -1)
    assert np.allclose(t.mean(axis=0), pts.mean(axis=0) + [2, -1])


def test_path_vectors():
    path = np.array([[0.0, 0], [1, 0], [1, 1]])
    lengths, normals = geo.path_vectors(path)
    assert np.allclose(lengths, [1, 1])
    # dr x z: (1,0) -> (0,-1); (0,1) -> (1,0)
    assert np.allclose(normals, [[0, -1], [1, 0]])


def test_close_curve_ensure_unique():
    pts = geo.circle(1, points=10)
    closed = geo.close_curve(pts)
    assert len(closed) == 11
    assert np.allclose(closed[0], closed[-1])
    assert len(geo.close_curve(closed)) == 11
    dup = np.concatenate([pts, pts[:3]], axis=0)
    assert len(geo.ensure_unique(dup)) == 10
