import matplotlib.pyplot as plt
import numpy as np
import pytest

import superscreen_tpu as sc
from superscreen_tpu.visualization import non_gui_backend


def test_set_polygon_points():
    # Self-intersecting ring ("bowtie") is rejected.
    invalid = [(0, 0), (0, 2), (1, 1), (2, 2), (2, 0), (1, 1), (0, 0)]
    with pytest.raises(ValueError):
        _ = sc.Polygon(points=invalid)

    # 3D coordinates are rejected.
    x, y = sc.geometry.circle(1).T
    points = np.stack([x, y, np.ones_like(x)], axis=1)
    with pytest.raises(ValueError):
        _ = sc.Polygon(points=points)

    # CW input is re-oriented CCW.
    cw = sc.geometry.circle(1)[::-1]
    poly = sc.Polygon(points=cw)
    from superscreen_tpu import polygon_ops as pops

    assert pops.signed_area(poly.points) > 0


def test_polygon_on_boundary(radius=1):
    points = sc.geometry.circle(radius, points=501)
    polygon = sc.Polygon(points=points)
    Delta_x, Delta_y = polygon.extents
    assert np.isclose(Delta_x, 2 * radius)
    assert np.isclose(Delta_y, 2 * radius)

    smaller = sc.geometry.circle(radius - 0.01)
    bigger = sc.geometry.circle(radius + 0.01)
    assert polygon.on_boundary(smaller, radius=0.1).all()
    assert polygon.on_boundary(bigger, radius=0.1).all()
    assert not polygon.on_boundary(smaller, radius=0.001).any()
    assert not polygon.on_boundary(bigger, radius=0.001).any()
    assert issubclass(
        polygon.on_boundary(smaller, index=True).dtype.type, np.integer
    )


def test_polygon_join():
    square1 = sc.Polygon(points=sc.geometry.box(1))
    square2 = sc.Polygon(
        points=sc.geometry.translate(sc.geometry.box(1), 0.5, 0.5)
    )
    square3 = sc.geometry.box(1, center=(-0.25, 0.25))
    name = "name"
    layer = "layer"
    for items in (
        [square1, square2, square3],
        [square1.points, square2.points, square3],
    ):
        _ = sc.Polygon.from_union(items, name=name, layer=layer)
        _ = sc.Polygon.from_difference(items, name=name, layer=layer)
        _ = sc.Polygon.from_intersection(items, name=name, layer=layer)

    assert np.isclose(
        square1.union(square2).area, 2 * 1.0 - 0.25, rtol=1e-6
    )
    assert np.isclose(square1.intersection(square2).area, 0.25, rtol=1e-6)
    assert np.isclose(square1.difference(square2).area, 0.75, rtol=1e-6)

    with pytest.raises(ValueError):
        _ = square1._join_via(square2, "invalid")

    # Symmetric difference of overlapping polygons is not simply connected.
    with pytest.raises(ValueError):
        _ = sc.Polygon.from_difference(
            [square1, square2], name=name, layer=layer, symmetric=True
        )

    assert square1.resample(False) == square1
    assert square1.resample(None).points.shape == square1.points.shape
    assert square1.resample(71).points.shape != square1.points.shape

    with pytest.raises(ValueError):
        bowtie = [(0, 0), (0, 2), (1, 1), (2, 2), (2, 0), (1, 1), (0, 0)]
        _ = sc.Polygon(name="bowtie", layer="layer", points=bowtie)


def test_polygon_disjoint_union_raises():
    p1 = sc.Polygon(points=sc.geometry.circle(1))
    p2 = sc.geometry.circle(1, center=(5, 0))
    with pytest.raises(ValueError):
        _ = p1.union(p2)


def test_polygon_contains_points():
    poly = sc.Polygon(points=sc.geometry.circle(2))
    pts = np.array([[0, 0], [1, 1], [3, 3], [1.9, 0]])
    mask = poly.contains_points(pts)
    assert mask.tolist() == [True, True, False, True]
    idx = poly.contains_points(pts, index=True)
    assert idx.tolist() == [0, 1, 3]


def test_polygon_transforms():
    poly = sc.Polygon("p", layer="l", points=sc.geometry.box(2, 1))
    r = poly.rotate(90)
    assert np.isclose(np.ptp(r.points[:, 0]), 1)
    assert np.isclose(np.ptp(r.points[:, 1]), 2)
    t = poly.translate(1, 2)
    assert np.isclose(t.points[:, 0].mean() - poly.points[:, 0].mean(), 1)
    s = poly.scale(xfact=2)
    assert np.isclose(s.area, 2 * poly.area)
    s2 = poly.scale(yfact=-1)
    assert np.isclose(s2.area, poly.area)


def test_polygon_buffer():
    poly = sc.Polygon("p", layer="l", points=sc.geometry.circle(1))
    bigger = poly.buffer(0.5, join_style="round")
    assert np.isclose(bigger.area, np.pi * 1.5**2, rtol=1e-2)
    smaller = poly.buffer(-0.25)
    assert np.isclose(smaller.area, np.pi * 0.75**2, rtol=1e-2)
    pts = poly.buffer(0.1, as_polygon=False)
    assert isinstance(pts, np.ndarray)


@pytest.mark.parametrize("min_points", [None, 800])
@pytest.mark.parametrize("smooth", [0, 20])
def test_polygon_make_mesh(min_points, smooth):
    poly = sc.Polygon(points=sc.geometry.box(2))
    poly = (
        poly.difference(poly.translate(dx=-1, dy=-1))
        .set_name("name")
        .set_layer("layer")
    )
    mesh = poly.make_mesh(
        min_points=min_points,
        max_edge_length=0.4,
        smooth=smooth,
        build_operators=False,
    )
    assert isinstance(mesh, sc.Mesh)
    if min_points:
        assert len(mesh.sites) >= min_points


def test_plot_polygon():
    with non_gui_backend():
        ax = sc.Polygon(points=sc.geometry.box(1)).plot()
        assert isinstance(ax, plt.Axes)
        plt.close("all")


def test_polygon_hdf5_roundtrip(tmp_path):
    import h5py

    poly = sc.Polygon("p", layer="l", points=sc.geometry.circle(1))
    with h5py.File(tmp_path / "poly.h5", "x") as f:
        poly.to_hdf5(f.create_group("polygon"))
    with h5py.File(tmp_path / "poly.h5", "r") as f:
        loaded = sc.Polygon.from_hdf5(f["polygon"])
    assert loaded == poly
