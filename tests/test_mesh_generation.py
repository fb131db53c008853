import h5py
import numpy as np
import pytest

import superscreen_tpu as sc
from superscreen_tpu import polygon_ops as pops
from superscreen_tpu.device import (
    boundary_vertices,
    generate_mesh,
    get_edge_lengths,
    get_edges,
    smooth_mesh,
)


def min_angles(pts, tris):
    p = pts[tris]
    angs = []
    for k in range(3):
        a, b, c = p[:, k], p[:, (k + 1) % 3], p[:, (k + 2) % 3]
        v1, v2 = b - a, c - a
        cos = np.sum(v1 * v2, axis=1) / (
            np.linalg.norm(v1, axis=1) * np.linalg.norm(v2, axis=1)
        )
        angs.append(np.degrees(np.arccos(np.clip(cos, -1, 1))))
    return np.min(np.stack(angs), axis=0)


def test_min_points():
    pts, tris = generate_mesh(sc.geometry.circle(1, points=60), min_points=900)
    assert len(pts) >= 900
    assert np.isclose(
        np.abs(pops.signed_area(sc.geometry.circle(1, points=60))),
        np.sum(np.abs(0.5 * np.linalg.det(pts[tris][:, [2, 0]] - pts[tris][:, [1, 2]]))),
        rtol=1e-6,
    )


def test_max_edge_length():
    pts, tris = generate_mesh(
        sc.geometry.box(2, points=40), max_edge_length=0.3
    )
    assert get_edge_lengths(pts, tris).max() <= 0.3


def test_mesh_quality():
    L = pops.boolean_op(
        sc.geometry.box(2), sc.geometry.translate(sc.geometry.box(2), -1, -1),
        "difference",
    )
    pts, tris = generate_mesh(L, max_edge_length=0.25)
    assert min_angles(pts, tris).min() > 15


def test_preserve_boundary():
    ring = sc.geometry.circle(1, points=40)
    pts, tris = generate_mesh(ring, max_edge_length=0.25, preserve_boundary=True)
    bidx = boundary_vertices(pts, tris)
    # All boundary vertices are original polygon vertices.
    boundary_pts = pts[bidx]
    d = np.linalg.norm(boundary_pts[:, None] - ring[None], axis=-1).min(axis=1)
    assert np.all(d < 1e-9)
    assert len(bidx) == len(ring)


def test_hole_coords():
    outer = sc.geometry.circle(3, points=80)
    inner = sc.geometry.circle(1, points=40)
    pts, tris = generate_mesh(outer, hole_coords=[inner], min_points=700)
    from superscreen_tpu.device import triangle_areas

    area = np.abs(triangle_areas(pts, tris)).sum()
    assert np.isclose(area, np.pi * (9 - 1), rtol=2e-2)


def test_feature_rings_conformity():
    outer = sc.geometry.circle(3, points=80)
    inner = sc.geometry.circle(1, points=40)
    pts, tris = generate_mesh(outer, feature_rings=[inner], min_points=700)
    # Every ring vertex is a mesh vertex.
    d = np.linalg.norm(pts[:, None] - inner[None], axis=-1).min(axis=0)
    assert np.all(d < 1e-9)


def test_convex_hull():
    L = pops.boolean_op(
        sc.geometry.box(2), sc.geometry.translate(sc.geometry.box(2), -1, -1),
        "difference",
    )
    pts, tris = generate_mesh(L, min_points=500, convex_hull=True)
    from superscreen_tpu.device import triangle_areas

    # The convex hull of the L has area 4 - 0.5 (cut corner triangle).
    area = np.abs(triangle_areas(pts, tris)).sum()
    assert area > 3.4


def test_boundary_vertices_ccw():
    pts, tris = generate_mesh(sc.geometry.circle(1, points=50), min_points=300)
    bidx = boundary_vertices(pts, tris)
    assert pops.signed_area(pts[bidx]) > 0


def test_smooth_mesh():
    pts, tris = generate_mesh(
        sc.geometry.circle(1, points=50), min_points=300, smooth_rounds=0
    )
    sm_pts, sm_tris = smooth_mesh(pts, tris, 5)
    assert sm_pts.shape == pts.shape
    # Boundary points don't move.
    edges, is_b = get_edges(tris)
    boundary = np.unique(edges[is_b].ravel())
    assert np.allclose(sm_pts[boundary], pts[boundary])


def test_mesh_class_and_hdf5(tmp_path):
    pts, tris = generate_mesh(sc.geometry.circle(1, points=50), min_points=400)
    mesh = sc.Mesh.from_triangulation(pts, tris)
    stats = mesh.stats()
    assert stats["num_sites"] == len(pts)
    assert mesh.closest_site((0, 0)) == np.argmin(np.linalg.norm(pts, axis=1))
    # Compressed round-trip rebuilds operators.
    with h5py.File(tmp_path / "mesh.h5", "x") as f:
        mesh.to_hdf5(f.create_group("mesh"), compress=True)
    with h5py.File(tmp_path / "mesh.h5", "r") as f:
        loaded = sc.Mesh.from_hdf5(f["mesh"])
    assert np.allclose(loaded.sites, mesh.sites)
    assert np.allclose(loaded.vertex_areas, mesh.vertex_areas)
    # Uncompressed round-trip restores without recompute.
    with h5py.File(tmp_path / "mesh2.h5", "x") as f:
        mesh.to_hdf5(f.create_group("mesh"), compress=False)
    with h5py.File(tmp_path / "mesh2.h5", "r") as f:
        assert sc.Mesh.is_restorable(f["mesh"])
        loaded2 = sc.Mesh.from_hdf5(f["mesh"])
    assert np.allclose(loaded2.triangle_areas, mesh.triangle_areas)
    copied = mesh.copy()
    assert np.allclose(copied.sites, mesh.sites)


def test_edge_mesh():
    from superscreen_tpu.device import EdgeMesh

    pts, tris = generate_mesh(sc.geometry.circle(1, points=40), min_points=200)
    em = EdgeMesh.from_mesh(pts, tris)
    assert len(em.edges) == len(em.edge_lengths)
    assert np.all(em.edge_lengths > 0)
    assert len(em.boundary_edge_indices) > 0
