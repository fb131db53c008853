"""Triangular mesh generation (host-side).

The reference implementation shells out to the Triangle C library via meshpy
for constrained Delaunay refinement (``superscreen/device/utils.py:17-136``).
This module instead generates boundary-conforming Delaunay meshes directly:

1. Densify the boundary ring (and any feature rings that the mesh must
   conform to, e.g. hole outlines) to the target edge length ``h``.
2. Fill the interior with a hexagonal point lattice at spacing ``h``,
   keeping a protective margin around all fixed (feature) points.
3. Delaunay-triangulate (``scipy.spatial.Delaunay``) and discard triangles
   whose centroid falls outside the region (or inside an unmeshed hole).
4. Laplacian-smooth the lattice points (fixed points pinned) and
   re-triangulate, which drives triangles toward equilateral.
5. Shrink ``h`` and repeat until ``min_points`` / ``max_edge_length``
   targets are met (mirroring the refinement loop of the reference).

Mesh generation is not on the solve hot path; everything here is NumPy.
"""

import logging
from typing import List, Optional, Sequence, Tuple

import numpy as np
from matplotlib.path import Path
from scipy import spatial

from .. import polygon_ops as ops
from ..geometry import ensure_unique

logger = logging.getLogger("device")

__all__ = [
    "generate_mesh",
    "smooth_mesh",
    "get_edges",
    "get_edge_lengths",
    "boundary_vertices",
    "triangle_areas",
    "vertex_areas",
]


def triangle_areas(points: np.ndarray, triangles: np.ndarray) -> np.ndarray:
    """Signed areas of each triangle (positive for CCW vertex order)."""
    xy = points[triangles]
    s = xy[:, [2, 0]] - xy[:, [1, 2]]
    return 0.5 * np.linalg.det(s)


def vertex_areas(
    points: np.ndarray,
    triangles: np.ndarray,
    tri_areas: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Effective vertex areas: one third of the summed adjacent triangle
    areas (the lumped FEM mass matrix diagonal)."""
    if tri_areas is None:
        tri_areas = triangle_areas(points, triangles)
    v_areas = np.zeros(len(points), dtype=float)
    third = np.broadcast_to((tri_areas / 3)[:, None], triangles.shape)
    np.add.at(v_areas, triangles, third)
    return v_areas


def get_edges(triangles: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Unique undirected edges of a triangulation and a boundary flag
    (an edge is on the boundary if it belongs to exactly one triangle)."""
    edges = np.concatenate([triangles[:, e] for e in [(0, 1), (1, 2), (2, 0)]])
    edges = np.sort(edges, axis=1)
    edges, counts = np.unique(edges, return_counts=True, axis=0)
    return edges, counts == 1


def get_edge_lengths(points: np.ndarray, triangles: np.ndarray) -> np.ndarray:
    """Lengths of all unique edges in the triangulation."""
    edges, _ = get_edges(triangles)
    return np.linalg.norm(np.diff(points[edges], axis=1), axis=2).squeeze()


def smooth_mesh(
    points: np.ndarray, triangles: np.ndarray, iterations: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Laplacian smoothing: each interior vertex moves to the mean of its
    neighbors; boundary vertices stay fixed."""
    edges, is_boundary = get_edges(triangles)
    n = points.shape[0]
    boundary = np.unique(edges[is_boundary].ravel())
    points = np.array(points, dtype=float)
    num_neighbors = np.bincount(edges.ravel(), minlength=n)
    for _ in range(iterations):
        new_points = np.zeros_like(points)
        np.add.at(new_points, edges[:, 0], points[edges[:, 1]])
        np.add.at(new_points, edges[:, 1], points[edges[:, 0]])
        new_points /= np.maximum(num_neighbors, 1)[:, None]
        new_points[boundary] = points[boundary]
        points = new_points
    return points, triangles


def boundary_vertices(points: np.ndarray, triangles: np.ndarray) -> np.ndarray:
    """Indices of the outer boundary vertices, ordered counterclockwise.

    Mirrors ``superscreen/device/utils.py:205-227`` (which uses shapely
    polygonize); here the boundary cycle is walked directly from the
    boundary-edge adjacency.
    """
    edges, is_boundary = get_edges(triangles)
    b_edges = edges[is_boundary]
    if len(b_edges) == 0:
        raise ValueError("Mesh has no boundary edges.")
    # Build adjacency between boundary vertices.
    neighbors = {}
    for i, j in b_edges:
        neighbors.setdefault(int(i), []).append(int(j))
        neighbors.setdefault(int(j), []).append(int(i))
    loops: List[List[int]] = []
    visited = set()
    for start in neighbors:
        if start in visited:
            continue
        loop = [start]
        visited.add(start)
        prev = None
        node = start
        while True:
            options = [v for v in neighbors[node] if v != prev]
            nxt = None
            for v in options:
                if v == start and len(loop) > 2:
                    nxt = None
                    break
                if v not in visited:
                    nxt = v
                    break
            if nxt is None:
                break
            loop.append(nxt)
            visited.add(nxt)
            prev, node = node, nxt
        loops.append(loop)
    # The outer boundary is the loop enclosing the largest area.
    def loop_area(loop):
        return abs(ops.signed_area(points[loop]))

    loop = max(loops, key=loop_area)
    indices = np.array(loop, dtype=np.int64)
    if ops.signed_area(points[indices]) < 0:
        indices = indices[::-1]
    return indices


def _densify_ring(ring: np.ndarray, h: float) -> np.ndarray:
    """Subdivide each ring segment so all segments are <= h.  Exactly
    collinear intermediate vertices are collapsed first so straight edges
    get uniform spacing (and no degenerate Delaunay slivers)."""
    ring = ops.remove_collinear(ops.orient_ccw(ring), tol=1e-9)
    out = []
    n = len(ring)
    for i in range(n):
        a = ring[i]
        b = ring[(i + 1) % n]
        seg = np.linalg.norm(b - a)
        k = max(1, int(np.ceil(seg / h)))
        for t in range(k):
            out.append(a + (b - a) * (t / k))
    return np.array(out)


def _hex_lattice(bbox, h: float) -> np.ndarray:
    """Hexagonal (triangular) lattice covering the bounding box."""
    (xmin, ymin), (xmax, ymax) = bbox
    dy = h * np.sqrt(3) / 2
    rows = int(np.ceil((ymax - ymin) / dy)) + 1
    cols = int(np.ceil((xmax - xmin) / h)) + 2
    ys = ymin + dy * np.arange(rows)
    pts = []
    for r, y in enumerate(ys):
        offset = (h / 2) if (r % 2) else 0.0
        xs = xmin - h + offset + h * np.arange(cols + 1)
        pts.append(np.stack([xs, np.full_like(xs, y)], axis=1))
    return np.concatenate(pts, axis=0)


def _delaunay(pts: np.ndarray) -> np.ndarray:
    """Delaunay triangulation via the native C++ kernel, falling back to
    scipy/qhull."""
    from .. import native

    tris = native.delaunay(pts) if native.available() else None
    if tris is None:
        tris = spatial.Delaunay(pts).simplices
    return tris


def _contains(path_obj: Path, pts: np.ndarray, radius: float = 0.0) -> np.ndarray:
    if len(pts) == 0:
        return np.zeros(0, dtype=bool)
    return path_obj.contains_points(pts, radius=radius)


def _build_once(
    region_ring: np.ndarray,
    hole_rings: List[np.ndarray],
    feature_rings: List[np.ndarray],
    extra_points: Optional[np.ndarray],
    h: float,
    preserve_boundary: bool,
    smooth_rounds: int = 2,
) -> Tuple[np.ndarray, np.ndarray]:
    # 1. Fixed points: boundary ring + feature rings (+ extra points).
    if preserve_boundary:
        bring = ops.orient_ccw(region_ring)
    else:
        bring = _densify_ring(region_ring, h)
    fixed = [bring]
    for ring in hole_rings + feature_rings:
        fixed.append(_densify_ring(ring, h) if not preserve_boundary else ops.orient_ccw(ring))
    if extra_points is not None and len(extra_points):
        fixed.append(np.atleast_2d(extra_points))
    fixed_pts = ensure_unique(np.concatenate(fixed, axis=0))

    region_path = Path(np.concatenate([bring, bring[:1]], axis=0), closed=True)
    hole_paths = [
        Path(np.concatenate([ops.orient_ccw(hr), ops.orient_ccw(hr)[:1]]), closed=True)
        for hr in hole_rings
    ]

    # 2. Interior lattice, clipped to the region with a protective margin
    # around fixed points.
    bbox = (bring.min(axis=0), bring.max(axis=0))
    lattice = _hex_lattice(bbox, h)
    inside = _contains(region_path, lattice, radius=-0.1 * h)
    for hp in hole_paths:
        inside &= ~_contains(hp, lattice, radius=0.1 * h)
    lattice = lattice[inside]
    if len(lattice):
        tree = spatial.cKDTree(fixed_pts)
        d, _ = tree.query(lattice, k=1)
        lattice = lattice[d > 0.55 * h]

    points = np.concatenate([fixed_pts, lattice], axis=0)
    n_fixed = len(fixed_pts)

    def triangulate(pts):
        simplices = _delaunay(pts)
        cents = pts[simplices].mean(axis=1)
        keep = _contains(region_path, cents)
        for hp in hole_paths:
            keep &= ~_contains(hp, cents)
        # Drop degenerate slivers (collinear boundary runs produce
        # zero-area Delaunay triangles along straight edges).
        areas = np.abs(triangle_areas(pts, simplices))
        keep &= areas > 1e-9 * h * h
        # Quality filter for near-collinear slivers made of fixed
        # (boundary/feature) points only; removing them just lets the mesh
        # boundary pass through the collinear points.
        p = pts[simplices]
        emax2 = np.max(
            np.sum((p - np.roll(p, 1, axis=1)) ** 2, axis=-1), axis=1
        )
        quality = 2 * areas / np.maximum(emax2, 1e-300)
        all_fixed = np.all(simplices < n_fixed, axis=1)
        keep &= ~(all_fixed & (quality < 0.05))
        return simplices[keep]

    triangles = triangulate(points)
    # 3. Smooth the movable (lattice) points and re-triangulate.
    for _ in range(smooth_rounds):
        smoothed, _ = smooth_mesh(points, triangles, 2)
        smoothed[:n_fixed] = points[:n_fixed]
        points = smoothed
        triangles = triangulate(points)

    # Drop unused points (e.g. lattice points orphaned by filtering).
    used = np.unique(triangles.ravel())
    remap = -np.ones(len(points), dtype=np.int64)
    remap[used] = np.arange(len(used))
    points = points[used]
    triangles = remap[triangles]
    return points, triangles


def generate_mesh(
    poly_coords: np.ndarray,
    hole_coords: Optional[List[np.ndarray]] = None,
    min_points: Optional[int] = None,
    max_edge_length: Optional[float] = None,
    convex_hull: bool = False,
    boundary: Optional[np.ndarray] = None,
    preserve_boundary: bool = False,
    min_angle: float = 32.5,
    feature_rings: Optional[Sequence[np.ndarray]] = None,
    extra_points: Optional[np.ndarray] = None,
    smooth_rounds: int = 2,
    **kwargs,
) -> Tuple[np.ndarray, np.ndarray]:
    """Generates a boundary-conforming Delaunay mesh for a polygonal region.

    Args:
        poly_coords: Shape ``(n, 2)`` outer polygon coordinates.
        hole_coords: A list of hole boundary coordinate arrays. Triangles
            inside these rings are excluded from the mesh.
        min_points: Minimum number of vertices in the resulting mesh.
        max_edge_length: Maximum length of (interior, if
            ``preserve_boundary``) mesh edges.
        convex_hull: Mesh the entire convex hull of the polygon.
        boundary: Optional explicit outer boundary ring; when given,
            ``poly_coords`` (and ``feature_rings``) are treated as features
            that the mesh must conform to while ``boundary`` bounds the
            meshed region.
        preserve_boundary: Do not add vertices to the boundary (mandatory for
            films with transport terminals).
        min_angle: Accepted for API parity with the reference
            (``superscreen/device/utils.py:44``); mesh quality here is
            controlled by lattice + smoothing instead.
        feature_rings: Additional polygon outlines the mesh must conform to
            (their interiors are meshed).
        extra_points: Additional isolated vertices to include.
        smooth_rounds: Rounds of (smooth + re-triangulate) per build.

    Returns:
        ``(points, triangles)``: vertex coordinates and triangle indices.
    """
    del min_angle, kwargs  # API-parity arguments; unused by this generator.
    poly_coords = ensure_unique(np.asarray(poly_coords, dtype=float))
    hole_rings = [
        ops.orient_ccw(ensure_unique(np.asarray(c, dtype=float)))
        for c in (hole_coords or [])
    ]
    feat_rings = [
        ops.orient_ccw(ensure_unique(np.asarray(c, dtype=float)))
        for c in (feature_rings or [])
    ]
    if convex_hull:
        if boundary is not None:
            raise ValueError(
                "Cannot have both boundary is not None and convex_hull = True."
            )
        hull = spatial.ConvexHull(poly_coords)
        region_ring = poly_coords[hull.vertices]
        feat_rings = [poly_coords] + feat_rings
    elif boundary is not None:
        region_ring = ops.orient_ccw(ensure_unique(np.asarray(boundary, dtype=float)))
        # Everything in poly_coords that is not the boundary is a feature.
        feat_rings = [poly_coords] + feat_rings
    else:
        region_ring = ops.orient_ccw(poly_coords)

    # Initial target edge length.
    ring_closed = np.concatenate([region_ring, region_ring[:1]], axis=0)
    seg_lengths = np.linalg.norm(np.diff(ring_closed, axis=0), axis=1)
    area = ops.polygon_area(region_ring)
    for hr in hole_rings:
        area -= ops.polygon_area(hr)
    h0 = float(np.median(seg_lengths))
    if max_edge_length is not None and max_edge_length > 0:
        h0 = min(h0, 0.95 * max_edge_length)
    if min_points:
        # Hexagonal lattice density ~ 2 / (sqrt(3) h^2) points per unit area.
        h_target = np.sqrt(2 * area / (np.sqrt(3) * min_points))
        h0 = min(h0, h_target)

    if min_points is None:
        min_points = 0
    if max_edge_length is None or max_edge_length <= 0:
        max_edge_length = np.inf

    h = h0
    for iteration in range(40):
        points, triangles = _build_once(
            region_ring,
            hole_rings,
            feat_rings,
            extra_points,
            h,
            preserve_boundary,
            smooth_rounds=smooth_rounds,
        )
        edges, is_boundary = get_edges(triangles)
        if preserve_boundary:
            interior_edges = edges[~is_boundary]
            if len(interior_edges) == 0:
                interior_edges = edges
            lengths = np.linalg.norm(
                np.diff(points[interior_edges], axis=1), axis=2
            )
        else:
            lengths = np.linalg.norm(np.diff(points[edges], axis=1), axis=2)
        max_length = float(lengths.max())
        logger.debug(
            "Mesh build %d: %d points, %d triangles, max edge %.3e "
            "(target %.3e).",
            iteration,
            len(points),
            len(triangles),
            max_length,
            max_edge_length,
        )
        if len(points) >= min_points and max_length <= max_edge_length:
            return points, triangles
        shrink = 0.8
        if np.isfinite(max_edge_length) and max_length > max_edge_length:
            shrink = min(shrink, 0.95 * max_edge_length / max_length)
        if min_points and len(points) < min_points:
            shrink = min(shrink, np.sqrt(len(points) / max(min_points, 1)) * 0.95)
        h *= max(shrink, 0.25)
    raise RuntimeError(
        "Mesh generation failed to satisfy min_points/max_edge_length "
        "constraints after 40 refinement iterations."
    )
