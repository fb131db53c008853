"""Device-resident interpolation on triangular meshes.

Replaces the reference's host-side ``matplotlib.tri`` interpolators
(reference ``superscreen/solution.py:271-428``) with a JAX path:

* :class:`TriangleIndex` — a uniform-grid spatial index over the
  triangulation, built once on the host (numpy) and stored as device
  arrays with static shapes.
* :func:`locate` — jitted point location: candidate triangles come from the
  grid cell, the containing triangle is selected by maximum minimum
  barycentric coordinate (robust to points on edges/vertices).
* :func:`interp_linear` / :func:`interp_cubic` — barycentric interpolation
  of per-vertex scalar or vector data.  The cubic variant evaluates a
  Bezier triangle built from vertex values and vertex gradients (supplied
  by the mesh's AGS vertex-gradient operator), analogous in spirit to
  matplotlib's ``CubicTriInterpolator(kind="geom")``.

Query batches are padded to a small set of bucket sizes so repeated calls
with different point counts reuse compiled programs.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["TriangleIndex", "build_triangle_index", "interp_linear", "interp_cubic"]

# Barycentric tolerance: slightly negative coordinates are accepted so points
# sitting exactly on shared edges/vertices are never reported as outside.
_BARY_EPS = 1e-6


class TriangleIndex(NamedTuple):
    """Uniform-grid spatial index over a triangulation (device arrays)."""

    tri_verts: jax.Array  # (m, 3, 2) triangle vertex coordinates
    elements: jax.Array  # (m, 3) triangle -> site indices
    cell_tris: jax.Array  # (n_cells, K) candidate triangles per cell, -1 padded
    origin: jax.Array  # (2,) grid lower-left corner
    inv_step: jax.Array  # (2,) reciprocal cell size
    grid_dims: jax.Array  # (2,) int32 (ncx, ncy)


def build_triangle_index(sites: np.ndarray, elements: np.ndarray) -> TriangleIndex:
    """Build the spatial index on the host.

    The grid resolution targets ~1 triangle per cell; each cell stores every
    triangle whose bounding box overlaps it, padded to the maximum count K.
    """
    sites = np.asarray(sites, dtype=float)
    elements = np.asarray(elements, dtype=np.int32)
    tri_pts = sites[elements]  # (m, 3, 2)
    m = len(elements)
    lo = sites.min(axis=0)
    hi = sites.max(axis=0)
    span = np.maximum(hi - lo, 1e-30)
    # ncx * ncy ~= m, cells roughly square.
    ncx = max(1, int(round(np.sqrt(m * span[0] / span[1]))))
    ncy = max(1, int(round(np.sqrt(m * span[1] / span[0]))))
    step = span / (ncx, ncy)
    inv_step = 1.0 / step

    buckets = [[] for _ in range(ncx * ncy)]
    tri_lo = np.clip(((tri_pts.min(axis=1) - lo) * inv_step).astype(int), 0, (ncx - 1, ncy - 1))
    tri_hi = np.clip(((tri_pts.max(axis=1) - lo) * inv_step).astype(int), 0, (ncx - 1, ncy - 1))
    for t in range(m):
        for cx in range(tri_lo[t, 0], tri_hi[t, 0] + 1):
            for cy in range(tri_lo[t, 1], tri_hi[t, 1] + 1):
                buckets[cx * ncy + cy].append(t)
    K = max(1, max(len(b) for b in buckets))
    cell_tris = np.full((ncx * ncy, K), -1, dtype=np.int32)
    for i, b in enumerate(buckets):
        cell_tris[i, : len(b)] = b

    return TriangleIndex(
        tri_verts=jnp.asarray(tri_pts),
        elements=jnp.asarray(elements),
        cell_tris=jnp.asarray(cell_tris),
        origin=jnp.asarray(lo),
        inv_step=jnp.asarray(inv_step),
        grid_dims=jnp.asarray([ncx, ncy], dtype=jnp.int32),
    )


@jax.jit
def locate(index: TriangleIndex, points: jax.Array):
    """Find the containing triangle and barycentric coordinates per point.

    Returns ``(tri, bary, found)`` with shapes ``(k,)``, ``(k, 3)``, ``(k,)``;
    ``tri`` is clipped to a valid index even where ``found`` is False.
    """
    pts = jnp.atleast_2d(points)
    ncx, ncy = index.grid_dims[0], index.grid_dims[1]
    cell = jnp.floor((pts - index.origin) * index.inv_step).astype(jnp.int32)
    cell = jnp.clip(cell, 0, jnp.stack([ncx - 1, ncy - 1]))
    candidates = index.cell_tris[cell[:, 0] * ncy + cell[:, 1]]  # (k, K)
    safe = jnp.maximum(candidates, 0)
    corners = index.tri_verts[safe]  # (k, K, 3, 2)
    a, b, c = corners[:, :, 0], corners[:, :, 1], corners[:, :, 2]
    ab = b - a
    ac = c - a
    ap = pts[:, None, :] - a
    det = ab[..., 0] * ac[..., 1] - ab[..., 1] * ac[..., 0]
    inv_det = jnp.where(det == 0, 0.0, 1.0 / det)
    wb = (ap[..., 0] * ac[..., 1] - ap[..., 1] * ac[..., 0]) * inv_det
    wc = (ab[..., 0] * ap[..., 1] - ab[..., 1] * ap[..., 0]) * inv_det
    bary = jnp.stack([1.0 - wb - wc, wb, wc], axis=-1)  # (k, K, 3)
    score = jnp.where(
        (candidates >= 0) & (det != 0), bary.min(axis=-1), -jnp.inf
    )  # (k, K)
    best = jnp.argmax(score, axis=1)
    k_idx = jnp.arange(pts.shape[0])
    found = score[k_idx, best] >= -_BARY_EPS
    return safe[k_idx, best], bary[k_idx, best], found


def _pad_queries(points: np.ndarray):
    """Pad the query batch to a bucketed size to bound jit recompiles."""
    pts = np.atleast_2d(np.asarray(points, dtype=float))
    k = len(pts)
    padded = 8
    while padded < k:
        padded *= 2
    if padded > k:
        pts = np.concatenate([pts, np.tile(pts[-1:], (padded - k, 1))], axis=0)
    return pts, k


@partial(jax.jit, static_argnames=("fill",))
def _linear_eval(index, values, points, fill):
    tri, bary, found = locate(index, points)
    corner_vals = values[index.elements[tri]]  # (k, 3) or (k, 3, d)
    weights = bary if corner_vals.ndim == 2 else bary[..., None]
    out = (weights * corner_vals).sum(axis=1)
    mask = found if out.ndim == 1 else found[:, None]
    return jnp.where(mask, out, fill)


def interp_linear(index: TriangleIndex, values, points, fill=np.nan):
    """Barycentric-linear interpolation of per-vertex data at ``points``.

    ``values`` may be ``(n,)`` or ``(n, d)``; points outside the mesh get
    ``fill``.  Returns a device array of shape ``(k,)`` / ``(k, d)``.
    """
    pts, k = _pad_queries(points)
    return _linear_eval(index, jnp.asarray(values), jnp.asarray(pts), float(fill))[:k]


@partial(jax.jit, static_argnames=("fill",))
def _cubic_eval(index, values, gradients, points, fill):
    tri, bary, found = locate(index, points)
    idx = index.elements[tri]  # (k, 3)
    f = values[idx]  # (k, 3)
    g = gradients[idx]  # (k, 3, 2)
    corners = index.tri_verts[tri]  # (k, 3, 2)

    # Bezier-triangle control net from vertex values + gradients: the two
    # control points adjacent to each corner lie one third of the way along
    # each edge in the direction of the corner's gradient.
    def edge_ctrl(i, j):
        return f[:, i] + ((corners[:, j] - corners[:, i]) * g[:, i]).sum(-1) / 3.0

    b210, b201 = edge_ctrl(0, 1), edge_ctrl(0, 2)
    b120, b021 = edge_ctrl(1, 0), edge_ctrl(1, 2)
    b102, b012 = edge_ctrl(2, 0), edge_ctrl(2, 1)
    edge_mean = (b210 + b201 + b120 + b021 + b102 + b012) / 6.0
    vertex_mean = f.mean(axis=1)
    b111 = edge_mean + (edge_mean - vertex_mean) / 2.0

    u, v, w = bary[:, 0], bary[:, 1], bary[:, 2]
    out = (
        u**3 * f[:, 0]
        + v**3 * f[:, 1]
        + w**3 * f[:, 2]
        + 3 * u**2 * (v * b210 + w * b201)
        + 3 * v**2 * (u * b120 + w * b021)
        + 3 * w**2 * (u * b102 + v * b012)
        + 6 * u * v * w * b111
    )
    return jnp.where(found, out, fill)


def interp_cubic(index: TriangleIndex, values, gradients, points, fill=np.nan):
    """C1-style cubic interpolation of scalar per-vertex data.

    ``gradients`` is the ``(n, 2)`` per-vertex gradient of ``values``
    (typically from the mesh's vertex-gradient operator).
    """
    pts, k = _pad_queries(points)
    return _cubic_eval(
        index,
        jnp.asarray(values),
        jnp.asarray(gradients),
        jnp.asarray(pts),
        float(fill),
    )[:k]
