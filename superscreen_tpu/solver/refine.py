"""High-precision (float64-residual) solves on float32 hardware.

TPU matrix units compute in float32/bfloat16, so a stream function that is
assembled, factorized, and solved on device lands at the
``~cond(A) * eps_f32`` forward-error floor (measured ~1e-5 on typical Brandt
systems).  This module removes that floor WITHOUT any f64 device arithmetic,
using the classic mixed-precision scheme ("factorize in low precision,
compute residuals in high precision"):

* each film's linear system is assembled ONCE in float64 on the host
  (numpy) from the f64 mesh operators that the meshing layer already
  produces;
* every solve wraps the existing f32 device factorization as a
  *preconditioner* inside f64 iterative refinement.  Each step contracts the
  error by ``~cond(A) * eps_f32`` (1e-3..1e-5), so a handful of steps reach
  the ``~cond(A) * eps_f64`` floor -- far below the 1e-6 parity target --
  while ALL O(n^3) work stays on the TPU.

The refinement residual is one O(n^2) float64 host matvec per step,
negligible next to the device factorization; the f64 system costs
``8 * ni^2`` bytes of host RAM per film.

The same treatment is applied to the rest of the per-film pipeline so the
whole FilmSolution is f64-grade: hole effective fields, the current density
(sparse f64 gradient matvecs), the film self-field, and (in multi-film
solves) the inter-film Biot-Savart coupling all run in float64 on the host.

Capability beyond the reference: the reference package is float32 end to end
(``superscreen/device/device.py:57``); this mode delivers <=1e-6 relative
accuracy on stream functions and mutual inductances on f32-only accelerators.
"""

import logging
from dataclasses import dataclass, field
from typing import Callable, Dict, Optional

import numpy as np

logger = logging.getLogger("solve")

_ONE_OVER_4PI = 1.0 / (4 * np.pi)

#: Row-block size for the blocked O(n^2) host kernels (bounds peak memory
#: of the pairwise-distance intermediates to ``block * n`` floats).
_BLOCK = 2048


# ---------------------------------------------------------------------------
# Float64 host kernels (numpy analogs of ops/kernels.py)
# ---------------------------------------------------------------------------


def q_block64(rows_xy: np.ndarray, cols_xy: np.ndarray) -> np.ndarray:
    """One dense block of ``q_ij = 1/(4 pi |r_i - r_j|^3)`` in float64,
    with zeros at coincident points (the kernel's excluded diagonal)."""
    dx = rows_xy[:, None, 0] - cols_xy[None, :, 0]
    dy = rows_xy[:, None, 1] - cols_xy[None, :, 1]
    d2 = dx * dx + dy * dy
    out = np.zeros_like(d2)
    np.divide(_ONE_OVER_4PI, d2 * np.sqrt(d2), out=out, where=d2 > 0)
    return out


def C_vector64(sites: np.ndarray) -> np.ndarray:
    """Brandt's boundary-regularization vector ``C_i`` in float64
    (cf. :func:`superscreen_tpu.ops.kernels.C_vector`)."""
    sites = np.asarray(sites, dtype=np.float64)
    x = sites[:, 0] - sites[:, 0].mean()
    y = sites[:, 1] - sites[:, 1].mean()
    a = np.ptp(x) / 2
    b = np.ptp(y) / 2
    C = np.zeros_like(x)
    with np.errstate(divide="ignore"):
        for p in (-1.0, 1.0):
            for q in (-1.0, 1.0):
                C += np.sqrt((a - p * x) ** -2 + (b - q * y) ** -2)
    C[~np.isfinite(C)] = 1e30
    return C * _ONE_OVER_4PI


def q_row_sums64(sites: np.ndarray, weights: np.ndarray) -> np.ndarray:
    """``q @ weights`` (the Brandt-diagonal row sums) in float64, blocked."""
    sites = np.asarray(sites, dtype=np.float64)
    w = np.asarray(weights, dtype=np.float64)
    out = np.empty(len(sites), dtype=np.float64)
    for start in range(0, len(sites), _BLOCK):
        stop = min(start + _BLOCK, len(sites))
        out[start:stop] = q_block64(sites[start:stop], sites) @ w
    return out


def q_apply64(
    eval_sites: np.ndarray, src_sites: np.ndarray, vec: np.ndarray
) -> np.ndarray:
    """Matrix-free ``q @ vec`` in float64 (rows ``eval_sites``, columns
    ``src_sites``), blocked so the kernel is never materialized."""
    eval_sites = np.asarray(eval_sites, dtype=np.float64)
    src_sites = np.asarray(src_sites, dtype=np.float64)
    v = np.asarray(vec, dtype=np.float64)
    out = np.empty(len(eval_sites), dtype=np.float64)
    for start in range(0, len(eval_sites), _BLOCK):
        stop = min(start + _BLOCK, len(eval_sites))
        out[start:stop] = q_block64(eval_sites[start:stop], src_sites) @ v
    return out


def coo_matvec64(coo, x: np.ndarray) -> np.ndarray:
    """Sparse ``A @ x`` in float64 from a host COO operator (the mesh
    operators are built in f64 by :mod:`superscreen_tpu.ops.fem`)."""
    contrib = np.asarray(coo.vals, dtype=np.float64) * np.asarray(
        x, dtype=np.float64
    )[np.asarray(coo.cols)]
    return np.bincount(
        np.asarray(coo.rows), weights=contrib, minlength=coo.shape[0]
    )


def boundary_effective_field64(
    sites: np.ndarray,
    boundary_centers: np.ndarray,
    boundary_lengths: np.ndarray,
    boundary_normals: np.ndarray,
    boundary_stream: np.ndarray,
) -> np.ndarray:
    """Float64 host effective field of the transport-current boundary stream
    (cf. ``ops.kernels.boundary_effective_field``)."""
    sites = np.asarray(sites, dtype=np.float64)
    centers = np.asarray(boundary_centers, dtype=np.float64)
    coef = (
        np.asarray(boundary_stream, dtype=np.float64)
        * np.asarray(boundary_lengths, dtype=np.float64)
    )
    normals = np.asarray(boundary_normals, dtype=np.float64)
    out = np.empty(len(sites), dtype=np.float64)
    for start in range(0, len(sites), _BLOCK):
        stop = min(start + _BLOCK, len(sites))
        dr = sites[start:stop, None, :] - centers[None, :, :]
        r3inv = np.sum(dr * dr, axis=-1) ** -1.5
        dot = -np.sum(dr * normals[None, :, :], axis=-1)
        out[start:stop] = (dot * r3inv) @ coef
    return _ONE_OVER_4PI * out


def biot_savart_within_film64(
    sites: np.ndarray,
    tri_centroids: np.ndarray,
    tri_areas: np.ndarray,
    tri_J: np.ndarray,
) -> np.ndarray:
    """Float64 host in-plane Biot-Savart self-field from triangle-centroid
    current densities (cf. ``ops.kernels.biot_savart_within_film``)."""
    sites = np.asarray(sites, dtype=np.float64)
    cent = np.asarray(tri_centroids, dtype=np.float64)
    areas = np.asarray(tri_areas, dtype=np.float64)
    aJx = areas * np.asarray(tri_J[:, 0], dtype=np.float64)
    aJy = areas * np.asarray(tri_J[:, 1], dtype=np.float64)
    out = np.empty(len(sites), dtype=np.float64)
    for start in range(0, len(sites), _BLOCK):
        stop = min(start + _BLOCK, len(sites))
        dx = sites[start:stop, None, 0] - cent[None, :, 0]
        dy = sites[start:stop, None, 1] - cent[None, :, 1]
        r2 = dx * dx + dy * dy
        with np.errstate(divide="ignore"):
            r3inv = np.where(r2 > 0, r2, 1.0) ** -1.5
        r3inv[r2 <= 0] = 0.0
        out[start:stop] = (dy * r3inv) @ aJx - (dx * r3inv) @ aJy
    return _ONE_OVER_4PI * out


def biot_savart_film_to_film64(
    src_sites: np.ndarray,
    src_z0: float,
    src_areas: np.ndarray,
    src_J: np.ndarray,
    dst_sites: np.ndarray,
    dst_z0: float,
) -> np.ndarray:
    """Float64 host Biot-Savart field at ``dst_sites`` from the sheet
    current ``src_J`` (cf. ``ops.kernels.biot_savart_film_to_film``)."""
    src = np.asarray(src_sites, dtype=np.float64)
    dst = np.asarray(dst_sites, dtype=np.float64)
    aJx = np.asarray(src_areas, dtype=np.float64) * np.asarray(
        src_J[:, 0], dtype=np.float64
    )
    aJy = np.asarray(src_areas, dtype=np.float64) * np.asarray(
        src_J[:, 1], dtype=np.float64
    )
    dz2 = float(dst_z0 - src_z0) ** 2
    out = np.empty(len(dst), dtype=np.float64)
    for start in range(0, len(dst), _BLOCK):
        stop = min(start + _BLOCK, len(dst))
        dx = dst[start:stop, None, 0] - src[None, :, 0]
        dy = dst[start:stop, None, 1] - src[None, :, 1]
        r3 = (dx * dx + dy * dy + dz2) ** -1.5
        out[start:stop] = (dy * r3) @ aJx - (dx * r3) @ aJy
    return _ONE_OVER_4PI * out


# ---------------------------------------------------------------------------
# Float64 system assembly
# ---------------------------------------------------------------------------


@dataclass
class HighPrecisionSystem:
    """The float64 host side of one film's solve.

    Args:
        indices: The film-system (interior) mesh indices.
        A64: The interior system ``Q w - Lambda lap - grad(Lambda).grad``
            restricted to ``indices``, in float64, shape ``(ni, ni)``.
        hole_eff64: ``{hole_name: (n, n_hole)}`` float64 effective-field
            systems (all rows, hole columns).
        Lambda64: Effective penetration depth at all sites, float64, ``(n,)``.
        weights64: Vertex areas at all sites, float64, ``(n,)``.
        brandt_diag64: ``C + q @ w`` at all sites (the Brandt-kernel
            diagonal times ``w``), used for the matrix-free self-field.
        boundary_eff64: Terminal films only: the ``(n, n_boundary)``
            effective-field block of the boundary stream system.
        fwb_A64: Terminal films only: the float64 system over
            ``terminal_systems.film_without_boundary.indices``.
        fwboh_A64: Terminal films only: the float64 system over
            ``terminal_systems.film_without_boundary_or_holes.indices``
            (None when the film has no holes).
    """

    indices: np.ndarray
    A64: np.ndarray
    hole_eff64: Dict[str, np.ndarray]
    Lambda64: np.ndarray
    weights64: np.ndarray
    brandt_diag64: np.ndarray
    boundary_eff64: Optional[np.ndarray] = None
    fwb_A64: Optional[np.ndarray] = None
    fwboh_A64: Optional[np.ndarray] = None
    stats: Dict[str, float] = field(default_factory=dict)


def _grad_lambda_parts(mesh, Lambda64):
    """``(dLx, dLy, gx, gy)`` for the inhomogeneous ``grad(Lambda).grad``
    term, all float64 host (``dL = G @ Lambda`` at every site)."""
    gx = mesh.operators.gradient_x
    gy = mesh.operators.gradient_y
    dLx = coo_matvec64(gx, Lambda64)
    dLy = coo_matvec64(gy, Lambda64)
    return dLx, dLy, gx, gy


def _scatter_restricted(
    out: np.ndarray,
    coo,
    scale_rows: Optional[np.ndarray],
    col_scale: np.ndarray,
    row_pos: np.ndarray,
    col_pos: np.ndarray,
    sign: float,
) -> None:
    """Adds ``sign * diag(scale_rows) @ coo @ diag-ish(col_scale)`` entries
    restricted to mapped rows/cols into the dense block ``out``
    (``row_pos``/``col_pos`` map mesh index -> block position, -1 = drop)."""
    rows = np.asarray(coo.rows)
    cols = np.asarray(coo.cols)
    keep = (row_pos[rows] >= 0) & (col_pos[cols] >= 0)
    rows_k = rows[keep]
    cols_k = cols[keep]
    vals = np.asarray(coo.vals, dtype=np.float64)[keep] * col_scale[cols_k]
    if scale_rows is not None:
        vals = vals * scale_rows[rows_k]
    np.add.at(out, (row_pos[rows_k], col_pos[cols_k]), sign * vals)


def build_hp_system(
    device, film_info, film_system, terminal_systems=None
) -> HighPrecisionSystem:
    """Re-assembles one film's linear systems in float64 on the host.

    Follows the same formulas as the f32 device assembly
    (``solve_film._build_system_1d/2d``): the interior system
    ``A_ij = Q_ij w_j - Lambda_j L_ij - (grad Lambda . grad)_ij``, the
    per-hole effective-field blocks, and (for terminal films) the boundary
    and without-boundary(/holes) systems, built from the float64 mesh
    sites, vertex areas, and COO operators (which
    :mod:`superscreen_tpu.ops.fem` constructs in f64 before the solver
    casts them down).
    """
    import time

    from .utils import _depth_info

    t0 = time.perf_counter()
    mesh = device.meshes[film_info.name]
    sites = np.asarray(mesh.sites, dtype=np.float64)
    w = np.asarray(mesh.operators.weights, dtype=np.float64)
    layer = device.layers[film_info.layer]
    Lambda64 = np.asarray(
        _depth_info(layer, film_info.name, sites, "float64", device).Lambda[:, 0],
        dtype=np.float64,
    )
    n = len(sites)

    C = C_vector64(sites)
    q_w = q_row_sums64(sites, w)
    brandt_diag = C + q_w  # = Q_ii * w_i

    inhomogeneous = film_info.lambda_info.inhomogeneous
    if inhomogeneous:
        dLx, dLy, gx, gy = _grad_lambda_parts(mesh, Lambda64)

    lap = mesh.operators.laplacian
    all_pos = np.arange(n, dtype=np.int64)
    ones = np.ones(n)

    def square_block(ix):
        """The system restricted to rows and columns ``ix``."""
        ix = np.asarray(ix)
        k = len(ix)
        out = -q_block64(sites[ix], sites[ix]) * w[ix][None, :]
        out[np.arange(k), np.arange(k)] = brandt_diag[ix]
        pos = np.full(n, -1, dtype=np.int64)
        pos[ix] = np.arange(k)
        _scatter_restricted(out, lap, None, Lambda64, pos, pos, -1.0)
        if inhomogeneous:
            _scatter_restricted(out, gx, dLx, ones, pos, pos, -1.0)
            _scatter_restricted(out, gy, dLy, ones, pos, pos, -1.0)
        return out

    def column_block(ix):
        """The effective-field system: all rows, columns ``ix``."""
        ix = np.asarray(ix)
        k = len(ix)
        out = -q_block64(sites, sites[ix]) * w[ix][None, :]
        # Diagonal entries of Q land at rows ix (same site as the column).
        out[ix, np.arange(k)] = brandt_diag[ix]
        cpos = np.full(n, -1, dtype=np.int64)
        cpos[ix] = np.arange(k)
        _scatter_restricted(out, lap, None, Lambda64, all_pos, cpos, -1.0)
        if inhomogeneous:
            _scatter_restricted(out, gx, dLx, ones, all_pos, cpos, -1.0)
            _scatter_restricted(out, gy, dLy, ones, all_pos, cpos, -1.0)
        return out

    ix = np.asarray(film_system.indices)
    A64 = square_block(ix)
    hole_eff64 = {
        hole_name: column_block(ih)
        for hole_name, ih in film_info.hole_indices.items()
    }

    boundary_eff64 = fwb_A64 = fwboh_A64 = None
    if terminal_systems is not None:
        boundary_eff64 = column_block(terminal_systems.boundary.indices)
        fwb_ix = np.asarray(terminal_systems.film_without_boundary.indices)
        fwb_A64 = square_block(fwb_ix)
        fwboh = terminal_systems.film_without_boundary_or_holes
        if fwboh is not None:
            fwboh_ix = np.asarray(fwboh.indices)
            if fwboh_ix.shape == ix.shape and np.array_equal(fwboh_ix, ix):
                fwboh_A64 = A64  # same index set as the main film system
            else:
                fwboh_A64 = square_block(fwboh_ix)

    elapsed = time.perf_counter() - t0
    logger.info(
        f"Assembled float64 system for film {film_info.name!r} "
        f"(ni={len(ix)}, {8 * len(ix) ** 2 / 1e9:.2f} GB) in {elapsed:.1f}s."
    )
    return HighPrecisionSystem(
        indices=ix,
        A64=A64,
        hole_eff64=hole_eff64,
        Lambda64=Lambda64,
        weights64=w,
        brandt_diag64=brandt_diag,
        boundary_eff64=boundary_eff64,
        fwb_A64=fwb_A64,
        fwboh_A64=fwboh_A64,
        stats={"assembly_s": elapsed},
    )


def get_hp_systems(model) -> Dict[str, "HighPrecisionSystem"]:
    """The (lazily built, cached) float64 systems for every film of a
    :class:`FactorizedModel`."""
    cache = getattr(model, "_hp_systems", None)
    if cache is None:
        cache = {
            name: build_hp_system(
                model.device,
                info,
                model.film_systems[name],
                terminal_systems=model.terminal_systems.get(name),
            )
            for name, info in model.film_info.items()
        }
        model._hp_systems = cache
    return cache


# ---------------------------------------------------------------------------
# Mixed-precision iterative refinement
# ---------------------------------------------------------------------------


def refined_solve(
    A64: np.ndarray,
    precond: Callable[[np.ndarray], np.ndarray],
    h64: np.ndarray,
    rtol: float = 1e-12,
    max_steps: int = 20,
) -> np.ndarray:
    """Solves ``(-A) x = h`` to float64 accuracy given only a low-precision
    solver for the same system.

    ``precond(r)`` must return an approximate solution of ``(-A) x = r``
    (any dtype; typically the f32 device factorization).  Refinement
    iterates ``x += precond(h + A @ x)`` with the residual computed in
    float64, keeping the best iterate per column, and stops once the
    residual is below ``rtol * |h|`` or stops improving.
    """
    h64 = np.asarray(h64, dtype=np.float64)
    squeeze = h64.ndim == 1
    H = h64[:, None] if squeeze else h64
    href = np.maximum(np.linalg.norm(H, axis=0), np.finfo(np.float64).tiny)

    x = np.asarray(precond(H), dtype=np.float64)
    r = H + A64 @ x
    best_x = x
    best_r = np.linalg.norm(r, axis=0)
    for _ in range(max_steps):
        if np.all(best_r <= rtol * href):
            break
        x = x + np.asarray(precond(r), dtype=np.float64)
        r = H + A64 @ x
        rn = np.linalg.norm(r, axis=0)
        improved = rn < best_r
        if not improved.any():
            break
        best_x = np.where(improved[None, :], x, best_x)
        best_r = np.minimum(rn, best_r)
    worst = float(np.max(best_r / href))
    if worst > 1e-8:
        logger.warning(
            f"High-precision refinement stalled at relative residual "
            f"{worst:.3e}; the f32 preconditioner may be too inaccurate "
            f"for this system's conditioning."
        )
    return best_x[:, 0] if squeeze else best_x
