"""Dense device kernels (JAX/XLA).

TPU-native replacements for the numba kernels of the reference:

* ``q_matrix`` / ``Q_matrix``: the Brandt dipole kernel
  (reference ``superscreen/distance.py:87-115`` and
  ``superscreen/device/mesh.py:400-458``),
* inter-film / in-film Biot-Savart coupling
  (reference ``superscreen/solver/solve.py:28-73`` and
  ``solve_film.py:415-437``),
* terminal boundary effective field (``solve_film.py:393-412``),
* arbitrary-point sheet-current Biot-Savart
  (``superscreen/sources/current.py:13-110``).

All kernels are pure ``jnp`` functions evaluated in row blocks
(``lax.map`` over padded chunks) so peak memory is ``O(block * m)`` rather
than ``O(n * m)``, letting XLA pipeline HBM traffic on TPU.  They are
jit-friendly and may be vmapped (e.g. for position sweeps).
"""

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "cdist",
    "biot_savart_film_to_film_dz2",
    "q_matrix",
    "C_vector",
    "C_vector_masked",
    "Q_matrix",
    "q_apply",
    "Q_apply",
    "biot_savart_film_to_film",
    "biot_savart_within_film",
    "boundary_effective_field",
    "biot_savart_2d_field",
    "vector_potential_2d",
]

_ONE_OVER_4PI = 1 / (4 * np.pi)

# Default row-block size for O(n*m) pairwise kernels.
_BLOCK = 2048

#: Matmul precision for the pairwise-kernel contractions.  TPU MXU default
#: ("bfloat16", one pass) costs ~2e-3 relative error; "float32" (3-pass)
#: reaches ~1e-6 at a modest speed cost and is the default.  Override with
#: SUPERSCREEN_TPU_MATMUL_PRECISION=bfloat16 for maximum throughput.
MATMUL_PRECISION = os.environ.get(
    "SUPERSCREEN_TPU_MATMUL_PRECISION", "float32"
)


def _dot(a, b):
    return jnp.dot(a, b, precision=MATMUL_PRECISION)


def _blocked(fn, X, block: int):
    """Applies ``fn`` to row blocks of ``X`` via ``lax.map``, concatenating
    the results. ``X`` is padded to a multiple of ``block`` (extra rows are
    computed and discarded -- cheap and keeps shapes static)."""
    n = X.shape[0]
    if n <= block:
        return fn(X)
    n_blocks = -(-n // block)
    pad = n_blocks * block - n
    Xp = jnp.concatenate([X, jnp.zeros((pad,) + X.shape[1:], X.dtype)], axis=0)
    Xb = Xp.reshape((n_blocks, block) + X.shape[1:])
    out = jax.lax.map(fn, Xb)
    out = out.reshape((n_blocks * block,) + out.shape[2:])
    return out[:n]


@partial(jax.jit, static_argnames=("metric",))
def cdist(XA, XB, metric: str = "euclidean"):
    """Pairwise distances between two point sets (2D or 3D)."""
    XA = jnp.asarray(XA)
    XB = jnp.asarray(XB)
    d2 = jnp.sum((XA[:, None, :] - XB[None, :, :]) ** 2, axis=-1)
    if metric == "sqeuclidean":
        return d2
    if metric == "euclidean":
        return jnp.sqrt(d2)
    raise ValueError(
        f"Metric must be one of ('euclidean', 'sqeuclidean'), got {metric!r}."
    )


@partial(jax.jit, static_argnames=("dtype", "block"))
def _q_matrix_jnp(points, dtype=None, block: int = _BLOCK):
    points = jnp.asarray(points, dtype=dtype)
    n = points.shape[0]

    def row_block(P):
        d2 = jnp.sum((P[:, None, :] - points[None, :, :]) ** 2, axis=-1)
        r = jax.lax.rsqrt(jnp.where(d2 > 0, d2, 1.0))
        q = _ONE_OVER_4PI * r * r * r
        return jnp.where(d2 > 0, q, 0.0)

    return _blocked(row_block, points, block)[:, :n]


def q_matrix(points, dtype=None, block: int = _BLOCK):
    """The matrix ``q_ij = 1 / (4 pi |r_i - r_j|^3)`` with zero diagonal.

    Uses the tiled Pallas kernel on TPU (float32) and the blocked jnp
    kernel elsewhere.  Reference: ``superscreen/distance.py:87-115``.
    """
    out_dtype = jnp.asarray(points).dtype if dtype is None else jnp.dtype(dtype)
    if out_dtype == jnp.float32 and _pallas_ok(None):
        from . import pallas_kernels

        return pallas_kernels.pallas_q_matrix(points, dtype=dtype)
    return _q_matrix_jnp(points, dtype=dtype, block=block)


@partial(jax.jit, static_argnames=("dtype",))
def C_vector(points, dtype=None):
    """Brandt's boundary-regularization vector ``C_i`` (Eq. 12 of
    [Brandt-PRB-2005]; reference ``superscreen/device/mesh.py:400-432``)."""
    points = jnp.asarray(points, dtype=dtype)
    x = points[:, 0] - jnp.mean(points[:, 0])
    y = points[:, 1] - jnp.mean(points[:, 1])
    a = (jnp.max(x) - jnp.min(x)) / 2
    b = (jnp.max(y) - jnp.min(y)) / 2
    C = jnp.zeros_like(x)
    for p in (-1.0, 1.0):
        for q in (-1.0, 1.0):
            C = C + jnp.sqrt((a - p * x) ** -2 + (b - q * y) ** -2)
    C = jnp.where(jnp.isfinite(C), C, 1e30)
    return C * _ONE_OVER_4PI


@partial(jax.jit, static_argnames=("dtype",))
def C_vector_masked(points, mask, n_valid, dtype=None):
    """:func:`C_vector` over the first ``n_valid`` rows of a shape-padded
    point set: the statistics (centroid, bounding half-widths) are computed
    over ``mask``-selected rows only, so ONE compilation serves every film
    padded to a shared shape (the cold-start compile wall of per-film
    shapes otherwise dominates first-run factorization).  Entries at
    masked-out rows are unspecified.
    """
    points = jnp.asarray(points, dtype=dtype)
    dt = points.dtype
    mask = jnp.asarray(mask)
    nf = jnp.asarray(n_valid, dt)
    big = jnp.asarray(jnp.finfo(dt).max, dt)
    xs = points[:, 0]
    ys = points[:, 1]
    x = xs - jnp.sum(jnp.where(mask, xs, 0)) / nf
    y = ys - jnp.sum(jnp.where(mask, ys, 0)) / nf
    a = (jnp.max(jnp.where(mask, x, -big)) - jnp.min(jnp.where(mask, x, big))) / 2
    b = (jnp.max(jnp.where(mask, y, -big)) - jnp.min(jnp.where(mask, y, big))) / 2
    C = jnp.zeros_like(x)
    for p in (-1.0, 1.0):
        for q in (-1.0, 1.0):
            C = C + jnp.sqrt((a - p * x) ** -2 + (b - q * y) ** -2)
    C = jnp.where(jnp.isfinite(C), C, 1e30)
    return C * _ONE_OVER_4PI


def Q_matrix(points, weights, dtype=None, block: int = _BLOCK):
    """The Brandt kernel matrix ``Q`` (Eq. 10 of [Brandt-PRB-2005]):

    ``Q_ij = -q_ij`` off-diagonal and
    ``Q_ii = (C_i + sum_l q_il w_l) / w_i``.

    Reference: ``superscreen/device/mesh.py:434-458``.
    """
    points = jnp.asarray(points, dtype=dtype)
    weights = jnp.asarray(weights, dtype=points.dtype)
    q = q_matrix(points, dtype=points.dtype, block=block)
    return _q_to_Q(points, weights, q)


@jax.jit
def _q_to_Q(points, weights, q):
    n = points.shape[0]
    C = C_vector(points, dtype=points.dtype)
    diag = (C + _dot(q, weights)) / weights
    return jnp.where(jnp.eye(n, dtype=bool), diag[:, None], -q)


def _pallas_ok(use_pallas):
    """Whether to dispatch to the Pallas TPU kernels.

    ``None`` (auto): single-device TPU only -- under GSPMD with sharded
    operands a pallas_call cannot be partitioned.  Explicit ``True`` is
    used by the shard_map wrappers in :mod:`superscreen_tpu.parallel`,
    where each device runs the kernel on its local shard.
    """
    setting = os.environ.get("SUPERSCREEN_TPU_PALLAS_COUPLING", "auto")
    if setting == "0":
        return False
    from . import pallas_kernels

    if not pallas_kernels.pallas_available():
        return False
    if use_pallas is None:
        return setting == "force" or jax.device_count() == 1
    return bool(use_pallas)


@partial(jax.jit, static_argnames=("block", "use_pallas", "precision"))
def biot_savart_film_to_film_dz2(
    film1_sites, film1_areas, film1_J, film2_sites, dz2, block: int = _BLOCK,
    use_pallas=None, precision=None,
):
    """Like :func:`biot_savart_film_to_film` but with the squared layer
    separation ``dz2`` as a traced scalar, so one compilation serves every
    film pair of the same shapes.

    ``film1_J`` may be ``(n1, 2)`` (returns ``(n2,)``) or batched
    ``(B, n1, 2)`` (returns ``(B, n2)``).  The pairwise geometry tile is
    computed once and contracted against all ``B`` current columns as an
    MXU matmul, so the O(n1*n2) rsqrt work is amortized over the batch
    (the reference recomputes it per solve, ``solver/solve.py:28-73``).

    ``precision`` (e.g. ``"bf16x3"``) selects the Pallas tile-dot
    precision and is honored ONLY on the Pallas TPU path; the XLA
    fallback below (CPU/GPU backends, sharded operands, or non-f32
    inputs) always computes at the full default precision, silently.
    A/B comparisons of precision modes are therefore only meaningful on
    a single-device TPU, and a bf16x3-induced accuracy change can never
    manifest off-TPU.
    """
    film1_sites = jnp.asarray(film1_sites)
    film2_sites = jnp.asarray(film2_sites)
    J = jnp.asarray(film1_J)
    areas = jnp.asarray(film1_areas)
    dz2 = jnp.asarray(dz2)
    if (
        J.dtype == jnp.float32
        and film1_sites.dtype == jnp.float32
        and _pallas_ok(use_pallas)
    ):
        from . import pallas_kernels

        return pallas_kernels.pallas_biot_savart_batch(
            film1_sites, areas, J, film2_sites, dz2, precision=precision
        )
    squeeze = J.ndim == 2
    if squeeze:
        J = J[None]
    # (n1, B) current columns with areas folded in.
    aJx = (areas[None, :] * J[:, :, 0]).T
    aJy = (areas[None, :] * J[:, :, 1]).T

    def row_block(P):
        dx = P[:, 0:1] - film1_sites[None, :, 0]
        dy = P[:, 1:2] - film1_sites[None, :, 1]
        r = jax.lax.rsqrt(dx * dx + dy * dy + dz2)
        r3 = r * r * r
        return _dot(dy * r3, aJx) - _dot(dx * r3, aJy)  # (bi, B)

    out = _ONE_OVER_4PI * _blocked(row_block, film2_sites, block)  # (n2, B)
    out = out.T
    if squeeze:
        out = out[0]
    return out


@partial(jax.jit, static_argnames=("block", "use_pallas", "precision"))
def biot_savart_pair_dz2(
    film1_sites, film1_areas, film1_J,
    film2_sites, film2_areas, film2_J,
    dz2, block: int = _BLOCK, use_pallas=None, precision=None,
):
    """Both directions of an inter-film Biot-Savart coupling pair.

    Returns ``(field_at_2_from_1, field_at_1_from_2)``.  On TPU this runs
    the fused Pallas pair kernel, which computes each O(n1*n2) geometry
    tile ONCE and contracts it against both films' currents -- the
    reference (and the one-directional kernel) recompute the geometry per
    ordered pair (``solver/solve.py:28-73``), which is the dominant VPU
    cost of a coupling round.

    ``precision`` follows the same contract as
    :func:`biot_savart_film_to_film_dz2`: honored on the Pallas TPU
    paths only; the non-Pallas fallback always computes at full default
    precision regardless of the requested mode."""
    J1 = jnp.asarray(film1_J)
    # The fused kernel keeps the full-width reverse output (Bp x n1p f32)
    # resident in VMEM for the whole grid; gate on its footprint so large
    # batches / very large films fall back to two one-directional passes
    # instead of a scoped-VMEM OOM at compile time.
    #
    # OPT-IN (SUPERSCREEN_TPU_PAIR_COUPLING=1): measured on a v5e at the
    # 27k-site/film benchmark config (B=8), the fused kernel is ~12%
    # SLOWER per sweep than two one-directional passes (0.86 s vs 0.77 s
    # warm) -- the resident reverse output and the transposed dot_general
    # cost more than the halved geometry saves at these shapes.  Kept for
    # geometry-bound regimes (small B, large films) where the trade can
    # flip.
    B = 1 if J1.ndim == 2 else J1.shape[0]
    n1p = -(-jnp.asarray(film1_sites).shape[0] // 512) * 512
    resident_bytes = max(8, -(-B // 8) * 8) * n1p * 4
    if (
        J1.dtype == jnp.float32
        and jnp.asarray(film1_sites).dtype == jnp.float32
        and resident_bytes <= 2_000_000
        and os.environ.get("SUPERSCREEN_TPU_PAIR_COUPLING", "0") == "1"
        and _pallas_ok(use_pallas)
    ):
        from . import pallas_kernels

        return pallas_kernels.pallas_biot_savart_pair(
            film1_sites, film1_areas, film1_J,
            film2_sites, film2_areas, film2_J, dz2, precision=precision,
        )
    return (
        biot_savart_film_to_film_dz2(
            film1_sites, film1_areas, film1_J, film2_sites, dz2,
            block, use_pallas, precision,
        ),
        biot_savart_film_to_film_dz2(
            film2_sites, film2_areas, film2_J, film1_sites, dz2,
            block, use_pallas, precision,
        ),
    )


@partial(jax.jit, static_argnames=("block",))
def biot_savart_film_to_film(
    film1_sites,
    film1_z0: float,
    film1_areas,
    film1_J,
    film2_sites,
    film2_z0: float,
    block: int = _BLOCK,
):
    """Biot-Savart field at ``film2_sites`` (z = film2_z0) from sheet current
    ``film1_J`` flowing at ``film1_sites`` (z = film1_z0), in
    magnetization-like units ``current / length``.

    Reference: ``superscreen/solver/solve.py:28-73``.
    """
    film1_sites = jnp.asarray(film1_sites)
    dz2 = jnp.asarray(
        (film2_z0 - film1_z0) ** 2, dtype=film1_sites.dtype
    )
    return biot_savart_film_to_film_dz2(
        film1_sites, film1_areas, film1_J, film2_sites, dz2, block=block
    )


@partial(jax.jit, static_argnames=("block",))
def biot_savart_within_film(
    sites, tri_centroids, tri_areas, tri_J, block: int = _BLOCK
):
    """In-plane Biot-Savart self-field of a film from triangle-centroid
    current densities (used for films with transport terminals).

    Reference: ``superscreen/solver/solve_film.py:415-437``.
    """
    sites = jnp.asarray(sites)
    cent = jnp.asarray(tri_centroids)
    areas = jnp.asarray(tri_areas)
    J = jnp.asarray(tri_J)
    squeeze = J.ndim == 2
    if squeeze:
        J = J[None]
    # (m, B) current columns with areas folded in; geometry tiles are
    # contracted against all B columns at once (cf.
    # biot_savart_film_to_film_dz2).
    aJx = (areas[None, :] * J[:, :, 0]).T
    aJy = (areas[None, :] * J[:, :, 1]).T

    def row_block(P):
        dx = P[:, 0:1] - cent[None, :, 0]
        dy = P[:, 1:2] - cent[None, :, 1]
        r2 = dx * dx + dy * dy
        r = jax.lax.rsqrt(jnp.where(r2 > 0, r2, 1.0))
        r3 = jnp.where(r2 > 0, r * r * r, 0.0)
        return _dot(dy * r3, aJx) - _dot(dx * r3, aJy)

    out = _ONE_OVER_4PI * _blocked(row_block, sites, block)  # (n, B)
    out = out.T
    if squeeze:
        out = out[0]
    return out


@partial(jax.jit, static_argnames=("block",))
def boundary_effective_field(
    sites, boundary_centers, boundary_lengths, boundary_normals, boundary_stream,
    block: int = _BLOCK,
):
    """Effective field at mesh sites from the transport-current boundary
    stream (a line of dipoles along the film edge).

    Reference: ``superscreen/solver/solve_film.py:393-412``.
    """
    sites = jnp.asarray(sites)
    centers = jnp.asarray(boundary_centers)
    lengths = jnp.asarray(boundary_lengths)
    normals = jnp.asarray(boundary_normals)
    stream = jnp.asarray(boundary_stream)

    def row_block(P):
        dr = P[:, None, :] - centers[None, :, :]  # (b, m, 2)
        rinv = jax.lax.rsqrt(jnp.sum(dr * dr, axis=-1))
        r3inv = rinv * rinv * rinv
        dot = -jnp.sum(dr * normals[None, :, :], axis=-1)
        return jnp.sum(stream[None, :] * dot * lengths[None, :] * r3inv, axis=1)

    return _ONE_OVER_4PI * _blocked(row_block, sites, block)


@partial(jax.jit, static_argnames=("vector", "block"))
def biot_savart_2d_field(
    eval_positions,
    positions,
    current_densities,
    areas,
    vector: bool = True,
    block: int = _BLOCK,
):
    """Magnetic field (tesla) at 3D ``eval_positions`` from a sheet current.

    All inputs are SI (meters, A/m, m^2); unit conversion happens at the API
    boundary (:func:`superscreen_tpu.sources.biot_savart_2d`).

    Reference: ``superscreen/sources/current.py:13-110``.

    Args:
        eval_positions: ``(n, 3)`` evaluation coordinates in meters.
        positions: ``(m, 3)`` sheet coordinates in meters.
        current_densities: ``(m, 2)`` sheet current density in A/m.
        areas: ``(m,)`` effective vertex areas in m^2.
        vector: If True returns ``(n, 3)`` (Bx, By, Bz); else ``(n,)`` Bz.
    """
    mu_0 = 1.25663706212e-06
    eval_positions = jnp.asarray(eval_positions)
    positions = jnp.asarray(positions)
    J = jnp.asarray(current_densities)
    areas = jnp.asarray(areas)

    def row_block(P):
        d = P[:, None, :] - positions[None, :, :]  # (b, m, 3)
        r2 = jnp.sum(d * d, axis=-1)
        rinv = jax.lax.rsqrt(jnp.where(r2 > 0, r2, 1.0))
        r3 = jnp.where(r2 > 0, rinv * rinv * rinv, 0.0)
        pref = (mu_0 * _ONE_OVER_4PI) * areas[None, :] * r3
        Jx_dy = pref * J[None, :, 0] * d[:, :, 1]
        Jy_dx = pref * J[None, :, 1] * d[:, :, 0]
        Bz = jnp.sum(Jx_dy - Jy_dx, axis=1)
        if not vector:
            return Bz
        Jx_dz = pref * J[None, :, 0] * d[:, :, 2]
        Jy_dz = pref * J[None, :, 1] * d[:, :, 2]
        Bx = jnp.sum(Jy_dz, axis=1)
        By = -jnp.sum(Jx_dz, axis=1)
        return jnp.stack([Bx, By, Bz], axis=-1)

    return _blocked(row_block, eval_positions, block)


@partial(jax.jit, static_argnames=("block", "use_pallas"))
def q_apply(points, vecs, block: int = _BLOCK, use_pallas=None):
    """Matrix-free ``q @ vecs`` where ``q_ij = 1/(4 pi |r_i - r_j|^3)``
    (zero diagonal) is assembled tile-by-tile and never materialized.

    Peak memory is ``O(block * n)`` instead of ``O(n^2)`` -- this is the
    backbone of the large-mesh (low-memory) solve path.  On TPU/float32
    the Pallas kernel keeps geometry tiles in VMEM (the blocked jnp
    fallback materializes O(block*n) intermediates to HBM and is ~100x
    slower at 100k+ sites).

    Args:
        points: ``(n, 2)`` mesh sites.
        vecs: ``(n,)`` or ``(n, k)`` vectors to apply the kernel to.

    Returns:
        ``q @ vecs`` with the same trailing shape as ``vecs``.
    """
    points = jnp.asarray(points)
    if points.dtype == jnp.float32 and _pallas_ok(use_pallas):
        from . import pallas_kernels

        return pallas_kernels.pallas_q_apply_rect(points, points, vecs)
    V = jnp.asarray(vecs, dtype=points.dtype)
    squeeze = V.ndim == 1
    if squeeze:
        V = V[:, None]

    def row_block(P):
        d2 = jnp.sum((P[:, None, :] - points[None, :, :]) ** 2, axis=-1)
        r = jax.lax.rsqrt(jnp.where(d2 > 0, d2, 1.0))
        q = jnp.where(d2 > 0, _ONE_OVER_4PI * (r * r * r), 0.0)
        return _dot(q, V)

    out = _blocked(row_block, points, block)
    if squeeze:
        out = out[:, 0]
    return out


@partial(jax.jit, static_argnames=("block", "use_pallas"))
def q_apply_rect(eval_sites, src_sites, vecs, block: int = _BLOCK, use_pallas=None):
    """Matrix-free rectangular ``q @ vecs``: rows are ``eval_sites``,
    columns are ``src_sites`` (coincident points contribute zero, matching
    the zero diagonal of the square kernel).  Used by the row-sharded
    multi-chip self-field (:mod:`superscreen_tpu.parallel`)."""
    eval_sites = jnp.asarray(eval_sites)
    src_sites = jnp.asarray(src_sites)
    if eval_sites.dtype == jnp.float32 and _pallas_ok(use_pallas):
        from . import pallas_kernels

        return pallas_kernels.pallas_q_apply_rect(
            eval_sites, src_sites, vecs
        )
    V = jnp.asarray(vecs, dtype=eval_sites.dtype)
    squeeze = V.ndim == 1
    if squeeze:
        V = V[:, None]

    def row_block(P):
        d2 = jnp.sum((P[:, None, :] - src_sites[None, :, :]) ** 2, axis=-1)
        r = jax.lax.rsqrt(jnp.where(d2 > 0, d2, 1.0))
        q = jnp.where(d2 > 0, _ONE_OVER_4PI * (r * r * r), 0.0)
        return _dot(q, V)

    out = _blocked(row_block, eval_sites, block)
    if squeeze:
        out = out[:, 0]
    return out


@partial(jax.jit, static_argnames=("block",))
def Q_apply(points, weights, vecs, block: int = _BLOCK):
    """Matrix-free ``Q @ vecs`` for the full Brandt kernel
    ``Q_ij = -q_ij + delta_ij (C_i + sum_l q_il w_l) / w_i``, computed in one
    blocked pass (the row-sum ``q @ w`` rides along as an extra column).

    Args:
        points: ``(n, 2)`` mesh sites.
        weights: ``(n,)`` vertex areas.
        vecs: ``(n,)`` or ``(n, k)`` vectors.

    Returns:
        ``Q @ vecs``.
    """
    points = jnp.asarray(points)
    weights = jnp.asarray(weights, dtype=points.dtype)
    V = jnp.asarray(vecs, dtype=points.dtype)
    squeeze = V.ndim == 1
    if squeeze:
        V = V[:, None]
    stacked = jnp.concatenate([V, weights[:, None]], axis=1)
    qV = q_apply(points, stacked, block=block)
    q_row_w = qV[:, -1]
    qV = qV[:, :-1]
    C = C_vector(points, dtype=points.dtype)
    diag = (C + q_row_w) / weights
    out = -qV + diag[:, None] * V
    if squeeze:
        out = out[:, 0]
    return out


@partial(jax.jit, static_argnames=("block",))
def vector_potential_2d(
    eval_positions, eval_zs, positions, z0: float, areas, J,
    block: int = _BLOCK,
):
    """In-plane vector potential (Ax, Ay) of a sheet current:
    ``A(r) = 1/(4 pi) int J(r') / |r - r'| d^2r'`` (without the mu_0
    prefactor; units ``current``).

    Reference: ``superscreen/solution.py:833-934`` (dense cdist there).

    Args:
        eval_positions: ``(m, 2)`` evaluation coordinates.
        eval_zs: ``(m,)`` evaluation heights.
        positions: ``(n, 2)`` sheet coordinates.
        z0: Sheet height.
        areas: ``(n,)`` vertex areas.
        J: ``(n, 2)`` sheet current density.

    Returns:
        ``(m, 2)`` vector potential (times 4 pi / mu_0).
    """
    eval_positions = jnp.asarray(eval_positions)
    eval_zs = jnp.asarray(eval_zs)
    positions = jnp.asarray(positions)
    areas = jnp.asarray(areas)
    J = jnp.asarray(J)
    X = jnp.concatenate([eval_positions, eval_zs[:, None]], axis=1)

    def row_block(P):
        dx = P[:, 0:1] - positions[None, :, 0]
        dy = P[:, 1:2] - positions[None, :, 1]
        dz = P[:, 2:3] - z0
        r2 = dx * dx + dy * dy + dz * dz
        # An evaluation point coinciding with a mesh site (e.g. a contour
        # along a conforming feature ring of the same film) would divide by
        # zero; drop the self term, as q_matrix does with its diagonal (the
        # 1/r singularity is integrable, so the term's continuum weight is
        # zero).
        rinv = jnp.where(r2 > 0, jax.lax.rsqrt(jnp.where(r2 > 0, r2, 1.0)), 0.0)
        K = areas[None, :] * rinv  # (b, n)
        return _ONE_OVER_4PI * _dot(K, J)

    return _blocked(row_block, X, block)
