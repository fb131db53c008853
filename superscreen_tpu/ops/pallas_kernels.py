"""Pallas TPU kernels for the dense pairwise hot ops.

Two kernels carry almost all of the solver's O(n^2) work:

* ``pallas_q_matrix``: tiled assembly of the Brandt kernel
  ``q_ij = 1/(4 pi |r_i - r_j|^3)`` -- pure VPU work (rsqrt^3 per pair),
  written tile-by-tile so only (TM, TN) tiles live in VMEM.
* ``pallas_biot_savart_batch`` / ``pallas_q_apply_rect``: the pairwise
  geometry factors (e.g. ``K1 = a_j (y_i - y_j)/r^3``) are built per tile
  on the VPU and contracted against all batched vector columns on the
  **MXU** with the batch in sublanes -- turning the reference's numba
  loops (``superscreen/solver/solve.py:28-73``) into matmuls whose
  geometry never leaves VMEM.

Inputs are padded to tile multiples with zero-area dummy points (zero
contribution), so arbitrary mesh sizes are supported with static shapes.
Use is gated on the TPU backend; the blocked jnp kernels in
:mod:`superscreen_tpu.ops.kernels` are the portable fallback.
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

try:  # pragma: no cover - exercised on TPU
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    PALLAS_AVAILABLE = True
except Exception:  # pragma: no cover
    PALLAS_AVAILABLE = False

__all__ = [
    "pallas_available",
    "pallas_q_matrix",
    "pallas_biot_savart_batch",
    "pallas_biot_savart_pair",
    "pallas_q_apply_rect",
]

_ONE_OVER_4PI = 1 / (4 * np.pi)

#: Dot precision inside the pairwise-coupling kernels.  On TPUs without a
#: native f32 MXU (v4/v5e/...), an f32 dot is emulated by bf16 passes:
#: "highest" = 6 passes (full f32), "high" = 3 passes (~1e-7 relative --
#: each operand split hi+lo bf16), "default" = 1 bf16 pass (~4e-3).  The
#: contraction batch is B sweep points in sublanes (1/16 MXU utilization at
#: B=8), so pass count is the dominant per-tile cost -- see
#: docs/COUPLING.md for the v5e measurement that picked the default.
_PRECISION_NAMES = {
    "highest": jax.lax.Precision.HIGHEST,
    "default": jax.lax.Precision.DEFAULT,
    # Manual 3-pass emulation: Mosaic does not lower Precision.HIGH, so
    # the split-operand scheme is spelled out in the kernel (_tile_dot).
    "bf16x3": "bf16x3",
}


def _resolve_precision(name):
    if name is None:
        name = os.environ.get("SUPERSCREEN_TPU_COUPLING_PRECISION", "highest")
    if name not in _PRECISION_NAMES:
        raise ValueError(
            f"unknown coupling precision {name!r}; "
            f"expected one of {sorted(_PRECISION_NAMES)}"
        )
    return name


def _split_bf16(x):
    """Splits f32 ``x`` into (hi, lo) bf16 limbs with hi + lo capturing the
    top ~16 mantissa bits."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _tile_dot(a, b, precision, transpose_b=False):
    """In-kernel (B, K) x (K, M) contraction at the requested precision.

    ``precision`` is a resolved ``jax.lax.Precision`` or the string
    ``"bf16x3"``: v5e-class MXUs multiply bf16 natively and emulate an f32
    dot by bf16 passes (HIGHEST = 6).  The bf16x3 scheme splits both
    operands into hi+lo bf16 limbs and drops the lo*lo term (~2^-32
    relative -- far below the f32 accumulation floor), recovering ~17-bit
    operand precision in 3 native passes: 2x fewer MXU passes than
    HIGHEST for a per-element relative error of ~2^-17 instead of ~2^-24,
    which accumulates to ~1e-6-class error on 27k-point coupling sums
    (measured; see docs/COUPLING.md).  With ``transpose_b`` the
    contraction runs over ``b``'s LAST axis (``(B, K) x (M, K) -> (B,
    M)``) so callers never materialize a transposed tile.
    """
    contract = (((1,), (1 if transpose_b else 0,)), ((), ()))

    def _dot(x, y):
        return jax.lax.dot_general(
            x, y, contract,
            preferred_element_type=jnp.float32,
            precision=(
                jax.lax.Precision.DEFAULT if precision == "bf16x3"
                else precision
            ),
        )

    if precision != "bf16x3":
        return _dot(a, b)
    a_hi, a_lo = _split_bf16(a)
    b_hi, b_lo = _split_bf16(b)
    return _dot(a_hi, b_hi) + _dot(a_hi, b_lo) + _dot(a_lo, b_hi)


def pallas_available() -> bool:
    """True if Pallas TPU kernels can be used on the default backend."""
    return PALLAS_AVAILABLE and jax.default_backend() == "tpu"


def _pad_to(x, size, axis=0, value=0.0):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def _round_up(n, m):
    return ((n + m - 1) // m) * m


# ---------------------------------------------------------------------------
# q-matrix assembly
# ---------------------------------------------------------------------------


def _q_tile_kernel(xr_ref, yr_ref, xc_ref, yc_ref, out_ref):
    dx = xr_ref[:] - xc_ref[:]  # (TM, 1) - (1, TN) -> (TM, TN)
    dy = yr_ref[:] - yc_ref[:]
    d2 = dx * dx + dy * dy
    r = jax.lax.rsqrt(jnp.where(d2 > 0, d2, 1.0))
    out_ref[:] = jnp.where(d2 > 0, _ONE_OVER_4PI * (r * r * r), 0.0)


@functools.partial(jax.jit, static_argnames=("tm", "tn", "interpret"))
def _pallas_q_padded(x, y, tm: int, tn: int, interpret: bool = False):
    n = x.shape[0]
    xr = x.reshape(n, 1)
    yr = y.reshape(n, 1)
    xc = x.reshape(1, n)
    yc = y.reshape(1, n)
    grid = (n // tm, n // tn)
    return pl.pallas_call(
        _q_tile_kernel,
        out_shape=jax.ShapeDtypeStruct((n, n), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tm, tn), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(xr, yr, xc, yc)


def pallas_q_matrix(points, dtype=None, tm: int = 256, tn: int = 512, interpret: bool = False):
    """The matrix ``q_ij = 1/(4 pi |r_i - r_j|^3)`` with zero diagonal,
    assembled tile-by-tile on TPU.

    Args:
        points: ``(n, 2)`` mesh sites.
        dtype: Output dtype (defaults to the input dtype).
        tm, tn: Tile sizes (rows x cols).

    Returns:
        The ``(n, n)`` matrix (device array).
    """
    points = jnp.asarray(points, dtype=dtype)
    n = points.shape[0]
    npad = _round_up(n, int(np.lcm(tm, tn)))
    # Padded dummy points at distinct far-away coords so d2 > 0 off the
    # actual diagonal; padded entries are sliced off.
    scale = 1e6 * (jnp.max(jnp.abs(points)) + 1.0)
    pad_coords = scale * (1.0 + jnp.arange(npad - n, dtype=points.dtype))
    x = jnp.concatenate([points[:, 0], pad_coords])
    y = jnp.concatenate([points[:, 1], pad_coords])
    q = _pallas_q_padded(x, y, tm, tn, interpret)
    return q[:n, :n]


# ---------------------------------------------------------------------------
# Batched inter-film Biot-Savart, batch in sublanes (small-B fast path)
# ---------------------------------------------------------------------------


def _bs_T_tile_kernel(
    xs_ref, ys_ref, xe_ref, ye_ref, ajx_ref, ajy_ref, dz2_ref, out_ref,
    *, precision,
):
    # xs/ys: (TN, 1) source coords; xe/ye: (1, TM) eval coords;
    # ajx/ajy: (B, TN) area-weighted currents; out: (B, TM).
    # The geometry tile K = f(dx, dy, r3) of shape (TN, TM) never leaves
    # VMEM -- it is built on the VPU and immediately contracted on the MXU
    # as (B, TN) @ (TN, TM).  With the batch in sublanes (B is typically
    # 8-64), the MXU cost is negligible and the kernel runs at VPU
    # (geometry) speed, with no HBM round-trip for the dot operands.
    j = pl.program_id(1)
    dx = xe_ref[:] - xs_ref[:]  # (TN, TM)
    dy = ye_ref[:] - ys_ref[:]
    r = jax.lax.rsqrt(dx * dx + dy * dy + dz2_ref[0, 0])
    r3 = r * r * r
    contrib = _tile_dot(ajx_ref[:], dy * r3, precision) - _tile_dot(
        ajy_ref[:], dx * r3, precision
    )

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += contrib


@functools.partial(
    jax.jit, static_argnames=("tm", "tn", "interpret", "precision_name")
)
def _pallas_bs_T_padded(
    xs, ys, xe, ye, aJx, aJy, dz2, tm: int, tn: int,
    interpret: bool = False, precision_name: str = "highest",
):
    n_src = xs.shape[0]
    n_eval = xe.shape[1]
    B = aJx.shape[0]
    grid = (n_eval // tm, n_src // tn)
    return pl.pallas_call(
        functools.partial(
            _bs_T_tile_kernel,
            precision=_PRECISION_NAMES[precision_name],
        ),
        out_shape=jax.ShapeDtypeStruct((B, n_eval), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tn, 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (B, tm), lambda i, j: (0, i), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(xs, ys, xe, ye, aJx, aJy, dz2)


def pallas_biot_savart_batch(
    film1_sites,
    film1_areas,
    film1_J,
    film2_sites,
    dz2,
    tm: int = 1024,
    tn: int = 512,
    interpret: bool = False,
    precision: str = None,
):
    """Batched inter-film Biot-Savart with the sweep batch in MXU sublanes.

    The batch axis lives in MXU sublanes (padded to 8, not 128 lanes), so
    small sweep batches pay no padding waste.  ``dz2`` is a traced scalar,
    so one compilation serves every film pair of the same shapes.

    Args:
        film1_sites: ``(n1, 2)`` source sites (float32).
        film1_areas: ``(n1,)`` source vertex areas.
        film1_J: ``(B, n1, 2)`` or ``(n1, 2)`` sheet current density.
        film2_sites: ``(n2, 2)`` evaluation sites.
        dz2: Squared layer separation (traced scalar).

    Returns:
        ``(B, n2)`` (or ``(n2,)`` for unbatched input) field in
        ``current / length`` units.
    """
    film1_sites = jnp.asarray(film1_sites, dtype=jnp.float32)
    film2_sites = jnp.asarray(film2_sites, dtype=jnp.float32)
    J = jnp.asarray(film1_J, dtype=jnp.float32)
    squeeze = J.ndim == 2
    if squeeze:
        J = J[None]
    B = J.shape[0]
    areas = jnp.asarray(film1_areas, dtype=jnp.float32)
    n1 = film1_sites.shape[0]
    n2 = film2_sites.shape[0]
    n1p = _round_up(n1, tn)
    n2p = _round_up(n2, tm)
    Bp = _round_up(B, 8)
    # Padded source points far away (r > 0 against any eval point); their
    # area-weighted currents are zero-padded, so they contribute nothing.
    scale = 1e6 * (
        jnp.max(jnp.abs(film1_sites)) + jnp.max(jnp.abs(film2_sites)) + 1.0
    )
    xs = jnp.concatenate(
        [film1_sites[:, 0], scale * (1.0 + jnp.arange(n1p - n1))]
    ).reshape(n1p, 1)
    ys = jnp.concatenate(
        [film1_sites[:, 1], scale * (1.0 + jnp.arange(n1p - n1))]
    ).reshape(n1p, 1)
    xe = _pad_to(film2_sites[:, 0], n2p).reshape(1, n2p)
    ye = _pad_to(film2_sites[:, 1], n2p).reshape(1, n2p)
    aJ = areas[None, :, None] * J  # (B, n1, 2)
    aJx = _pad_to(_pad_to(aJ[:, :, 0], n1p, axis=1), Bp, axis=0)
    aJy = _pad_to(_pad_to(aJ[:, :, 1], n1p, axis=1), Bp, axis=0)
    dz2 = jnp.asarray(dz2, dtype=jnp.float32).reshape(1, 1)
    out = _pallas_bs_T_padded(
        xs, ys, xe, ye, aJx, aJy, dz2, tm, tn, interpret,
        _resolve_precision(precision),
    )
    out = _ONE_OVER_4PI * out[:B, :n2]
    if squeeze:
        out = out[0]
    return out


# ---------------------------------------------------------------------------
# Fused unordered-pair Biot-Savart: both coupling directions from ONE
# geometry pass
# ---------------------------------------------------------------------------


def _bs_pair_tile_kernel(
    xs_ref, ys_ref, xe_ref, ye_ref,
    aj1x_ref, aj1y_ref, aj2x_ref, aj2y_ref, dz2_ref,
    out2_ref, out1_ref,
    *, precision,
):
    # One (TN src x TM dst) geometry tile serves BOTH directions of the
    # film pair: the forward contraction (film-1 currents -> field at
    # film-2 sites) uses the tile as-is; the reverse direction needs the
    # transposed tile with flipped displacement signs (dx_rev = -dx^T,
    # r3 symmetric), expressed as a dot_general over the TM axis so the
    # tile is never materialized transposed.  This halves the VPU
    # geometry work of the coupling round (the reference recomputes the
    # pairwise geometry once per ordered pair, ``solver/solve.py:28-73``).
    #
    # out2 ((B, TM) blocks, accumulated over j) is the field at film-2
    # sites.  out1 is written as PARTIAL sums -- one (B, TN) block per
    # grid step, each visited exactly once -- and reduced over the
    # film-2-tile axis outside the kernel: a VMEM-resident full-width
    # accumulator was measured ~12% slower (and within 1 MB of the 16 MB
    # scoped-VMEM limit), while the partial-sum HBM traffic is only
    # ~(n2/TM) * B * n1 * 4 bytes (~24 MB at the benchmark config).
    j = pl.program_id(1)
    dx = xe_ref[:] - xs_ref[:]  # (TN, TM)
    dy = ye_ref[:] - ys_ref[:]
    r = jax.lax.rsqrt(dx * dx + dy * dy + dz2_ref[0, 0])
    r3 = r * r * r
    Kx = dx * r3
    Ky = dy * r3
    fwd = _tile_dot(aj1x_ref[:], Ky, precision) - _tile_dot(
        aj1y_ref[:], Kx, precision
    )

    @pl.when(j == 0)
    def _():
        out2_ref[:] = jnp.zeros_like(out2_ref)

    out2_ref[:] += fwd

    # Reverse: contrib[b, s] = sum_d aj2y[b, d] Kx[s, d] - aj2x[b, d] Ky[s, d]
    out1_ref[0] = _tile_dot(
        aj2y_ref[:], Kx, precision, transpose_b=True
    ) - _tile_dot(aj2x_ref[:], Ky, precision, transpose_b=True)


@functools.partial(
    jax.jit, static_argnames=("tm", "tn", "interpret", "precision_name")
)
def _pallas_bs_pair_padded(
    xs, ys, xe, ye, aJ1x, aJ1y, aJ2x, aJ2y, dz2, tm: int, tn: int,
    interpret: bool = False, precision_name: str = "highest",
):
    n1 = xs.shape[0]
    n2 = xe.shape[1]
    B = aJ1x.shape[0]
    grid = (n2 // tm, n1 // tn)
    out2, out1_partial = pl.pallas_call(
        functools.partial(
            _bs_pair_tile_kernel,
            precision=_PRECISION_NAMES[precision_name],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, n2), jnp.float32),
            jax.ShapeDtypeStruct((grid[0], B, n1), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tn, 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, tm), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, tm), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((B, tm), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, B, tn), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
            ),
        ),
        interpret=interpret,
    )(xs, ys, xe, ye, aJ1x, aJ1y, aJ2x, aJ2y, dz2)
    return out2, jnp.sum(out1_partial, axis=0)


def pallas_biot_savart_pair(
    film1_sites,
    film1_areas,
    film1_J,
    film2_sites,
    film2_areas,
    film2_J,
    dz2,
    tm: int = None,
    tn: int = None,
    interpret: bool = False,
    precision: str = None,
):
    """Both directions of an inter-film Biot-Savart coupling pair from one
    geometry pass.

    Default tiles are (512, 512) (env SUPERSCREEN_TPU_PAIR_TM/TN): the
    kernel keeps ~6 geometry temporaries of (tn, tm) f32 in VMEM, and the
    16 MB scoped-VMEM limit binds at larger shapes.

    Returns ``(field_at_2_from_1, field_at_1_from_2)``, each ``(B, n)``
    (or ``(n,)`` for unbatched input) in ``current / length`` units.  The
    pairwise geometry tile (the VPU-bound part of the coupling round) is
    computed ONCE and contracted against both films' currents -- ~2x less
    VPU work than two `pallas_biot_savart_batch` calls.
    """
    import os

    if tm is None:
        tm = int(os.environ.get("SUPERSCREEN_TPU_PAIR_TM", "512"))
    if tn is None:
        tn = int(os.environ.get("SUPERSCREEN_TPU_PAIR_TN", "512"))
    film1_sites = jnp.asarray(film1_sites, dtype=jnp.float32)
    film2_sites = jnp.asarray(film2_sites, dtype=jnp.float32)
    J1 = jnp.asarray(film1_J, dtype=jnp.float32)
    J2 = jnp.asarray(film2_J, dtype=jnp.float32)
    squeeze = J1.ndim == 2
    if squeeze:
        J1, J2 = J1[None], J2[None]
    B = J1.shape[0]
    a1 = jnp.asarray(film1_areas, dtype=jnp.float32)
    a2 = jnp.asarray(film2_areas, dtype=jnp.float32)
    n1 = film1_sites.shape[0]
    n2 = film2_sites.shape[0]
    n1p = _round_up(n1, tn)
    n2p = _round_up(n2, tm)
    Bp = _round_up(B, 8)
    # BOTH paddings sit far away (opposite signs so they never coincide
    # with each other): padded rows carry zero current, but a zero-distance
    # pair would still produce inf * 0 = NaN in the opposite direction's
    # accumulation, so padded coordinates must keep r > 0 against every
    # real and padded point.
    scale = 1e6 * (
        jnp.max(jnp.abs(film1_sites)) + jnp.max(jnp.abs(film2_sites)) + 1.0
    )
    pad1 = scale * (1.0 + jnp.arange(n1p - n1))
    pad2 = -scale * (1.0 + jnp.arange(n2p - n2))
    xs = jnp.concatenate([film1_sites[:, 0], pad1]).reshape(n1p, 1)
    ys = jnp.concatenate([film1_sites[:, 1], pad1]).reshape(n1p, 1)
    xe = jnp.concatenate([film2_sites[:, 0], pad2]).reshape(1, n2p)
    ye = jnp.concatenate([film2_sites[:, 1], pad2]).reshape(1, n2p)
    aJ1 = a1[None, :, None] * J1
    aJ2 = a2[None, :, None] * J2
    aJ1x = _pad_to(_pad_to(aJ1[:, :, 0], n1p, axis=1), Bp, axis=0)
    aJ1y = _pad_to(_pad_to(aJ1[:, :, 1], n1p, axis=1), Bp, axis=0)
    aJ2x = _pad_to(_pad_to(aJ2[:, :, 0], n2p, axis=1), Bp, axis=0)
    aJ2y = _pad_to(_pad_to(aJ2[:, :, 1], n2p, axis=1), Bp, axis=0)
    dz2 = jnp.asarray(dz2, dtype=jnp.float32).reshape(1, 1)
    out2, out1 = _pallas_bs_pair_padded(
        xs, ys, xe, ye, aJ1x, aJ1y, aJ2x, aJ2y, dz2, tm, tn, interpret,
        _resolve_precision(precision),
    )
    out2 = _ONE_OVER_4PI * out2[:B, :n2]
    out1 = _ONE_OVER_4PI * out1[:B, :n1]
    if squeeze:
        out2, out1 = out2[0], out1[0]
    return out2, out1


# ---------------------------------------------------------------------------
# Matrix-free q-kernel application (rectangular), batch in sublanes
# ---------------------------------------------------------------------------


def _q_apply_tile_kernel(
    xs_ref, ys_ref, xe_ref, ye_ref, vT_ref, out_ref, *, precision
):
    # xs/ys: (TN, 1) source coords; xe/ye: (1, TM) eval coords;
    # vT: (K, TN) vector columns; out: (K, TM).
    # K tile = q(eval, src) built in VMEM (zero at coincident points,
    # matching the square kernel's zero diagonal) and contracted on the
    # MXU -- the O(n^2) geometry never touches HBM (the blocked jnp
    # version is ~100x slower at 100k+ sites from materialized
    # intermediates).
    j = pl.program_id(1)
    dx = xe_ref[:] - xs_ref[:]  # (TN, TM)
    dy = ye_ref[:] - ys_ref[:]
    d2 = dx * dx + dy * dy
    r = jax.lax.rsqrt(jnp.where(d2 > 0, d2, 1.0))
    q = jnp.where(d2 > 0, r * r * r, 0.0)
    contrib = _tile_dot(vT_ref[:], q, precision)

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += contrib


@functools.partial(
    jax.jit, static_argnames=("tm", "tn", "interpret", "precision_name")
)
def _pallas_q_apply_padded(
    xs, ys, xe, ye, vT, tm: int, tn: int,
    interpret: bool = False, precision_name: str = "highest",
):
    n_src = xs.shape[0]
    n_eval = xe.shape[1]
    K = vT.shape[0]
    grid = (n_eval // tm, n_src // tn)
    return pl.pallas_call(
        functools.partial(
            _q_apply_tile_kernel,
            precision=_PRECISION_NAMES[precision_name],
        ),
        out_shape=jax.ShapeDtypeStruct((K, n_eval), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tn, 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tm), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, tn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (K, tm), lambda i, j: (0, i), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(xs, ys, xe, ye, vT)


def pallas_q_apply_rect(
    eval_sites, src_sites, vecs, tm: int = 1024, tn: int = 512,
    interpret: bool = False, precision: str = None,
):
    """Matrix-free ``q(eval, src) @ vecs`` on TPU (float32), with the
    vector columns in MXU sublanes.

    Coincident eval/src points contribute zero (the square kernel's zero
    diagonal).  Returns ``(n_eval,)`` or ``(n_eval, k)`` matching ``vecs``;
    the result includes the ``1/(4 pi)`` prefactor.
    """
    eval_sites = jnp.asarray(eval_sites, dtype=jnp.float32)
    src_sites = jnp.asarray(src_sites, dtype=jnp.float32)
    V = jnp.asarray(vecs, dtype=jnp.float32)
    squeeze = V.ndim == 1
    if squeeze:
        V = V[:, None]
    k = V.shape[1]
    n_src = src_sites.shape[0]
    n_eval = eval_sites.shape[0]
    n_src_p = _round_up(n_src, tn)
    n_eval_p = _round_up(n_eval, tm)
    k_p = _round_up(k, 8)
    scale = 1e6 * (
        jnp.max(jnp.abs(src_sites)) + jnp.max(jnp.abs(eval_sites)) + 1.0
    )
    xs = jnp.concatenate(
        [src_sites[:, 0], scale * (1.0 + jnp.arange(n_src_p - n_src))]
    ).reshape(n_src_p, 1)
    ys = jnp.concatenate(
        [src_sites[:, 1], scale * (1.0 + jnp.arange(n_src_p - n_src))]
    ).reshape(n_src_p, 1)
    xe = _pad_to(eval_sites[:, 0], n_eval_p).reshape(1, n_eval_p)
    ye = _pad_to(eval_sites[:, 1], n_eval_p).reshape(1, n_eval_p)
    vT = _pad_to(_pad_to(V.T, n_src_p, axis=1), k_p, axis=0)
    out = _pallas_q_apply_padded(
        xs, ys, xe, ye, vT, tm, tn, interpret, _resolve_precision(precision)
    )
    out = _ONE_OVER_4PI * out[:k, :n_eval].T
    if squeeze:
        out = out[:, 0]
    return out
