"""Batched parameter sweeps: the TPU-native replacement for running many
solver processes.

The reference package tells users to parallelize applied-field/position
sweeps by launching multiple Python processes (``docs/gotchas.rst:31-44``).
Here, a sweep over ``B`` parameter sets reuses one LU factorization and runs
as a **single jitted device computation**: the per-film linear solves become
one triangular solve with ``B`` stacked right-hand sides (MXU-friendly), the
hole/vortex contributions are rank-1 updates batched over ``B``, and the
multi-film self-consistent iterations batch the inter-film Biot-Savart
coupling.  The batch axis can additionally be sharded across a device mesh
(see :mod:`superscreen_tpu.parallel`).
"""

import logging
import os
from dataclasses import dataclass, field
from functools import partial
from typing import Callable, Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from .device import Device
from .ops import kernels
from .solution import FilmSolution, Solution, Vortex
from .solver.solve import FactorizedModel, factorize_model
from .solver.utils import field_conversion_factor
from .sources import ConstantField

logger = logging.getLogger("solve")

__all__ = ["solve_many", "SweepResult", "FilmSweepData"]


@dataclass
class FilmSweepData:
    """Static (sweep-independent) device arrays for one film.

    Registered as a JAX pytree (array fields are leaves; name/size/z0/hole
    names are static) so it can be passed into jitted sweep functions
    without baking the arrays in as compile-time constants."""

    name: str
    n: int
    interior: jnp.ndarray  # (nip,) interior indices (zero-padded)
    n_valid: jnp.ndarray  # () number of valid interior indices (traced)
    fac_kind: str  # "lu" or "chol" (static)
    fac_a: jnp.ndarray  # LU matrix or Cholesky factor L
    fac_b: jnp.ndarray  # LU pivots or the SPD column scaling w
    A: jnp.ndarray  # (ni, ni)
    Q: jnp.ndarray  # (n, n)
    weights: jnp.ndarray  # (n,)
    # Gather-form gradients: (n, d) column indices / weights with a fixed
    # per-row fan-in d (zero-weight padding).  The sweep hot loop applies
    # these as d gathers -- a segment-sum scatter of the COO triplets
    # serializes on TPU and measurably dominated the per-round solve cost.
    gx_idx: jnp.ndarray
    gx_w: jnp.ndarray
    gy_idx: jnp.ndarray
    gy_w: jnp.ndarray
    sites: jnp.ndarray  # (n, 2)
    z0: jnp.ndarray  # () layer height (traced so film pairs share compiles)
    hole_masks: jnp.ndarray  # (n_holes, n) 1.0 where site in hole
    hole_ha_vecs: jnp.ndarray  # (n_holes, n) effective-field vectors
    vortex_cols: Optional[jnp.ndarray]  # (ni, n_vortices) K columns
    vortex_scales: Optional[jnp.ndarray]  # (n_vortices,) 1 / w_j
    # Declared amplitudes: (n_vortices,) nPhi0, or (B, n_vortices) for a
    # per-sweep-point vortex-amplitude sweep (solve_many(vortex_nPhi0=...)).
    vortex_nphi0: Optional[jnp.ndarray] = None
    hole_names: Sequence[str] = field(default_factory=list)
    # Transport-terminal films (reference solve_film.py:308-437): fixed
    # stream/effective-field offsets from the terminal currents, plus the
    # triangle data for the in-film Biot-Savart self-field.
    terminal: bool = False
    # Transport offsets: (n,) fixed across the sweep, or (B, n) for a
    # per-sweep-point terminal-current sweep (solve_many(terminal_currents=
    # [...])) -- the bootstrap is linear in the drive, so per-point offsets
    # are combinations of per-terminal unit solutions.
    g_offset: Optional[jnp.ndarray] = None  # (n,) or (B, n) transport stream
    ha_offset: Optional[jnp.ndarray] = None  # (n,) or (B, n) boundary field
    tri_centroids: Optional[jnp.ndarray] = None  # (m, 2)
    tri_areas: Optional[jnp.ndarray] = None  # (m,)
    gtx_idx: Optional[jnp.ndarray] = None  # gather-form triangle gradients
    gtx_w: Optional[jnp.ndarray] = None
    gty_idx: Optional[jnp.ndarray] = None
    gty_w: Optional[jnp.ndarray] = None
    # Matrix-free CG films (fac_kind == "cg"): operator pieces for
    # ops.linalg.brandt_matvec / brandt_cg_solve.
    cg_op: Optional[dict] = None
    # Grid interpolation data for FFT-accelerated coupling (opt-in).
    fft_grid: Optional["object"] = None
    # (nip, 2) sites gathered at the padded interior indices: the inner
    # coupling rounds evaluate the pairwise field there directly (the
    # solve consumes nothing else); padded rows duplicate site 0 and are
    # masked out of the RHS.
    interior_sites: Optional[jnp.ndarray] = None


_FSD_ARRAY_FIELDS = (
    "interior", "n_valid", "fac_a", "fac_b", "A", "Q", "weights",
    "gx_idx", "gx_w", "gy_idx", "gy_w",
    "sites", "z0", "hole_masks", "hole_ha_vecs", "vortex_cols",
    "vortex_scales", "vortex_nphi0", "g_offset", "ha_offset",
    "tri_centroids", "tri_areas",
    "gtx_idx", "gtx_w", "gty_idx", "gty_w",
    "cg_op", "fft_grid", "interior_sites",
)
_FSD_STATIC_FIELDS = ("name", "n", "hole_names", "fac_kind", "terminal")


def _fsd_flatten(d: FilmSweepData):
    children = tuple(getattr(d, f) for f in _FSD_ARRAY_FIELDS)
    aux = tuple(getattr(d, f) for f in _FSD_STATIC_FIELDS)
    return children, aux


def _fsd_unflatten(aux, children):
    kwargs = dict(zip(_FSD_ARRAY_FIELDS, children))
    kwargs.update(dict(zip(_FSD_STATIC_FIELDS, aux)))
    return FilmSweepData(**kwargs)


jax.tree_util.register_pytree_node(FilmSweepData, _fsd_flatten, _fsd_unflatten)


def _film_sweep_data(model: FactorizedModel, film_name: str) -> FilmSweepData:
    device = model.device
    info = model.film_info[film_name]
    system = model.film_systems[film_name]
    mesh = device.meshes[film_name]
    n = len(mesh.sites)
    dtype = device.solve_dtype
    hole_names = list(info.hole_indices)
    hole_masks = np.zeros((len(hole_names), n), dtype=dtype)
    hole_ha = np.zeros((len(hole_names), n), dtype=dtype)
    for k, hole in enumerate(hole_names):
        idx = info.hole_indices[hole]
        hole_masks[k, idx] = 1.0
        # Effective field from unit circulating current in this hole:
        # -(A_hole @ 1) (already a vector in low-memory mode).
        A_hole = model.hole_systems[film_name][hole].A
        if np.ndim(A_hole) == 1:
            hole_ha[k] = -np.asarray(A_hole)
        else:
            # Precision-disciplined matvec: on TPU a plain `@` against a
            # device-resident A_hole lowers to a single bf16 MXU pass.
            from .solver.solve_film import _op_matvec

            hole_ha[k] = -np.asarray(
                _op_matvec(A_hole, np.ones(len(idx), dtype=dtype))
            )
    # Vortex response columns (fixed vortex positions across the sweep;
    # amplitudes may still vary per sweep point via vortex_nphi0).
    vortex_cols = vortex_scales = vortex_nphi0 = None
    if info.vortices:
        from .ops import linalg

        ni = len(system.indices)
        rhs_dtype = (
            system.A.dtype if system.A is not None else info.weights.dtype
        )
        rhs = np.zeros((ni, len(info.vortices)), dtype=rhs_dtype)
        # Solve dtype, NOT NumPy's default f64: under x64 mode a f64
        # amplitude would promote the whole solved stream to f64 and trip
        # the f32 scatter-add back into g0 (sweep.py:450).
        scales = np.zeros(len(info.vortices), dtype=dtype)
        nphi0 = np.zeros(len(info.vortices), dtype=dtype)
        points = mesh.sites
        for k, vortex in enumerate(info.vortices):
            xy = (vortex.x, vortex.y)
            j_film = int(
                np.argmin(np.linalg.norm(points[system.indices] - xy, axis=1))
            )
            j_device = int(np.argmin(np.linalg.norm(points - xy, axis=1)))
            rhs[j_film, k] = 1.0
            scales[k] = 1.0 / info.weights[j_device]
            nphi0[k] = vortex.nPhi0
        if system.A is not None:
            # Refined: vortex response columns feed physics outputs, and
            # the bf16 FACTOR_PRECISION default counts on refinement.
            vortex_cols = jnp.asarray(
                -linalg.lu_solve_refined(system.A, system.lu_piv, rhs)
            )
        else:
            vortex_cols = jnp.asarray(-linalg.lu_solve(system.lu_piv, rhs))
        vortex_scales = jnp.asarray(scales)
        vortex_nphi0 = jnp.asarray(nphi0)
    gx = mesh.operators.gradient_x
    gy = mesh.operators.gradient_y
    gx_idx, gx_w = _coo_to_gather(gx.rows, gx.cols, gx.vals, n, dtype)
    gy_idx, gy_w = _coo_to_gather(gy.rows, gy.cols, gy.vals, n, dtype)
    cg_op = None
    if isinstance(system.lu_piv[0], str) and system.lu_piv[0] == "cg":
        cg_op = system.lu_piv[1]
        # Non-symmetric operators (inhomogeneous Lambda) need BiCGStab.
        fac_kind = (
            "bicgstab" if int(np.asarray(cg_op.get("nonsym", 0))) else "cg"
        )
        fac_a = fac_b = None
    elif len(system.lu_piv) == 3 and system.lu_piv[0] in ("chol", "inv"):
        fac_kind = system.lu_piv[0]
        fac_a, fac_b = system.lu_piv[1], system.lu_piv[2]
    else:
        fac_kind = "lu"
        fac_a, fac_b = system.lu_piv
    layer = device.layers[info.layer]
    # Pad the interior gather indices to the factorization size so films of
    # different interior counts share one compiled solve.  Padded RHS rows
    # are masked to zero, which keeps the padded solution rows exactly zero
    # (identity pad block), so the padded scatter-add is a no-op.
    ni = len(system.indices)
    # NOTE: no np.asarray on fac_a -- that would d2h-copy the full
    # factorization (1.6 GB at 100k-vertex scale) just to read a shape.
    nip = ni if fac_a is None else fac_a.shape[0]
    interior = np.concatenate(
        [np.asarray(system.indices), np.zeros(nip - ni, dtype=np.int64)]
    )
    if vortex_cols is not None and vortex_cols.shape[0] != nip:
        vortex_cols = jnp.pad(
            vortex_cols, ((0, nip - vortex_cols.shape[0]), (0, 0))
        )
    # Transport-terminal films: the terminal currents are fixed for a given
    # model, so their stream function and boundary effective field are
    # constant offsets across the sweep (reference solve_film.py:440-524);
    # the self-field needs the triangle data for the in-film Biot-Savart.
    terminal = film_name in device.terminals
    terminal_kwargs = {}
    if terminal:
        from .solver.solve_film import solve_for_terminal_current_stream

        g_tr = np.asarray(
            solve_for_terminal_current_stream(
                device,
                info,
                model.terminal_systems[film_name],
                info.terminal_currents or {},
            )
        )
        ha = _terminal_boundary_ha(mesh.sites, info.boundary_indices, g_tr)
        gtx = mesh.operators.gradient_tri_x
        gty = mesh.operators.gradient_tri_y
        m_tri = len(mesh.triangle_areas)
        gtx_idx, gtx_w = _coo_to_gather(
            gtx.rows, gtx.cols, gtx.vals, m_tri, dtype
        )
        gty_idx, gty_w = _coo_to_gather(
            gty.rows, gty.cols, gty.vals, m_tri, dtype
        )
        terminal_kwargs = dict(
            terminal=True,
            g_offset=jnp.asarray(g_tr.astype(dtype)),
            ha_offset=jnp.asarray(ha.astype(dtype)),
            tri_centroids=jnp.asarray(mesh.triangle_centroids.astype(dtype)),
            tri_areas=jnp.asarray(mesh.triangle_areas.astype(dtype)),
            gtx_idx=gtx_idx,
            gtx_w=gtx_w,
            gty_idx=gty_idx,
            gty_w=gty_w,
        )
    return FilmSweepData(
        **terminal_kwargs,
        name=film_name,
        n=n,
        interior=jnp.asarray(interior),
        interior_sites=jnp.asarray(
            mesh.sites.astype(dtype)[interior]
        ),
        n_valid=jnp.asarray(ni),
        fac_kind=fac_kind,
        fac_a=jnp.asarray(fac_a) if fac_a is not None else None,
        fac_b=jnp.asarray(fac_b) if fac_b is not None else None,
        cg_op=cg_op,
        A=jnp.asarray(system.A) if system.A is not None else None,
        Q=jnp.asarray(info.kernel) if info.kernel is not None else None,
        weights=jnp.asarray(info.weights),
        gx_idx=gx_idx,
        gx_w=gx_w,
        gy_idx=gy_idx,
        gy_w=gy_w,
        sites=jnp.asarray(mesh.sites.astype(dtype)),
        z0=jnp.asarray(float(layer.z0), dtype=dtype),
        hole_masks=jnp.asarray(hole_masks),
        hole_ha_vecs=jnp.asarray(hole_ha),
        vortex_cols=vortex_cols,
        vortex_scales=vortex_scales,
        vortex_nphi0=vortex_nphi0,
        hole_names=hole_names,
    )


def _gather_matvec_batch(idx, w, g):
    """Batched sparse matvec in gather form: ``idx``/``w`` are (n_out, d)
    fixed-fan-in column indices and weights (zero-weight padded), ``g`` is
    (B, n).  Runs as ``d`` gathers -- no scatter, which serializes on
    TPU."""
    return sum(w[None, :, k] * g[:, idx[:, k]] for k in range(idx.shape[1]))


def _coo_to_gather(rows, cols, vals, n_rows, dtype):
    """Converts COO triplets to fixed-fan-in gather form (host-side)."""
    rows = np.asarray(rows)
    order = np.argsort(rows, kind="stable")
    rows_s = rows[order]
    cols_s = np.asarray(cols)[order]
    vals_s = np.asarray(vals)[order]
    counts = np.bincount(rows_s, minlength=n_rows)
    d = int(counts.max()) if len(counts) else 1
    idx = np.zeros((n_rows, d), dtype=np.int32)
    w = np.zeros((n_rows, d), dtype=dtype)
    starts = np.cumsum(counts) - counts
    pos = np.arange(len(rows_s)) - np.repeat(starts, counts)
    idx[rows_s, pos] = cols_s
    w[rows_s, pos] = vals_s
    return jnp.asarray(idx), jnp.asarray(w)


def _self_field_batch(data: FilmSweepData, g):
    """Batched self-field: g (B, n) -> (B, n).

    ``Q @ (w * g)`` for ordinary films; for transport-terminal films the
    stream is nonzero on the boundary, so the self-field is the in-film
    Biot-Savart sum over triangle-centroid currents instead (reference
    solve_film.py:556-565)."""
    if data.terminal:
        Jtx = _gather_matvec_batch(data.gty_idx, data.gty_w, g)
        Jty = -_gather_matvec_batch(data.gtx_idx, data.gtx_w, g)
        J_tri = jnp.stack([Jtx, Jty], axis=-1)  # (B, m, 2)
        return kernels.biot_savart_within_film(
            data.sites, data.tri_centroids, data.tri_areas, J_tri
        )
    if data.Q is not None:
        return kernels._dot(data.Q * data.weights[None, :], g.T).T
    # Low-memory mode: apply the Brandt kernel matrix-free.
    return kernels.Q_apply(
        data.sites, data.weights, (data.weights[None, :] * g).T
    ).T


def _solve_film_batch(
    data: FilmSweepData,
    Hz_total,  # (B, n): applied + field from other films, solver units
    I_circ,  # (B, n_holes)
    vortex_flux: float,
    refine_steps: int = 2,
    compute_self_field: bool = True,
    inner: bool = False,
    others_int=None,
):
    """Batched single-film solve. Returns (g, J, self_field), shapes
    (B, n), (B, n, 2), (B, n) (``self_field`` is None when
    ``compute_self_field=False`` -- the self-consistent iteration only
    needs J, so the O(n^2) self-field is evaluated once at the end).

    ``inner=True`` marks an intermediate self-consistent round: the
    explicit-inverse application then runs at ``Precision.HIGH`` (3-pass
    bf16 emulation) instead of the 6-pass full-f32 default -- its error
    is contracted by the coupling iteration, and the final round (which
    keeps ``inner=False``) re-solves at full precision.

    ``others_int``: optional ``(B, nip)`` field-from-other-films
    evaluated at the (padded) interior sites only -- the inner coupling
    rounds evaluate there directly (the solve consumes nothing else),
    skipping ~1/3 of the pairwise eval work at the benchmark config.
    Added to the gathered interior RHS; ``Hz_total`` then carries just
    the applied field."""
    B = Hz_total.shape[0]
    # Hole boundary conditions (batched rank-1 terms).
    if data.hole_masks.shape[0]:
        g0 = kernels._dot(I_circ, data.hole_masks)  # (B, n)
        Ha_eff = kernels._dot(I_circ, data.hole_ha_vecs)  # (B, n)
    else:
        g0 = jnp.zeros_like(Hz_total)
        Ha_eff = jnp.zeros_like(Hz_total)
    if data.g_offset is not None:
        # Transport stream + its boundary effective field: fixed offsets
        # (1-d, broadcast over B) or a per-point terminal-current sweep
        # (2-d).
        off_g = data.g_offset
        off_h = data.ha_offset
        if off_g.ndim == 1:
            off_g, off_h = off_g[None, :], off_h[None, :]
        g0 = g0 + off_g
        Ha_eff = Ha_eff + off_h
    # The interior gather indices are zero-padded to the (shared)
    # factorization size; mask the padded RHS rows to zero.  The pad block
    # of the system is the identity, so padded solution rows stay exactly
    # zero and the padded scatter-add below is a no-op at site 0.
    nip = data.interior.shape[0]
    valid = jnp.arange(nip) < data.n_valid
    h = (Hz_total - Ha_eff)[:, data.interior]  # (B, nip)
    if others_int is not None:
        h = h + others_int
    h = jnp.where(valid[None, :], h, 0.0)
    hT = h.T  # (nip, B)

    if data.fac_kind == "cg":
        from .ops import linalg as _linalg

        def solve(rhs):
            return _linalg.brandt_cg_solve(data.cg_op, rhs)
    elif data.fac_kind == "bicgstab":
        from .ops import linalg as _linalg

        def solve(rhs):
            return _linalg.brandt_bicgstab_solve(data.cg_op, rhs)
    elif data.fac_kind == "inv":
        if inner:
            def solve(rhs):
                return jnp.dot(
                    data.fac_a, rhs, precision=jax.lax.Precision.HIGH
                )
        else:
            def solve(rhs):
                return kernels._dot(data.fac_a, rhs)
    elif data.fac_kind == "chol":
        def solve(rhs):
            # Same convention as ops/linalg._jax_chol_solve: L factors the
            # SPD P with P diag(w) = A, so (-A) x = h => x = -cho_solve/w.
            # _widen_rhs: TPU TriangularSolve compiles pathologically for
            # RHS narrower than one sublane (ops/linalg._MIN_RHS_COLS).
            from .ops.linalg import _widen_rhs

            rhs, restore = _widen_rhs(rhs)
            y = restore(jax.scipy.linalg.cho_solve((data.fac_a, True), rhs))
            return -y / data.fac_b[:, None]
    else:
        def solve(rhs):
            from .ops.linalg import _widen_rhs

            rhs, restore = _widen_rhs(rhs)
            return restore(
                jax.scipy.linalg.lu_solve((data.fac_a, data.fac_b), rhs)
            )

    gf = solve(hT)  # (nip, B)
    # CG/BiCGStab control their own accuracy; no outer refinement (and no
    # dense A to form the residual with).
    if data.fac_kind not in ("cg", "bicgstab") and refine_steps:
        from .ops.linalg import _refine_safeguarded

        gf = _refine_safeguarded(solve, data.A, hT, gf, refine_steps)
    if data.vortex_cols is not None:
        # (n_v,) shared amplitudes broadcast over B; (B, n_v) amplitudes
        # sweep the vortex states per point (one MXU contraction either way).
        eff = vortex_flux * data.vortex_scales * data.vortex_nphi0
        if eff.ndim == 1:
            gf = gf + kernels._dot(data.vortex_cols, eff)[:, None]
        else:
            gf = gf + kernels._dot(data.vortex_cols, eff.T)
    gf = jnp.where(valid[:, None], gf, 0.0)
    g = g0.at[:, data.interior].add(gf.T)
    Jx = _gather_matvec_batch(data.gy_idx, data.gy_w, g)
    Jy = -_gather_matvec_batch(data.gx_idx, data.gx_w, g)
    J = jnp.stack([Jx, Jy], axis=-1)
    self_field = _self_field_batch(data, g) if compute_self_field else None
    return g, J, self_field


def _coupling_round(
    film_data, films, streams, Js, Hz_applied, coupling, precision=None,
    eval_interior=False,
):
    """One full inter-film coupling exchange.

    ``coupling="exact"``: O(n^2) pairwise Biot-Savart per ordered pair.
    ``coupling="fft"``: each source's stream function is transformed once
    (grid interpolation + rfft2) and every destination applies the
    analytic transfer ``(k/2) e^(-k dz)`` -- O(n + G^2 log G) per film
    pair; requires films on distinct layer heights.

    ``precision``: pairwise-kernel dot precision (exact mode only; see
    ``ops.pallas_kernels._tile_dot``).  The inner self-consistent rounds
    pass "bf16x3" (their coupling error is contracted by the iteration);
    the final round keeps the default full-f32 emulation.

    ``eval_interior``: evaluate the field at each destination's (padded)
    interior sites only, returning ``{film: (B, nip)}`` for
    ``_solve_film_batch(others_int=...)``.  The inner rounds' solves
    consume nothing else, so this is exact -- it just skips the pairwise
    work at boundary/hole sites (~1/3 of the eval axis at the benchmark
    config).  The final round evaluates at every site (the returned
    ``others`` is user-facing).
    """
    if eval_interior and coupling == "exact":
        # Shared-shape discipline (the same one the final-round pair loop
        # uses): heterogeneous-size films would otherwise compile one
        # ordered (n_src, nip_dst) kernel per pair -- up to n*(n-1)
        # Pallas programs per device (the huber susceptometer's four
        # distinct film sizes) -- in the INNER rounds this helper exists
        # to make cheap.  Sources are padded by _common_coupling_geometry
        # (zero weight/current); destination interior sites are padded to
        # the shared max with each film's own site-0 coordinates (a real
        # coordinate, so r > 0 against every far-away padded source), and
        # the padded rows are sliced off before returning.
        B = next(iter(Hz_applied.values())).shape[0]
        geo = _common_coupling_geometry(film_data, films, Js)
        nips = [film_data[f].interior_sites.shape[0] for f in films]
        nip_max = max(nips)
        pad_dst = len(films) >= 2 and not all(s == nip_max for s in nips)
        new_int = {}
        for dst in films:
            d = film_data[dst]
            dst_sites = d.interior_sites
            if pad_dst and dst_sites.shape[0] != nip_max:
                extra = jnp.broadcast_to(
                    dst_sites[0], (nip_max - dst_sites.shape[0], 2)
                )
                dst_sites = jnp.concatenate([dst_sites, extra])
            acc = jnp.zeros((B, dst_sites.shape[0]), dtype=dst_sites.dtype)
            for src in films:
                if src == dst:
                    continue
                dz2 = (d.z0 - film_data[src].z0) ** 2
                sa, wa, Ja = geo[src]
                acc = acc + kernels.biot_savart_film_to_film_dz2(
                    sa, wa, Ja, dst_sites, jnp.asarray(dz2),
                    precision=precision,
                )
            new_int[dst] = acc[:, : d.interior_sites.shape[0]]
        return new_int
    new_others = {name: jnp.zeros_like(Hz_applied[name]) for name in films}
    if coupling == "fft":
        from .ops import fft_coupling

        spectra = {
            name: fft_coupling.fft_source_spectrum(
                film_data[name].fft_grid, streams[name]
            )
            for name in films
        }
        # Group by destination: the transfers are summed in Fourier space,
        # so each destination pays ONE irfft2 + grid gather per round
        # instead of one per source film.
        for dst in films:
            srcs = [s for s in films if s != dst]
            if not srcs:
                continue
            spec_stack = jnp.stack([spectra[s] for s in srcs])
            dzs = jnp.stack(
                [
                    jnp.abs(film_data[dst].z0 - film_data[s].z0)
                    for s in srcs
                ]
            )
            new_others[dst] = fft_coupling.fft_fields_from_spectra(
                film_data[dst].fft_grid, spec_stack, dzs
            )
        if eval_interior:
            # FFT evaluation is O(n); just gather the interior rows.
            return {
                name: new_others[name][:, film_data[name].interior]
                for name in films
            }
        return new_others
    # Exact mode runs over UNORDERED pairs through
    # kernels.biot_savart_pair_dz2, which dispatches either two
    # one-directional Pallas passes (default -- measured faster at the
    # benchmark shapes) or the fused single-geometry-pass pair kernel
    # (SUPERSCREEN_TPU_PAIR_COUPLING=1); see docs/COUPLING.md.  The
    # reference recomputes the pairwise geometry per ordered pair per
    # solve (solver/solve.py:28-73).
    names = list(films)
    geo = _common_coupling_geometry(film_data, names, Js)
    for ai in range(len(names)):
        for bi in range(ai + 1, len(names)):
            a, b = names[ai], names[bi]
            dz2 = (film_data[b].z0 - film_data[a].z0) ** 2
            sa, wa, Ja = geo[a]
            sb, wb, Jb = geo[b]
            at_b, at_a = kernels.biot_savart_pair_dz2(
                sa, wa, Ja, sb, wb, Jb,
                jnp.asarray(dz2), precision=precision,
            )
            new_others[b] = new_others[b] + at_b[:, : film_data[b].n]
            new_others[a] = new_others[a] + at_a[:, : film_data[a].n]
    return new_others


def _common_coupling_geometry(film_data, names, Js):
    """Per-film (sites, weights, J) for the exact coupling pair loop,
    padded to one shared site count when it pays for itself.

    A device whose films have heterogeneous mesh sizes compiles a
    separate pairwise kernel per ORDERED size combination -- up to
    n_films * (n_films - 1) Pallas compilations (the huber susceptometer
    bench paid ~12 at four distinct film sizes).  Padding every film to
    the largest site count collapses those to one shared compilation;
    padded sites carry zero weight/current (no contribution) and sit at
    distinct far-away coordinates per film (r > 0 against every real and
    padded point, so no 0 * inf NaNs even for same-height films).  The
    extra O(nmax^2 - n1*n2) tile work is millisecond-scale next to the
    compile savings: even a cold heterogeneous PAIR pays two
    one-directional Pallas programs (one per direction) that padding
    collapses to one, and the interior-eval inner rounds multiply the
    distinct-shape count further -- so every heterogeneous device is
    padded; homogeneous devices (the common benchmark shape) pass
    through untouched.
    """
    sizes = [film_data[f].sites.shape[0] for f in names]
    nmax = max(sizes)
    if len(names) < 2 or all(s == nmax for s in sizes):
        return {
            f: (film_data[f].sites, film_data[f].weights, Js[f])
            for f in names
        }
    from functools import reduce

    scale = 1e6 * (
        reduce(
            jnp.maximum,
            [jnp.max(jnp.abs(film_data[f].sites)) for f in names],
        )
        + 1.0
    )
    out = {}
    for i, f in enumerate(names):
        d = film_data[f]
        npad = nmax - d.sites.shape[0]
        if npad == 0:
            out[f] = (d.sites, d.weights, Js[f])
            continue
        coords = scale * (
            1.0 + i * nmax + jnp.arange(npad, dtype=d.sites.dtype)
        )
        sites_p = jnp.concatenate(
            [d.sites, jnp.stack([coords, coords], axis=1)]
        )
        w_p = jnp.concatenate([d.weights, jnp.zeros(npad, d.weights.dtype)])
        J = Js[f]
        J_p = jnp.pad(J, ((0, 0), (0, npad), (0, 0)))
        out[f] = (sites_p, w_p, J_p)
    return out


class SweepResult:
    """Results of a batched sweep.

    Stacked per-film arrays live on device; :meth:`solution` materializes a
    full :class:`superscreen_tpu.Solution` for any sweep index.

    Args:
        model: The factorized model used for the sweep.
        film_data: ``{film_name: FilmSweepData}``.
        streams: ``{film_name: (B, n)}`` stream functions.
        current_densities: ``{film_name: (B, n, 2)}``.
        self_fields: ``{film_name: (B, n)}`` (solver units / conversion
            applied, i.e. in ``field_units``).
        applied_fields: ``{film_name: (B, n)}`` in ``field_units``.
        other_fields: ``{film_name: (B, n)}`` in ``field_units`` (or None).
        field_units, current_units: Units of the stored arrays.
        applied_field_funcs: The per-sweep applied field callables (if any).
    """

    def __init__(
        self,
        *,
        model: FactorizedModel,
        streams: Dict[str, np.ndarray],
        current_densities: Dict[str, np.ndarray],
        self_fields: Dict[str, np.ndarray],
        applied_fields: Dict[str, np.ndarray],
        other_fields: Optional[Dict[str, np.ndarray]],
        field_units: str,
        current_units: str,
        applied_field_funcs: Optional[Sequence[Callable]] = None,
        circulating_currents: Optional[Sequence[Dict[str, float]]] = None,
        vortex_nPhi0: Optional[np.ndarray] = None,
        terminal_currents: Optional[Sequence[Dict[str, Dict[str, float]]]] = None,
    ):
        self.model = model
        self.streams = streams
        self.current_densities = current_densities
        self.self_fields = self_fields
        self.applied_fields = applied_fields
        self.other_fields = other_fields
        self.field_units = field_units
        self.current_units = current_units
        self.applied_field_funcs = applied_field_funcs
        self.circulating_currents = circulating_currents
        # (B, n_vortices) per-point amplitudes (flat film order), or None.
        self.vortex_nPhi0 = vortex_nPhi0
        # Length-B per-point transport drives, or None (model's drive).
        self.terminal_currents = terminal_currents

    @property
    def num_solutions(self) -> int:
        first = next(iter(self.streams.values()))
        return first.shape[0]

    def __len__(self) -> int:
        return self.num_solutions

    def solution(self, index: int) -> Solution:
        """Materializes the full :class:`Solution` for sweep index ``index``."""
        film_solutions = {}
        for name in self.streams:
            other = None
            if self.other_fields is not None:
                other = np.asarray(self.other_fields[name][index])
            # np.array (copies): zero-copy views of device buffers are
            # read-only, and downstream consumers (matplotlib tri
            # interpolators) write into these arrays.
            film_solutions[name] = FilmSolution(
                stream=np.array(self.streams[name][index]),
                current_density=np.array(self.current_densities[name][index]),
                applied_field=np.array(self.applied_fields[name][index]),
                self_field=np.array(self.self_fields[name][index]),
                field_from_other_films=(
                    None if other is None else np.array(other)
                ),
            )
        applied_func = ConstantField(0)
        if self.applied_field_funcs is not None:
            applied_func = self.applied_field_funcs[index]
        circ = self.model.circulating_currents
        if self.circulating_currents is not None:
            circ = self.circulating_currents[index]
        vortices = [v for vs in self.model.vortices.values() for v in vs]
        if self.vortex_nPhi0 is not None:
            vortices = [
                Vortex(x=v.x, y=v.y, film=v.film, nPhi0=float(a))
                for v, a in zip(vortices, self.vortex_nPhi0[index])
            ]
        terminal = self.model.terminal_currents
        if self.terminal_currents is not None:
            terminal = self.terminal_currents[index]
        return Solution(
            device=self.model.device,
            film_solutions=film_solutions,
            applied_field_func=applied_func,
            field_units=self.field_units,
            current_units=self.current_units,
            circulating_currents=circ,
            terminal_currents=terminal,
            vortices=vortices,
            solver="superscreen_tpu.solve_many",
        )

    def solutions(self) -> List[Solution]:
        """Materializes all Solutions."""
        return [self.solution(i) for i in range(self.num_solutions)]


_solve_film_batch_jit = partial(
    jax.jit,
    static_argnames=("refine_steps", "compute_self_field", "inner"),
)(_solve_film_batch)
_coupling_round_jit = partial(
    jax.jit, static_argnames=("films", "coupling", "precision")
)(_coupling_round)
_self_field_batch_jit = jax.jit(_self_field_batch)


def _strip_metadata(film_data):
    """Canonicalizes per-film metadata (names) so the stage-jitted calls
    share compilations across films of equal shapes."""
    from dataclasses import replace

    return {
        name: replace(d, name="film", hole_names=("h",) * len(d.hole_names))
        for name, d in film_data.items()
    }


def _terminal_boundary_ha(points, boundary_indices, g_tr):
    """Effective applied field of a transport boundary stream
    (reference ``solve_film.py:393-412``)."""
    from .geometry import close_curve, path_vectors
    from .ops import kernels as _kernels

    boundary_sites = points[boundary_indices]
    boundary_stream = g_tr[boundary_indices]
    boundary_centers = 0.5 * (boundary_sites + np.roll(boundary_sites, -1, axis=0))
    boundary_stream_mid = 0.5 * (
        boundary_stream + np.roll(boundary_stream, -1, axis=0)
    )
    edge_lengths, boundary_normals = path_vectors(close_curve(boundary_sites))
    return np.asarray(
        _kernels.boundary_effective_field(
            points,
            boundary_centers,
            edge_lengths,
            boundary_normals,
            boundary_stream_mid,
        )
    )


def _apply_terminal_sweeps(
    model, film_data, terminal_currents, B, dtype, current_units
):
    """Folds a length-B terminal-current sweep into ``film_data``: each
    terminal film's ``g_offset``/``ha_offset`` become ``(B, n)`` built from
    per-terminal UNIT bootstrap solutions.

    The bootstrap is AFFINE in the drive: the raw boundary stream is
    linear in the terminal currents, the reference then shifts it by the
    drive-dependent scalar ``c = -max + ptp/2`` (over the raw array,
    interior zeros included), and the remaining solves are linear in the
    boundary values.  So each sweep point is
    ``sum_k coeff_k * S(b_k) + c * S(1_boundary)`` -- ``n_terminals``
    solves per film total, independent of B.  Returns the updated
    film_data and the per-point float dicts (for the materialized
    Solutions)."""
    from dataclasses import replace

    from .solver.solve_film import (
        solve_from_boundary_stream,
        terminal_boundary_stream,
    )
    from .solver.utils import currents_to_floats

    device = model.device
    if len(terminal_currents) != B:
        raise ValueError(
            f"terminal_currents must have length B={B}, got "
            f"{len(terminal_currents)}."
        )
    per_point = []
    for tc in terminal_currents:
        d = {}
        for film, currents in (tc or {}).items():
            if film not in device.terminals:
                raise ValueError(f"Film {film!r} has no terminals.")
            d[film] = currents_to_floats(currents, device.ureg, current_units)
        per_point.append(d)

    out = dict(film_data)
    for film, terms in device.terminals.items():
        names = [t.name for t in terms]
        T = len(names)
        I = np.zeros((B, T))
        for b, d in enumerate(per_point):
            cur = d.get(film, {})
            unknown = set(cur) - set(names)
            if unknown:
                raise ValueError(
                    f"Unknown terminals for film {film!r}: {sorted(unknown)}."
                )
            for j, nm in enumerate(names):
                I[b, j] = cur.get(nm, 0.0)
            total = I[b].sum()
            if abs(total) > 1e-9 * max(1.0, np.abs(I[b]).max()):
                raise ValueError(
                    f"Terminal currents for film {film!r} at sweep point "
                    f"{b} do not sum to zero (sum = {total:.3e})."
                )
        if T < 2:
            raise ValueError(
                f"Film {film!r} needs >= 2 terminals for a transport sweep."
            )
        info = model.film_info[film]
        tsys = model.terminal_systems[film]
        mesh = device.meshes[film]
        # Raw (uncentered) boundary streams of the T-1 basis drives
        # (e_k - e_last), their solved unit solutions, plus the solution
        # for a CONSTANT unit boundary stream (the centering direction).
        raw_b, units_g, units_h = [], [], []
        for k in range(T - 1):
            basis = {nm: 0.0 for nm in names}
            basis[names[k]] = 1.0
            basis[names[-1]] = -1.0
            b_k = np.asarray(
                terminal_boundary_stream(device, info, tsys, basis)
            )
            raw_b.append(b_k)
            g_u = np.asarray(
                solve_from_boundary_stream(device, info, tsys, b_k)
            )
            units_g.append(g_u)
            units_h.append(
                _terminal_boundary_ha(mesh.sites, info.boundary_indices, g_u)
            )
        ones_b = np.zeros(len(mesh.sites))
        ones_b[info.boundary_indices] = 1.0
        g_c = np.asarray(solve_from_boundary_stream(device, info, tsys, ones_b))
        units_g.append(g_c)
        units_h.append(
            _terminal_boundary_ha(mesh.sites, info.boundary_indices, g_c)
        )
        coeff = I[:, :-1]  # currents sum to zero -> T-1 independent basis
        # Per-point centering scalar c = -max + ptp/2 over the raw
        # superposed array (interior zeros included), exactly as in
        # solve_for_terminal_current_stream; c = 0 for a zero drive.
        raw = coeff @ np.stack(raw_b)  # (B, n) raw boundary streams
        c = -raw.max(axis=1) + np.ptp(raw, axis=1) / 2.0  # (B,)
        zero_drive = np.all(coeff == 0.0, axis=1)
        c = np.where(zero_drive, 0.0, c)
        coeff = np.concatenate([coeff, c[:, None]], axis=1)  # (B, T)
        g_off = coeff @ np.stack(units_g)  # (B, n)
        ha_off = coeff @ np.stack(units_h)
        out[film] = replace(
            out[film],
            g_offset=jnp.asarray(g_off.astype(dtype)),
            ha_offset=jnp.asarray(ha_off.astype(dtype)),
        )
    return out, per_point


def _apply_vortex_amplitudes(model, film_data, vortex_nPhi0, B, dtype):
    """Folds per-sweep-point vortex amplitudes into ``film_data`` (each
    film's ``vortex_nphi0`` becomes ``(B, n_v)``).  Returns the updated
    film_data and the flat ``(B, n_total)`` amplitude array (film order)."""
    from dataclasses import replace

    counts = {name: len(vs) for name, vs in model.vortices.items()}
    if isinstance(vortex_nPhi0, dict):
        per_film = {}
        for name, n_v in counts.items():
            arr = np.asarray(
                vortex_nPhi0.get(name, np.zeros((B, 0))), dtype=dtype
            )
            if arr.shape != (B, n_v):
                raise ValueError(
                    f"vortex_nPhi0[{name!r}] must have shape ({B}, {n_v}), "
                    f"got {arr.shape}."
                )
            per_film[name] = arr
        unknown = set(vortex_nPhi0) - set(counts)
        if unknown:
            raise ValueError(f"vortex_nPhi0 names unknown films: {unknown}.")
    else:
        arr = np.asarray(vortex_nPhi0, dtype=dtype)
        n_total = sum(counts.values())
        if arr.shape != (B, n_total):
            raise ValueError(
                f"vortex_nPhi0 must have shape ({B}, {n_total}), got "
                f"{arr.shape}."
            )
        per_film, offset = {}, 0
        for name, n_v in counts.items():
            per_film[name] = arr[:, offset : offset + n_v]
            offset += n_v
    out = dict(film_data)
    for name, amps in per_film.items():
        if not amps.shape[1]:
            continue
        out[name] = replace(out[name], vortex_nphi0=jnp.asarray(amps))
    flat = np.concatenate(
        [per_film[name] for name in counts], axis=1
    ) if counts else np.zeros((B, 0))
    return out, flat


def _run_sweep_staged(
    film_data, Hz_applied, I_circ, vortex_flux, iterations, refine_steps,
    coupling="exact",
):
    """Stage-jitted sweep: the per-film batched solve and the pairwise
    coupling kernel are compiled once each (films share padded shapes) and
    orchestrated from Python.  All intermediates stay on device.  This
    compiles in seconds where the fully fused program takes minutes at
    100k-vertex scale, at the cost of ~one dispatch per stage."""
    films = list(film_data)
    film_data = _strip_metadata(film_data)
    # Same inner/final split as the fused runner: intermediate rounds
    # solve cheaply (their noise is contracted by the coupling
    # iteration); the final round keeps full refinement and coupling
    # precision.
    inner_refine = (
        _inner_refine_steps(refine_steps) if iterations >= 1 else refine_steps
    )
    inner_prec = _inner_coupling_precision()
    streams, Js, others = {}, {}, {}
    for name in films:
        g, J, _ = _solve_film_batch_jit(
            film_data[name],
            jnp.asarray(Hz_applied[name]),
            jnp.asarray(I_circ[name]),
            vortex_flux,
            refine_steps=inner_refine,
            compute_self_field=False,
            inner=iterations >= 1,
        )
        streams[name], Js[name] = g, J
        others[name] = jnp.zeros_like(jnp.asarray(Hz_applied[name]))
    for it in range(iterations):
        final = it == iterations - 1
        new_others = _coupling_round_jit(
            film_data, tuple(films), streams, Js, Hz_applied, coupling,
            None if final else inner_prec,
        )
        others = new_others
        for name in films:
            g, J, _ = _solve_film_batch_jit(
                film_data[name],
                jnp.asarray(Hz_applied[name]) + others[name],
                jnp.asarray(I_circ[name]),
                vortex_flux,
                refine_steps=refine_steps if final else inner_refine,
                compute_self_field=False,
                inner=not final,
            )
            streams[name], Js[name] = g, J
    self_fields = {
        name: _self_field_batch_jit(film_data[name], streams[name])
        for name in films
    }
    return streams, Js, self_fields, others


def _inner_refine_steps(refine_steps: int) -> int:
    """Refinement steps for the *inner* self-consistent rounds.

    Iterative refinement exists to push the single-film solve to the f32
    residual floor; inside the self-consistent loop that accuracy is
    wasted -- the inter-film coupling is a weak contraction, so solver
    noise in the intermediate iterates is damped and only the FINAL
    round's solve determines the delivered residual (which keeps the full
    ``refine_steps``).  Each refine step costs two additional
    (pad x pad) @ (pad x B) matmuls per film per round -- at B sweep
    points in 8 of 128 MXU sublanes these are the most
    utilization-hostile matmuls in the program, so dropping them from the
    inner rounds removes a large fraction of the sweep's critical path
    (see docs/COUPLING.md for the v5e measurement at the 109k-site
    benchmark config).  Overridable for A/B measurement via
    SUPERSCREEN_TPU_INNER_REFINE.
    """
    env = os.environ.get("SUPERSCREEN_TPU_INNER_REFINE")
    if env is not None:
        requested = int(env)
        if requested > refine_steps:
            logger.warning(
                "SUPERSCREEN_TPU_INNER_REFINE=%d clamped to refine_steps=%d "
                "(inner rounds never refine more than the final round); "
                "raise refine_steps to honor the override.",
                requested, refine_steps,
            )
        return min(requested, refine_steps)
    return 0


def _inner_coupling_precision():
    """Pairwise-kernel dot precision for the *inner* coupling rounds.

    Same argument as :func:`_inner_refine_steps`: the self-consistent
    iteration contracts operator noise in the intermediate rounds, and
    the final round recomputes the coupling at full f32 emulation, so the
    delivered fields and the certified operator accuracy are unchanged.
    "bf16x3" halves the MXU passes of the dominant coupling contraction
    (see ``ops.pallas_kernels._tile_dot`` and docs/COUPLING.md for the
    v5e measurement).  Override via
    SUPERSCREEN_TPU_INNER_COUPLING_PRECISION.
    """
    return os.environ.get(
        "SUPERSCREEN_TPU_INNER_COUPLING_PRECISION", "bf16x3"
    )


@partial(
    jax.jit,
    static_argnames=(
        "iterations", "refine_steps", "coupling", "inner_refine",
        "inner_coupling_precision",
    ),
)
def _run_sweep_fused(
    film_data, Hz_applied, I_circ, vortex_flux, iterations, refine_steps,
    coupling="exact", inner_refine=None, inner_coupling_precision=None,
):
    """The jitted sweep body: batched per-film solves plus ``iterations``
    rounds of batched inter-film coupling (a ``lax.fori_loop`` so the
    compiled program size is independent of the iteration count).

    The inner rounds solve with ``inner_refine`` refinement steps (see
    :func:`_inner_refine_steps` -- solver noise there is contracted by
    the coupling iteration); the final round keeps the caller's
    ``refine_steps`` so the delivered streams sit at the refined residual
    floor."""
    films = list(film_data)
    if inner_refine is None or iterations < 1:
        inner_refine = refine_steps
    streams, Js, others = {}, {}, {}
    for name in films:
        g, J, _ = _solve_film_batch(
            film_data[name],
            Hz_applied[name],
            I_circ[name],
            vortex_flux,
            refine_steps=inner_refine,
            compute_self_field=False,
            inner=iterations >= 1,
        )
        streams[name], Js[name] = g, J
        others[name] = jnp.zeros_like(Hz_applied[name])

    def _inner_round(carry):
        # Inner rounds evaluate the coupling at the interior sites only
        # (all the solve consumes) with bf16x3 dots and HIGH-precision
        # inverse application -- every shortcut the contraction damps.
        streams, Js = carry
        new_int = _coupling_round(
            film_data, films, streams, Js, Hz_applied, coupling,
            precision=inner_coupling_precision, eval_interior=True,
        )
        streams, Js = dict(streams), dict(Js)
        for name in films:
            g, J, _ = _solve_film_batch(
                film_data[name],
                Hz_applied[name],
                I_circ[name],
                vortex_flux,
                refine_steps=inner_refine,
                compute_self_field=False,
                inner=True,
                others_int=new_int[name],
            )
            streams[name], Js[name] = g, J
        return streams, Js

    if iterations >= 1:
        if iterations > 1:
            streams, Js = jax.lax.fori_loop(
                0,
                iterations - 1,
                lambda _, c: _inner_round(c),
                (streams, Js),
            )
        # Final round at full refinement, full coupling precision, and
        # all-site coupling evaluation (the returned ``others`` is
        # user-facing).  Unrolled: the static arguments cannot vary
        # inside the fori_loop body.
        others = _coupling_round(
            film_data, films, streams, Js, Hz_applied, coupling
        )
        for name in films:
            g, J, _ = _solve_film_batch(
                film_data[name],
                Hz_applied[name] + others[name],
                I_circ[name],
                vortex_flux,
                refine_steps=refine_steps,
                compute_self_field=False,
            )
            streams[name], Js[name] = g, J
    # The O(n^2) self-field only depends on the final stream functions.
    self_fields = {
        name: _self_field_batch(film_data[name], streams[name])
        for name in films
    }
    return streams, Js, self_fields, others


@partial(jax.jit, static_argnames=("iterations", "refine_steps", "coupling"))
def _run_sweep_history(
    film_data, Hz_applied, I_circ, vortex_flux, iterations, refine_steps,
    coupling="exact",
):
    """Like :func:`_run_sweep_fused` but records every self-consistent
    iteration (the reference ``solve`` returns one Solution per iteration,
    ``solver/solve.py:491-545``).

    Returns per-film dicts of stacked arrays with a leading history axis of
    length ``iterations + 1``: ``gs (I+1, B, n)``, ``Js (I+1, B, n, 2)``,
    ``self_fields (I+1, B, n)``, and ``others (I+1, B, n)`` (``others[0]``
    is zero -- the initial solve sees only the applied field).
    """
    films = list(film_data)
    g0, J0 = {}, {}
    for name in films:
        g, J, _ = _solve_film_batch(
            film_data[name],
            Hz_applied[name],
            I_circ[name],
            vortex_flux,
            refine_steps=refine_steps,
            compute_self_field=False,
        )
        g0[name], J0[name] = g, J

    def body(carry, _):
        streams_prev, Js_prev = carry
        new_others = _coupling_round(
            film_data, films, streams_prev, Js_prev, Hz_applied, coupling
        )
        streams_new, Js_new = {}, {}
        for name in films:
            g, J, _ = _solve_film_batch(
                film_data[name],
                Hz_applied[name] + new_others[name],
                I_circ[name],
                vortex_flux,
                refine_steps=refine_steps,
                compute_self_field=False,
            )
            streams_new[name], Js_new[name] = g, J
        return (streams_new, Js_new), (streams_new, Js_new, new_others)

    if iterations >= 1:
        _, (g_hist, J_hist, o_hist) = jax.lax.scan(
            body, (g0, J0), None, length=iterations
        )
        gs = {
            name: jnp.concatenate([g0[name][None], g_hist[name]])
            for name in films
        }
        Js = {
            name: jnp.concatenate([J0[name][None], J_hist[name]])
            for name in films
        }
        others = {
            name: jnp.concatenate(
                [jnp.zeros_like(Hz_applied[name])[None], o_hist[name]]
            )
            for name in films
        }
    else:
        gs = {name: g0[name][None] for name in films}
        Js = {name: J0[name][None] for name in films}
        others = {
            name: jnp.zeros_like(Hz_applied[name])[None] for name in films
        }
    # One batched O(n^2) self-field evaluation per film over the whole
    # history.
    self_fields = {}
    for name in films:
        hist_shape = gs[name].shape  # (I+1, B, n)
        flat = gs[name].reshape(hist_shape[0] * hist_shape[1], hist_shape[2])
        self_fields[name] = _self_field_batch(film_data[name], flat).reshape(
            hist_shape
        )
    return gs, Js, self_fields, others


#: Per-round cost-model constants for ``coupling="auto"``, calibrated on a
#: v5e against the measured table in docs/COUPLING.md (B=8; recalibrated
#: 2026-08 after the gather-based FFT interpolation rework).  Only the
#: *ratio* matters for the dispatch decision, so the calibration transfers
#: across TPU generations better than a raw site-count threshold would.
_EXACT_MS_PER_PAIR_SITE2 = 9.0e-9  # exact kernel: ms per n_src*n_dst
#: FFT ms per G^2*log2(G) per film.  One coefficient: since grids snap to
#: 5-smooth sizes and the mesh->grid interpolation runs on the film's
#: bounding subgrid (ops/fft_coupling.py), the former >1024 cache penalty
#: is gone -- re-measured v5e rounds (B=8, two films): 32.9 ms at
#: G=1024/66k sites (vs exact 85.4), 64.4 ms at G=1250/100k (vs exact
#: 160; round 4 recorded 390 ms at the old G=2048 grid).  The value is
#: fit to the 66k->100k delta and deliberately conservative (overpredicts
#: the measured small-G rounds, which sit at the ~30 ms tunnel dispatch
#: floor), biasing the auto dispatch toward exact near the crossover
#: (measured 1.1x at 27k/G=648 -- a genuine toss-up).
_FFT_MS_PER_GRID_UNIT = 2.0e-6
_FFT_MS_PER_SITE = 8.0e-5  # fft: ms per mesh site (interp gathers)


def _predict_fft_grid(device) -> int:
    """The grid size the FFT coupling path would build (mirrors
    ``ops.fft_coupling._grid_axes`` with default spacing and padding)."""
    from .ops.fft_coupling import friendly_grid_size

    meshes = device.meshes
    h = min(float(np.mean(m.edge_mesh.edge_lengths)) for m in meshes.values())
    mins = np.min([m.sites.min(axis=0) for m in meshes.values()], axis=0)
    maxs = np.max([m.sites.max(axis=0) for m in meshes.values()], axis=0)
    span = float((maxs - mins).max()) * 3.0
    return friendly_grid_size(int(np.ceil(span / h + 1)))


def _resolve_auto_coupling(model, films, iterations) -> str:
    """Concrete coupling mode for ``coupling="auto"``.

    Compares per-round cost models (constants measured on a v5e,
    docs/COUPLING.md): the exact pairwise kernel costs
    ``A * sum_{i!=j} n_i n_j``; the FFT transfer costs
    ``B * n_films * G^2 log2(G) + C * sum_i n_i``, where ``G`` is the
    (5-smooth) grid the FFT path would build.  Because ``G`` tracks the
    mesh density AND the geometry's bounding box, the true crossover
    moves with the geometry -- a scalar site threshold misses that.
    Setting ``SUPERSCREEN_TPU_FFT_COUPLING_MIN_N`` restores the plain
    threshold dispatch (fft iff every film has at least that many sites).
    FFT additionally requires distinct layer heights (the analytic
    transfer suppresses nothing at dz=0).
    """
    import os

    if len(films) < 2 or iterations == 0:
        return "exact"
    device = model.device
    z0s = [device.layers[model.film_info[f].layer].z0 for f in films]
    if len(set(np.round(z0s, 12))) != len(z0s):
        return "exact"
    sizes = [len(device.meshes[f].sites) for f in films]
    threshold = os.environ.get("SUPERSCREEN_TPU_FFT_COUPLING_MIN_N")
    if threshold is not None:
        return "fft" if min(sizes) >= int(threshold) else "exact"
    exact_ms = _EXACT_MS_PER_PAIR_SITE2 * (
        sum(sizes) ** 2 - sum(n * n for n in sizes)
    )
    G = _predict_fft_grid(device)
    fft_ms = (
        _FFT_MS_PER_GRID_UNIT * len(films) * G * G * np.log2(G)
        + _FFT_MS_PER_SITE * sum(sizes)
    )
    return "fft" if fft_ms < exact_ms else "exact"


def _attach_fft_grids(model, film_data, films) -> Dict[str, FilmSweepData]:
    """Returns ``film_data`` with per-film FFT coupling grids populated.

    The grid data depends only on the device geometry, so it is cached on
    the model: repeated solve/solve_many calls skip the host-side
    trifinder/barycentric construction (seconds at large G).  Raises if
    films share a layer height (the analytic transfer suppresses no
    wavenumbers at dz=0)."""
    from dataclasses import replace as _replace

    from .ops.fft_coupling import build_film_grid_data

    device = model.device
    z0s = [device.layers[model.film_info[f].layer].z0 for f in films]
    if len(set(np.round(z0s, 12))) != len(z0s):
        raise ValueError(
            "coupling='fft' requires films on distinct layer heights "
            "(the analytic transfer suppresses no wavenumbers at "
            "dz=0); use coupling='exact'."
        )
    grids = getattr(model, "_fft_grid_cache", None)
    if grids is None:
        grids = build_film_grid_data(device)
        try:
            model._fft_grid_cache = grids
        except (AttributeError, TypeError):
            pass
    return {
        name: _replace(d, fft_grid=grids[name])
        for name, d in film_data.items()
    }


def _get_sweep_data(model) -> Dict[str, FilmSweepData]:
    """Per-film sweep arrays for a factorized model, cached on the model.

    The cache is keyed on the model's vortex configuration (the only
    mutable state baked into :class:`FilmSweepData`; circulating currents
    enter as runtime inputs)."""
    films = list(model.device.films)
    snapshot = tuple(
        (name, tuple(model.film_info[name].vortices or ()))
        for name in films
    )
    cached = getattr(model, "_sweep_data_cache", None)
    if cached is not None and cached[0] == snapshot:
        return cached[1]
    data = {name: _film_sweep_data(model, name) for name in films}
    model._sweep_data_cache = (snapshot, data)
    return data


def _run_sweep(
    film_data, Hz_applied, I_circ, vortex_flux, iterations, refine_steps,
    coupling="exact",
):
    """Dispatches to the fully fused single-program runner (default --
    lowest dispatch overhead; its one-time compile cost is amortized by the
    persistent compilation cache) or the stage-jitted runner
    (``SUPERSCREEN_TPU_FUSED_SWEEP=0`` -- compiles in seconds even without
    a warm cache, at ~one dispatch per stage)."""
    import os

    if os.environ.get("SUPERSCREEN_TPU_FUSED_SWEEP", "1") == "1":
        return _run_sweep_fused(
            film_data, Hz_applied, I_circ, vortex_flux, iterations,
            refine_steps, coupling,
            inner_refine=_inner_refine_steps(refine_steps),
            inner_coupling_precision=_inner_coupling_precision(),
        )
    return _run_sweep_staged(
        film_data, Hz_applied, I_circ, vortex_flux, iterations, refine_steps,
        coupling,
    )


def solve_many(
    device: Optional[Device] = None,
    *,
    model: Optional[FactorizedModel] = None,
    applied_fields: Optional[Sequence[Callable]] = None,
    applied_field_arrays: Optional[Dict[str, np.ndarray]] = None,
    circulating_currents: Optional[Sequence[Dict[str, Union[float, str]]]] = None,
    terminal_currents: Optional[Sequence[Dict[str, Dict[str, Union[float, str]]]]] = None,
    vortices: Optional[Sequence[Vortex]] = None,
    field_units: str = "mT",
    current_units: str = "uA",
    iterations: int = 0,
    refine_steps: int = 2,
    sharding: Optional["jax.sharding.Sharding"] = None,
    coupling: str = "auto",
    keep_history: bool = False,
    vortex_nPhi0: Optional[Union[np.ndarray, Dict[str, np.ndarray]]] = None,
    final_refine: int = 0,
    result_dtype: Optional[str] = None,
) -> Union[SweepResult, List[SweepResult]]:
    """Solves a batch of models that share one factorization.

    Exactly one of ``applied_fields`` (a sequence of B field callables) or
    ``applied_field_arrays`` (``{film_name: (B, n)}`` pre-evaluated fields in
    ``field_units``) must describe the sweep, and/or ``circulating_currents``
    may be a length-B sequence of dicts.  The whole batch executes as one
    jitted device computation; pass ``sharding`` to shard the batch axis
    across a device mesh.

    Args:
        device: The device to solve (or provide ``model``).
        model: A pre-factorized model.
        applied_fields: B applied-field callables ``H_z(x, y, z)``.
        applied_field_arrays: ``{film_name: (B, n)}`` applied fields.
        circulating_currents: Length-B sequence of
            ``{hole_name: current}``.
        terminal_currents: Length-B sequence of
            ``{film_name: {terminal_name: current}}`` transport drives
            (each summing to zero per film) -- an IV-style bias sweep.
            The terminal bootstrap is linear in the drive, so the whole
            sweep reuses ``n_terminals - 1`` unit bootstrap solutions per
            film; when given, it replaces any drive baked into the model
            at factorization.
        vortices: Vortices (positions fixed across the sweep; amplitudes
            may vary per point via ``vortex_nPhi0``).
        field_units: Units of the applied field.
        current_units: Units for currents.
        iterations: Self-consistent inter-film coupling rounds.
        refine_steps: Iterative-refinement rounds per solve.
        sharding: Optional sharding for the batch axis.
        coupling: "auto" (the default: a grid-aware per-round cost model
            picks the cheaper operator per call), "exact" (O(n^2)
            pairwise Biot-Savart), or "fft" (analytic Fourier transfer
            on a shared grid, O(n + G^2 log G) per film pair; requires
            films on distinct layer heights).  The cost model is
            documented at :func:`_resolve_auto_coupling` (see
            :func:`_resolve_auto_coupling` and docs/COUPLING.md; setting
            SUPERSCREEN_TPU_FFT_COUPLING_MIN_N to a site count restores
            plain threshold dispatch -- and falls back to "exact" when
            layer heights coincide).
            Agreement between the two is limited by FFT wraparound
            (~7e-3 per application at the default padding) and the
            mesh's own quadrature error.
        keep_history: Record every self-consistent iteration and return a
            list of ``iterations + 1`` :class:`SweepResult` objects (one
            per iteration, each covering the whole batch) instead of just
            the final state.  The whole history is still ONE device
            program and one device-to-host transfer.
        final_refine: Number of float64 polish steps applied to the FINAL
            per-film linear systems after the sweep
            (:func:`superscreen_tpu.certify.refine_sweep_f64`).  The
            in-sweep f32 refinement floors at ~5e-5 relative residual at
            100k-vertex scale; 2 polish steps reach the ~1e-9 floor for a
            few seconds of extra wall time (current densities and
            self-fields are recomputed from the polished streams).  Only
            supported with ``keep_history=False``; vortex and matrix-free
            films are passed through unchanged.
        result_dtype: dtype of the DELIVERED arrays (streams, current
            densities, self-fields).  ``None`` (default) delivers float64
            whenever ``final_refine > 0`` -- preserving the polished
            iterate so the delivered residual sits at the ~1e-9 polish
            floor instead of the f32 representation limit (~1.5e-5 at
            100k scale) -- and the device ``solve_dtype`` otherwise
            (matching the reference's ``solve_dtype`` delivery contract,
            reference ``device/device.py:57,117-127``).  Pass
            ``"float32"`` to keep f32 storage for polished sweeps (half
            the host memory; the polish still improves the f32 streams to
            the representation floor).
        vortex_nPhi0: Per-sweep-point vortex amplitudes, overriding each
            vortex's declared ``nPhi0``: a ``(B, n_vortices)`` array
            ordered like the flattened ``vortices`` grouped by film (the
            order of ``[v for vs in model.vortices.values() for v in
            vs]``), or ``{film_name: (B, n_film_vortices)}``.  Rows of
            one-hot amplitudes sweep the vortex POSITION over the
            declared candidate sites in one batched solve (vortex
            localization); integer rows sweep winding-number states.

    Returns:
        A :class:`SweepResult`, or a list of them if ``keep_history``.

    Notes:
        The fused runner applies cheap shortcuts to the INNER
        self-consistent rounds by default (no iterative refinement,
        bf16x3 coupling dots, interior-site-only coupling evaluation);
        only the final round runs at full precision.  This relies on the
        inter-film coupling being a contraction: inner-round error is
        damped like ``eps / (1 - rho)`` with ``rho`` the coupling
        spectral radius, so for STRONGLY coupled geometries (films at
        very small layer separation, slowly converging iterations) the
        accumulated inner error can grow beyond the certified benchmark
        config.  For such devices, restore full-precision inner rounds
        via ``SUPERSCREEN_TPU_INNER_REFINE=<refine_steps>`` and
        ``SUPERSCREEN_TPU_INNER_COUPLING_PRECISION=float32`` (and verify
        with :func:`superscreen_tpu.certify.certify_sweep` or
        ``final_refine``); docs/COUPLING.md documents the A/B
        measurements behind the defaults.
    """
    if model is None:
        if device is None:
            raise ValueError("Either a model or a device must be provided.")
        model = factorize_model(
            device=device,
            current_units=current_units,
            vortices=vortices,
        )
    elif vortices is not None:
        raise ValueError(
            "If model is provided, vortices must be None -- bake them in "
            "with factorize_model(vortices=...) or model.set_vortices(...)."
        )
    device = model.device
    current_units = model.current_units
    dtype = device.solve_dtype
    films = list(device.films)
    film_data = _get_sweep_data(model)
    if final_refine and keep_history:
        raise ValueError(
            "final_refine is not supported with keep_history=True (polish "
            "applies to the final state only)."
        )
    if result_dtype is not None and keep_history:
        raise ValueError(
            "result_dtype is not supported with keep_history=True (the "
            "history path stores the sweep's native dtype)."
        )
    if coupling == "auto":
        coupling = _resolve_auto_coupling(model, films, iterations)
    if coupling == "fft" and (len(films) < 2 or iterations == 0):
        # FFT coupling only matters for inter-film rounds; with one film or
        # zero iterations no coupling ever runs, so fall back to the exact
        # path instead of building (and later dereferencing) absent grids.
        coupling = "exact"
    if coupling == "fft" and iterations > 0 and len(films) > 1:
        film_data = _attach_fft_grids(model, film_data, films)

    field_conversion = field_conversion_factor(
        field_units, current_units, length_units=device.length_units,
        ureg=device.ureg,
    ).magnitude

    # Evaluate the applied fields into (B, n) arrays per film.
    if (applied_fields is None) == (applied_field_arrays is None):
        raise ValueError(
            "Provide exactly one of applied_fields or applied_field_arrays."
        )
    Hz_applied = {}
    if applied_field_arrays is not None:
        for name in films:
            arr = applied_field_arrays[name]
            if isinstance(arr, jax.Array):
                # Device-resident input (e.g. squids.applied_field_maps):
                # keep it on device -- np.asarray here would force a
                # device->host round-trip just to re-upload for the solve.
                arr = arr.astype(dtype)
            else:
                arr = np.asarray(arr, dtype=dtype)
            if arr.ndim != 2 or arr.shape[1] != len(device.meshes[name].sites):
                raise ValueError(
                    f"applied_field_arrays[{name!r}] must have shape "
                    f"(B, {len(device.meshes[name].sites)}), got {arr.shape}."
                )
            Hz_applied[name] = arr * field_conversion
        batch_sizes = {name: a.shape[0] for name, a in Hz_applied.items()}
        if len(set(batch_sizes.values())) > 1:
            raise ValueError(
                "applied_field_arrays must share one batch size across "
                f"films, got {batch_sizes}."
            )
        B = next(iter(Hz_applied.values())).shape[0]
        applied_field_funcs = None
    else:
        B = len(applied_fields)
        applied_field_funcs = list(applied_fields)
        for name in films:
            mesh = device.meshes[name]
            layer = device.layers[model.film_info[name].layer]
            z0 = layer.z0 * np.ones(len(mesh.sites))
            rows = [
                np.broadcast_to(
                    np.squeeze(
                        np.asarray(f(mesh.sites[:, 0], mesh.sites[:, 1], z0))
                    ),
                    (len(mesh.sites),),
                )
                for f in applied_field_funcs
            ]
            Hz_applied[name] = (
                np.stack(rows, axis=0).astype(dtype) * field_conversion
            )

    # Circulating currents: (B, n_holes) per film.
    hole_names_by_film = {name: film_data[name].hole_names for name in films}
    I_circ = {}
    circ_dicts = None
    if circulating_currents is not None:
        if len(circulating_currents) != B:
            raise ValueError(
                f"circulating_currents must have length B={B}, got "
                f"{len(circulating_currents)}."
            )
        from .solver.utils import currents_to_floats

        circ_dicts = [
            currents_to_floats(c, device.ureg, current_units)
            for c in circulating_currents
        ]
        for name in films:
            holes = hole_names_by_film[name]
            I_circ[name] = np.array(
                [[c.get(h, 0.0) for h in holes] for c in circ_dicts], dtype=dtype
            )
    else:
        for name in films:
            holes = hole_names_by_film[name]
            row = np.array(
                [model.circulating_currents.get(h, 0.0) for h in holes],
                dtype=dtype,
            )
            I_circ[name] = np.broadcast_to(row, (B, len(holes))).copy()

    vortex_flux = (
        device.ureg("Phi_0 / mu_0")
        .to(f"{current_units} * {device.length_units}")
        .magnitude
    )

    vortex_amps_flat = None
    if vortex_nPhi0 is not None:
        film_data, vortex_amps_flat = _apply_vortex_amplitudes(
            model, film_data, vortex_nPhi0, B, dtype
        )

    term_dicts = None
    if terminal_currents is not None:
        film_data, term_dicts = _apply_terminal_sweeps(
            model, film_data, terminal_currents, B, dtype, current_units
        )

    if sharding is not None:
        Hz_applied = {
            k: jax.device_put(v, sharding) for k, v in Hz_applied.items()
        }
        I_circ = {k: jax.device_put(v, sharding) for k, v in I_circ.items()}

    if keep_history:
        # History recording only exists as a fused single program; honor
        # the user's intent behind SUPERSCREEN_TPU_FUSED_SWEEP=0 with a
        # heads-up rather than silently compiling the big program.
        import os

        if os.environ.get("SUPERSCREEN_TPU_FUSED_SWEEP", "1") != "1":
            logger.warning(
                "keep_history=True always uses the fused single-program "
                "runner (no staged history path); expect the one-time "
                "fused compile despite SUPERSCREEN_TPU_FUSED_SWEEP=0."
            )
        gs, Js_h, sfs, others_h = _run_sweep_history(
            film_data, Hz_applied, I_circ, vortex_flux, iterations,
            refine_steps, coupling,
        )
        # One packed transfer for the whole (I+1, B, ...) history.
        gs, Js_h, sfs, others_h = jax.device_get((gs, Js_h, sfs, others_h))
        inv = 1.0 / field_conversion
        applied_host = {k: np.asarray(v) * inv for k, v in Hz_applied.items()}
        multi = len(films) > 1 and iterations > 0
        return [
            SweepResult(
                model=model,
                streams={k: v[it] for k, v in gs.items()},
                current_densities={k: v[it] for k, v in Js_h.items()},
                self_fields={k: v[it] * inv for k, v in sfs.items()},
                applied_fields=applied_host,
                other_fields=(
                    {k: v[it] * inv for k, v in others_h.items()}
                    if multi
                    else None
                ),
                field_units=field_units,
                current_units=current_units,
                applied_field_funcs=applied_field_funcs,
                circulating_currents=circ_dicts,
                vortex_nPhi0=vortex_amps_flat,
                terminal_currents=term_dicts,
            )
            for it in range(iterations + 1)
        ]

    streams, Js, self_fields, others = _run_sweep(
        film_data, Hz_applied, I_circ, vortex_flux, iterations, refine_steps,
        coupling,
    )

    polish_report = None
    if final_refine:
        from .certify import refine_sweep_f64, sweep_outputs_from_streams

        multi = len(films) > 1 and iterations > 0
        deliver = result_dtype if result_dtype is not None else "float64"
        streams, polish_report = refine_sweep_f64(
            film_data,
            streams,
            others if multi else None,
            Hz_applied,
            I_circ,
            steps=final_refine,
            result_dtype=deliver,
        )
        # Current densities and self-fields follow the polished streams
        # (computed under x64 so f64 delivery is not silently downcast).
        Js, self_fields = sweep_outputs_from_streams(film_data, streams)
    elif result_dtype is not None:
        # Host-side cast (a device astype to f64 without x64 would
        # silently stay f32); without a polish this only changes storage.
        dt = np.dtype(result_dtype)
        streams = {k: np.asarray(v).astype(dt) for k, v in streams.items()}
        Js = {k: np.asarray(v).astype(dt) for k, v in Js.items()}
        self_fields = {
            k: np.asarray(v).astype(dt) for k, v in self_fields.items()
        }

    # Convert fields back to field_units for storage.  The device arrays
    # come back through ONE packed transfer per dtype group instead of
    # one per (film, quantity): on a tunneled TPU every device->host
    # round-trip costs 0.05-1 s of channel latency, which dominated warm
    # scanning sweeps (the same lesson as solve()'s packed history
    # transfer, solver/solve.py).
    multi = len(films) > 1 and iterations > 0
    streams, Js, self_fields, others_h, Hz_h = _device_get_packed(
        streams, Js, self_fields, others if multi else None, Hz_applied
    )
    inv = 1.0 / field_conversion
    result = SweepResult(
        model=model,
        streams=streams,
        current_densities=Js,
        self_fields={k: v * inv for k, v in self_fields.items()},
        applied_fields={k: np.asarray(v) * inv for k, v in Hz_h.items()},
        other_fields=(
            {k: v * inv for k, v in others_h.items()} if multi else None
        ),
        field_units=field_units,
        current_units=current_units,
        applied_field_funcs=applied_field_funcs,
        circulating_currents=circ_dicts,
        vortex_nPhi0=vortex_amps_flat,
        terminal_currents=term_dicts,
    )
    result.final_refine_report = polish_report
    return result


def _device_get_packed(*dicts):
    """Materializes several ``{film: device_array}`` dicts to host NumPy
    with one packed transfer per dtype group (``None`` dicts pass
    through).  Host arrays join the output untouched -- only device
    arrays are packed."""
    # Collect device-array leaves grouped by dtype.
    groups = {}  # dtype -> list of (dict_idx, key, shape)
    for di, d in enumerate(dicts):
        if d is None:
            continue
        for k, v in d.items():
            if isinstance(v, jax.Array):
                groups.setdefault(jnp.dtype(v.dtype), []).append((di, k, v))
    flat = {}
    for dt, entries in groups.items():
        packed = np.asarray(
            jnp.concatenate([jnp.ravel(v) for _, _, v in entries])
        )
        offset = 0
        for di, k, v in entries:
            size = int(np.prod(v.shape))
            # np.array copy: keeps each returned array independently
            # writable (downstream matplotlib tri interpolators write in
            # place) -- host-speed, trivial next to the transfer.
            flat[(di, k)] = np.array(
                packed[offset : offset + size]
            ).reshape(v.shape)
            offset += size
    out = []
    for di, d in enumerate(dicts):
        if d is None:
            out.append(None)
            continue
        # NOTE: no dict.get with a default here -- a `flat.get(key,
        # np.asarray(v))` default is evaluated EAGERLY, which would issue
        # one blocking device->host transfer per array ON TOP of the
        # packed one and defeat this function's entire purpose.
        out.append(
            {
                k: (
                    flat[(di, k)]
                    if (di, k) in flat
                    else (v if isinstance(v, np.ndarray) else np.asarray(v))
                )
                for k, v in d.items()
            }
        )
    return out
