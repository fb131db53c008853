"""Full-scale accuracy certification of sweep results, device-resident.

The reference package offers a runtime inversion self-check on every solve
(``check_inversion``, reference ``solver/solve_film.py:533-539``): it
re-multiplies the solved stream function through the system matrix and
warns if ``A @ g + h`` is not ~0.  This module is the benchmark-scale
analog for batched sweeps, designed so the system matrix **never leaves
the device**:

* :func:`certify_sweep` computes, for every film and sweep point, the
  float64 relative residual ``||A g + h|| / ||h||`` of the final
  self-consistent linear system as a *blocked device matvec*: the f32 row
  blocks of ``A`` are upcast to f64 on the fly (f32 -> f64 is exact), the
  accumulation runs in f64 (XLA emulates f64 on TPU; a matvec is tiny
  next to the solve itself), and only the per-point norms are read back.
  A naive host-side check at the 109k-site benchmark config instead reads
  ~1.4 GB/film of system matrix through the device->host channel.
* The same f64 device residual drives **iterative refinement** (f64
  residual, f32 correction solve through the film's own factorization),
  yielding ``refined_stream_delta_max = max ||g_f32 - g_f64|| / ||g_f64||``
  -- the actual forward error of the f32 solves at this scale -- and the
  attainable post-refinement residual floor.
* An independent host-side **sampled-row check** gathers ``n_sample_rows``
  rows of ``A`` (tens of MB, not GB), recomputes those residual entries in
  NumPy float64, and reports the worst disagreement with the device
  residual -- validating the device f64 path end to end.

float64 requires x64 mode; every entry point here enables it through the
THREAD-LOCAL ``jax.enable_x64`` context (never the process-global flag,
which would change promotion semantics under concurrently tracing
threads -- e.g. the library's own first-solve prewarm).  All internal
programs use explicit dtypes, so pre-existing f32 programs are
unaffected.
"""

import logging
import time
from functools import partial
from typing import Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

logger = logging.getLogger("certify")

__all__ = ["certify_sweep", "refine_sweep_f64"]


def _solve_op(data):
    """The film's factorization as a solver: ``x = solve(rhs)`` solves
    ``(-A) x = rhs`` for an ``(nip, B)`` right-hand side (the same
    conventions as ``sweep._solve_film_batch``).

    The factorization arrays are passed as jit ARGUMENTS, never closed
    over: a closed-over device array becomes a compile-time constant, and
    XLA serializing a ~1.4 GB constant into the program wedges compilation
    for minutes at benchmark scale."""
    if data.fac_kind == "inv":
        @jax.jit
        def inv(M, _b, rhs):
            from .ops import kernels

            return kernels._dot(M, rhs)

        return lambda rhs: inv(data.fac_a, data.fac_b, rhs)
    if data.fac_kind == "chol":
        @jax.jit
        def chol(L, w_col, rhs):
            import jax.scipy.linalg as jsla

            from .ops.linalg import _widen_rhs

            rhs, restore = _widen_rhs(rhs)
            y = restore(jsla.cho_solve((L, True), rhs))
            return -y / w_col[:, None]

        return lambda rhs: chol(data.fac_a, data.fac_b, rhs)

    @jax.jit
    def lu(lu_mat, piv, rhs):
        import jax.scipy.linalg as jsla

        from .ops.linalg import _widen_rhs

        rhs, restore = _widen_rhs(rhs)
        return restore(jsla.lu_solve((lu_mat, piv), rhs))

    return lambda rhs: lu(data.fac_a, data.fac_b, rhs)


def _pick_block(nip: int, max_block: int = 2048) -> int:
    """Largest row-block size <= max_block that divides ``nip`` (the padded
    system sizes are multiples of 2048 by construction; odd sizes fall
    back to a single block)."""
    for blk in range(min(max_block, nip), 0, -1):
        if nip % blk == 0:
            return blk
    return nip


@partial(jax.jit, static_argnames=("blk",))
def _residual_f64(A, G64, H64, blk: int):
    """``R = G @ A^T + H`` in float64 with ``A``'s f32 row blocks upcast on
    the fly on device.  ``G64``/``H64``: (B, nip) float64; ``A``: (nip,
    nip) float32.  The transient f64 block is (blk, nip)."""
    nip = A.shape[0]

    def body(i, R):
        Ab = jax.lax.dynamic_slice_in_dim(A, i * blk, blk, axis=0)
        Hb = jax.lax.dynamic_slice_in_dim(H64, i * blk, blk, axis=1)
        Rb = G64 @ Ab.astype(jnp.float64).T + Hb
        return jax.lax.dynamic_update_slice_in_dim(R, Rb, i * blk, axis=1)

    return jax.lax.fori_loop(0, nip // blk, body, jnp.zeros_like(H64))


def _film_rhs_and_streams(data, streams, others, Hz, I_circ):
    """Gathers the film's final interior streams ``G`` and effective RHS
    ``H`` (both (B, nip) float64, on device) such that the solved system is
    ``(-A) G^T = H^T``, i.e. the residual is ``G @ A^T + H``.

    Mirrors ``sweep._solve_film_batch``: hole circulating currents and
    transport-terminal drives enter as stream/effective-field offsets that
    must be subtracted before comparing against the interior system.
    """
    B = streams.shape[0]
    dtype = streams.dtype
    if I_circ is None:
        I_circ = jnp.zeros((B, data.hole_masks.shape[0]), dtype=dtype)
    if data.hole_masks.shape[0]:
        g0 = (I_circ @ data.hole_masks).astype(jnp.float64)
        Ha_eff = (I_circ @ data.hole_ha_vecs).astype(jnp.float64)
    else:
        g0 = jnp.zeros(streams.shape, dtype=jnp.float64)
        Ha_eff = jnp.zeros(streams.shape, dtype=jnp.float64)
    if data.g_offset is not None:
        off_g = data.g_offset
        off_h = data.ha_offset
        if off_g.ndim == 1:
            off_g, off_h = off_g[None, :], off_h[None, :]
        g0 = g0 + off_g.astype(jnp.float64)
        Ha_eff = Ha_eff + off_h.astype(jnp.float64)
    Hz_total = Hz.astype(jnp.float64)
    if others is not None:
        Hz_total = Hz_total + others.astype(jnp.float64)
    nip = data.interior.shape[0]
    valid = (jnp.arange(nip) < data.n_valid)[None, :]
    G = jnp.where(
        valid, (streams.astype(jnp.float64) - g0)[:, data.interior], 0.0
    )
    H = jnp.where(valid, (Hz_total - Ha_eff)[:, data.interior], 0.0)
    return G, H, valid


def refine_sweep_f64(
    film_data,
    streams: Dict[str, "jnp.ndarray"],
    others: Optional[Dict[str, "jnp.ndarray"]],
    Hz_applied: Dict[str, "jnp.ndarray"],
    I_circ: Optional[Dict[str, "jnp.ndarray"]] = None,
    steps: int = 2,
    result_dtype: Optional[str] = None,
):
    """Float64 final polish of finished sweep streams.

    The in-sweep iterative refinement computes its residuals in f32
    (``ops/linalg._refine_safeguarded``), whose rounding floors the
    delivered residual at ~5e-5 relative at the 109k benchmark config
    (measured; more f32 steps do not help).  This pass re-refines ONLY the
    final per-film linear systems with the f64 device residual of
    :func:`certify_sweep` (f32 row blocks of A upcast on device, ~0.3 s
    per film per step at the benchmark scale) -- bringing the delivered
    residual to the ~1e-9 floor for a few seconds of extra wall time,
    without touching the fast path of the self-consistent loop.

    Reference context: the reference has no analog (its solves are plain
    f32 LAPACK LU, ``solver/solve_film.py:530``); the reference's own f64
    delivery path is ``solve_dtype="float64"`` throughout
    (``device/device.py:57,117-127``).  This polish is what makes the
    BASELINE.md "<= 1e-6 rel. error" bar reachable on f32 hardware.

    Args:
        result_dtype: dtype of the returned streams.  ``"float64"``
            preserves the full f64 polished iterate (the delivered
            residual stays at the ~1e-9 polish floor); ``None`` (default)
            keeps the input stream dtype -- for f32 sweeps that casts the
            polished iterate back and floors the DELIVERED residual at
            the f32 representation limit (~1.5e-5 at 100k-vertex scale).

    Returns ``(polished_streams, report)``: ``polished_streams`` is a new
    ``{film: (B, n)}`` dict in ``result_dtype`` with the interior
    entries replaced by the f64-refined solution; ``report`` records the
    pre/post residuals per film.  Matrix-free (CG) and vortex films are
    returned unchanged (cast to ``result_dtype``) and noted.
    """
    report = {
        "steps": int(steps),
        "residual_rel_max_before": 0.0,
        "residual_rel_max_after": 0.0,
        "per_film": {},
    }
    out_dtype = None if result_dtype is None else jnp.dtype(result_dtype)
    polished = dict(streams)
    # THREAD-LOCAL x64 (jax.enable_x64 context), never the process-global
    # flag: a global flip would change promotion semantics under the
    # library's own concurrent prewarm thread (solver/solve.py) mid-trace.
    with jax.enable_x64():
        if out_dtype is not None:
            polished = {
                k: jnp.asarray(v).astype(out_dtype) for k, v in polished.items()
            }
        for name, data in film_data.items():
            if data.A is None or data.fac_kind in ("cg", "bicgstab"):
                report["per_film"][name] = "matrix-free film: skipped"
                continue
            if data.vortex_cols is not None:
                # Vortex response columns add rank-1 terms outside the
                # plain linear system; the residual reconstruction here
                # does not model them.
                report["per_film"][name] = "vortex film: skipped"
                continue
            oth = None if others is None else others[name]
            ic = None if I_circ is None else I_circ[name]
            g_in = jnp.asarray(streams[name])
            G, H, valid = _film_rhs_and_streams(
                data, g_in, oth, jnp.asarray(Hz_applied[name]), ic
            )
            nip = int(data.interior.shape[0])
            blk = _pick_block(nip)
            R = _residual_f64(data.A, G, H, blk)
            h_norms = jnp.linalg.norm(H, axis=1)
            rel_before = float(
                jnp.max(jnp.linalg.norm(R, axis=1) / h_norms)
            )
            solve = _solve_op(data)
            G64 = G
            for _ in range(steps):
                dG = solve(R.astype(data.A.dtype).T).T
                dG = jnp.where(valid, dG, 0.0).astype(jnp.float64)
                G64 = G64 + dG
                R = _residual_f64(data.A, G64, H, blk)
            rel_after = float(jnp.max(jnp.linalg.norm(R, axis=1) / h_norms))
            # Scatter the interior correction back into the full-site
            # streams (offsets g0 are already inside `streams`; only the
            # interior solution changes).
            dtype_here = g_in.dtype if out_dtype is None else out_dtype
            delta = jnp.where(valid, G64 - G, 0.0).astype(dtype_here)
            polished[name] = (
                g_in.astype(dtype_here).at[:, data.interior].add(delta)
            )
            report["per_film"][name] = {
                "residual_rel_before": float(f"{rel_before:.3e}"),
                "residual_rel_after": float(f"{rel_after:.3e}"),
            }
            report["residual_rel_max_before"] = max(
                report["residual_rel_max_before"], rel_before
            )
            report["residual_rel_max_after"] = max(
                report["residual_rel_max_after"], rel_after
            )
    return polished, report


def sweep_outputs_from_streams(film_data, streams: Dict[str, "jnp.ndarray"]):
    """Recomputes current densities and self-fields from (possibly f64)
    polished streams, preserving the stream dtype.

    The gradient/self-field operator entries are f32 (exact when upcast),
    so outputs derived from f64 streams carry the operators' own f32
    assembly error (~1e-7 relative) but none of the f32 *solution*
    rounding -- matching the reference's contract that ``J`` and the
    self-field are plain linear images of the delivered stream
    (reference ``solver/solve_film.py:556-565``).

    Runs under temporarily-enabled x64 so f64 streams are not silently
    downcast; all dtypes are driven by the inputs, so f32 streams come
    back f32.

    Returns ``(current_densities, self_fields)`` dicts keyed like
    ``streams``.
    """
    import contextlib

    from .sweep import _gather_matvec_batch, _self_field_batch

    Js = {}
    self_fields = {}
    # Pure-f32 streams need no x64 context (and would pay recompiles
    # under the different trace context); f64 delivery gets the
    # THREAD-LOCAL jax.enable_x64 (never the process-global flag -- see
    # refine_sweep_f64).
    any_f64 = any(
        jnp.asarray(v).dtype == jnp.float64 for v in streams.values()
    )
    ctx = jax.enable_x64() if any_f64 else contextlib.nullcontext()
    with ctx:
        for name, data in film_data.items():
            g = jnp.asarray(streams[name])
            Jx = _gather_matvec_batch(data.gy_idx, data.gy_w, g)
            Jy = -_gather_matvec_batch(data.gx_idx, data.gx_w, g)
            Js[name] = jnp.stack([Jx, Jy], axis=-1)
            self_fields[name] = _self_field_batch(data, g)
    return Js, self_fields


def certify_sweep(
    film_data,
    streams: Dict[str, "jnp.ndarray"],
    others: Optional[Dict[str, "jnp.ndarray"]],
    Hz_applied: Dict[str, "jnp.ndarray"],
    I_circ: Optional[Dict[str, "jnp.ndarray"]] = None,
    refine_steps: int = 3,
    n_sample_rows: int = 512,
    budget_s: Optional[float] = None,
    seed: int = 42,
) -> dict:
    """Certifies the accuracy of a finished sweep at full scale.

    Args:
        film_data: ``{film_name: FilmSweepData}`` (from
            ``sweep._get_sweep_data`` / ``sweep._film_sweep_data``).
        streams: ``{film_name: (B, n)}`` final stream functions (solver
            units, as returned by ``sweep._run_sweep``).
        others: ``{film_name: (B, n)}`` final field-from-other-films (or
            None for uncoupled solves).
        Hz_applied: ``{film_name: (B, n)}`` applied fields (solver units).
        I_circ: ``{film_name: (B, n_holes)}`` circulating currents (or
            None for zero).
        refine_steps: f64 iterative-refinement rounds used to estimate the
            forward error of the f32 solves.
        n_sample_rows: Rows of ``A`` gathered to the host for the
            independent NumPy f64 spot check (0 disables it).
        budget_s: Optional wall-clock budget; films are certified until it
            is exhausted (at least one film always completes).

    Returns:
        A dict with ``residual_rel_per_film`` / ``residual_rel_max`` (f64
        relative residuals of the delivered f32 streams, max over sweep
        points), ``refined_stream_delta_max`` (f32-vs-f64-refined stream
        distance), ``refined_residual_rel_max`` (post-refinement floor),
        ``sampled_row_rel_disagreement`` (device-vs-host f64 residual
        agreement on the sampled rows, relative to ``||h||``), and
        bookkeeping (films certified, per-film seconds, skip notes).
    """
    t_start = time.perf_counter()
    out = {
        "residual_rel_per_film": {},
        "residual_rel_max": 0.0,
        "refined_stream_delta_max": 0.0,
        "refined_residual_rel_max": 0.0,
        "sampled_row_rel_disagreement": 0.0,
        "n_sample_rows": int(n_sample_rows),
        "films_certified": [],
        "film_seconds": {},
        "method": (
            "device-resident f64: blocked matvec residual with f32 row "
            "blocks of A upcast on device; f64 refinement through the f32 "
            "factorization; independent host f64 check on "
            f"{n_sample_rows} gathered rows"
        ),
    }
    with jax.enable_x64():
        rng = np.random.default_rng(seed)
        for name, data in film_data.items():
            elapsed = time.perf_counter() - t_start
            if (
                out["films_certified"]
                and budget_s is not None
                and elapsed > budget_s
            ):
                out["budget_note"] = (
                    f"budget {budget_s:.0f}s exhausted after {elapsed:.0f}s; "
                    f"certified {len(out['films_certified'])}"
                    f"/{len(film_data)} films"
                )
                break
            if data.A is None or data.fac_kind in ("cg", "bicgstab"):
                out.setdefault("films_skipped", {})[name] = (
                    "matrix-free film (no materialized system)"
                )
                continue
            if data.vortex_cols is not None:
                out.setdefault("films_skipped", {})[name] = (
                    "vortex film (rank-1 response terms outside the "
                    "plain linear system)"
                )
                continue
            t_film = time.perf_counter()
            # Guard each film independently: a tunnel drop on one film must
            # not discard metrics already recorded for the others.
            try:
                oth = None if others is None else others[name]
                ic = None if I_circ is None else I_circ[name]
                G, H, valid = _film_rhs_and_streams(
                    data, jnp.asarray(streams[name]), oth,
                    jnp.asarray(Hz_applied[name]), ic,
                )
                logger.info(
                    "%s: rhs/stream gather done (%.1fs)",
                    name, time.perf_counter() - t_film,
                )
                nip = int(data.interior.shape[0])
                blk = _pick_block(nip)
                R = _residual_f64(data.A, G, H, blk)
                h_norms = jnp.linalg.norm(H, axis=1)
                rel = np.asarray(jnp.linalg.norm(R, axis=1) / h_norms)
                logger.info(
                    "%s: f64 residual done (%.1fs)",
                    name, time.perf_counter() - t_film,
                )
                out["residual_rel_per_film"][name] = [
                    float(f"{v:.3e}") for v in rel
                ]
                out["residual_rel_max"] = max(
                    out["residual_rel_max"], float(np.max(rel))
                )
                out["films_certified"].append(name)
            except Exception as exc:
                out.setdefault("film_errors", {})[name] = repr(exc)
                continue
            # Independent host check on a handful of gathered rows of A.
            try:
                if n_sample_rows:
                    n_valid = int(np.asarray(data.n_valid))
                    rows = np.sort(
                        rng.choice(
                            n_valid,
                            size=min(n_sample_rows, n_valid),
                            replace=False,
                        )
                    )
                    A_rows = np.asarray(
                        jnp.take(data.A, jnp.asarray(rows), axis=0)
                    ).astype(np.float64)
                    G_h = np.asarray(G)
                    H_h = np.asarray(H)
                    r_host = G_h @ A_rows.T + H_h[:, rows]
                    r_dev = np.asarray(R)[:, rows]
                    disagreement = float(
                        np.max(
                            np.linalg.norm(r_host - r_dev, axis=1)
                            / np.asarray(h_norms)
                        )
                    )
                    out["sampled_row_rel_disagreement"] = max(
                        out["sampled_row_rel_disagreement"], disagreement
                    )
                    logger.info(
                        "%s: sampled-row check done (%.1fs)",
                        name, time.perf_counter() - t_film,
                    )
            except Exception as exc:
                out.setdefault("film_errors", {})[f"{name}:sampled"] = repr(exc)
            # f64 refinement through the f32 factorization: forward error.
            try:
                if refine_steps:
                    solve = _solve_op(data)
                    G64 = G
                    Rr = R
                    for step in range(refine_steps):
                        dG = solve(Rr.astype(data.A.dtype).T).T
                        dG = jnp.where(valid, dG, 0.0).astype(jnp.float64)
                        G64 = G64 + dG
                        Rr = _residual_f64(data.A, G64, H, blk)
                        logger.info(
                            "%s: refine step %d done (%.1fs)",
                            name, step + 1, time.perf_counter() - t_film,
                        )
                    rel_ref = np.asarray(jnp.linalg.norm(Rr, axis=1) / h_norms)
                    delta = np.asarray(
                        jnp.linalg.norm(G - G64, axis=1)
                        / jnp.linalg.norm(G64, axis=1)
                    )
                    out["refined_residual_rel_max"] = max(
                        out["refined_residual_rel_max"], float(np.max(rel_ref))
                    )
                    out["refined_stream_delta_max"] = max(
                        out["refined_stream_delta_max"], float(np.max(delta))
                    )
            except Exception as exc:
                out.setdefault("film_errors", {})[f"{name}:refine"] = repr(exc)
            out["film_seconds"][name] = round(time.perf_counter() - t_film, 2)
    return out
