"""Dense linear algebra with backend dispatch.

On TPU, LU factorization and solves run on device via ``jax.scipy.linalg``
(XLA). On the CPU backend (tests, machines without accelerators), they fall
back to scipy/LAPACK, which is much faster than XLA's CPU lowering of LU.

All solves use safeguarded fixed-count iterative refinement so float32 TPU
solves reach near machine-precision backward error: residual matvecs run at
the disciplined f32 matmul precision (never the TPU-default single bf16
pass), and the returned iterate is the one with the smallest residual, so
refinement can never make an answer worse.
"""

import logging
import os
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import kernels

logger = logging.getLogger("solve")

#: Matmul precision for the O(n^3) factorization matmuls (blocked
#: triangular inverse, Schur-complement recursion).  The factorization
#: error these introduce is wiped by the f32 exact-residual refinement at
#: solve time (contraction factor = ||I + A M|| ~ the M error), so a
#: single-pass bf16 MXU matmul (measured 2.4x faster than the 6-pass f32
#: lowering, n=14.5k: 0.178 s vs 0.423 s) is the default.  Set
#: SUPERSCREEN_TPU_FACTOR_PRECISION=float32 for f32-quality factors.
FACTOR_PRECISION = os.environ.get(
    "SUPERSCREEN_TPU_FACTOR_PRECISION", "bfloat16"
)


def _fdot(a, b):
    return jnp.dot(a, b, precision=FACTOR_PRECISION)

__all__ = [
    "lu_factor",
    "lu_solve",
    "lu_solve_refined",
    "LU_MAX_N_TPU",
    "brandt_matvec",
    "brandt_cg_solve",
    "brandt_cg_solve_host",
    "brandt_bicgstab_solve",
    "brandt_bicgstab_solve_host",
]

#: XLA's TPU LuDecompositionBlock custom call allocates a multi-buffered
#: (n, 128) panel in scoped VMEM (16 MB limit); measured on v5e it runs out
#: at n = 14336 (20.97 MB requested), so the cap sits safely below that.
#: Larger systems use the Cholesky-based explicit inverse instead.
LU_MAX_N_TPU = 12288


def _on_cpu() -> bool:
    return jax.default_backend() == "cpu"


#: XLA's TPU TriangularSolve lowers pathologically for RHS narrower than
#: one sublane: a single-column lu_solve at n=4.4k measured 517 s to
#: COMPILE, versus 3.8 s with 8 columns.  Every triangular-solve-based
#: entry point pads its RHS to at least this many columns (zeros solve to
#: zeros) and slices back.
_MIN_RHS_COLS = 8


def _widen_rhs(h):
    """Pad a (n,) or (n, k<8) right-hand side to (n, >=8) columns.
    Returns ``(h_padded, restore)`` where ``restore`` undoes the widening.
    Shape logic only -- safe inside jit (shapes are static)."""
    squeeze = h.ndim == 1
    if squeeze:
        h = h[:, None]
    k = h.shape[1]
    if k < _MIN_RHS_COLS:
        h = jnp.pad(h, ((0, 0), (0, _MIN_RHS_COLS - k)))

    def restore(x):
        x = x[:, :k]
        return x[:, 0] if squeeze else x

    return h, restore


@jax.jit
def _jax_lu_factor(neg_A):
    return jax.scipy.linalg.lu_factor(neg_A)


def _refine_safeguarded(solve, A, h, x, steps: int):
    """Iterative refinement of ``(-A) x = h`` that returns, per RHS column,
    the iterate with the smallest residual norm.

    The residual matvec runs at the disciplined f32 precision
    (:func:`kernels._dot`) -- at TPU-default precision it would be a
    single bf16 pass whose ~3e-3 noise, amplified through the solve,
    makes refinement DIVERGE (measured: a 14.5k-site film went from 5e-3
    to 2.7 relative error in one step; with an f32 residual the same
    system contracts by ~1e-5 per step).  The safeguard costs one extra
    ``A @ x`` matvec and guarantees the refined answer is never worse
    than any iterate, including the unrefined one.
    """
    r = h + kernels._dot(A, x)  # residual of (-A) x = h
    best_x = x
    best_r2 = jnp.sum(r * r, axis=0)
    for _ in range(steps):
        x = x + solve(r)
        r = h + kernels._dot(A, x)
        r2 = jnp.sum(r * r, axis=0)
        take = r2 < best_r2
        best_x = jnp.where(take[None, :], x, best_x)
        best_r2 = jnp.minimum(r2, best_r2)
    return best_x


@partial(jax.jit, static_argnames=("refine_steps",))
def _jax_lu_solve_refined(A, lu, piv, h, refine_steps: int = 2):
    # The system/factorization may be identity-padded to a shared shape
    # (the pad block is decoupled); pad the RHS with zeros up front and
    # slice the solution at the end.
    n = h.shape[0]
    nip = lu.shape[0]
    if nip != n:
        widths = [(0, nip - n)] + [(0, 0)] * (h.ndim - 1)
        h = jnp.pad(h, widths)
    h, restore = _widen_rhs(h)

    def solve(rhs):
        return jax.scipy.linalg.lu_solve((lu, piv), rhs)

    x = _refine_safeguarded(solve, A, h, solve(h), refine_steps)
    return restore(x)[:n]


@jax.jit
def _jax_lu_solve(lu, piv, h):
    h, restore = _widen_rhs(h)
    return restore(jax.scipy.linalg.lu_solve((lu, piv), h))


#: Schulz-Hotelling iteration count. On real Brandt systems (cond(P) ~
#: 1e3-1e4) the f32 iteration converges to its ~1.5e-6 floor by iteration
#: ~16-18 and flatlines; 24 leaves margin, and any undershoot is absorbed
#: by the exact-residual refinement at solve time (each step multiplies
#: the error by ||I - PX||).
SCHULZ_ITERS = int(os.environ.get("SUPERSCREEN_TPU_SCHULZ_ITERS", "24"))


@partial(jax.jit, static_argnames=("iters",))
def _jax_spd_inverse(neg_A, w_col, iters: int = SCHULZ_ITERS):
    """Explicit inverse of the Brandt system via Schulz-Hotelling iteration.

    ``A = P diag(w)`` with ``P = A/w`` symmetric positive definite, so the
    inverse of ``P`` is computed by the quadratically convergent iteration
    ``X <- X + X (I - P X)`` seeded with ``I / lambda_max`` (power-iteration
    estimate).  Everything is matmuls: on TPU this compiles in seconds and
    runs on the MXU, where XLA's TriangularSolve at this size takes many
    minutes just to compile.  Returns ``M = -P^{-1} / w`` so that the
    solution of ``(-A) x = h`` is simply ``x = (M @ h) / ...`` -- see
    ``_jax_inv_solve``.  (Validated to machine precision against LU; solves
    are backed by exact-residual iterative refinement.)
    """
    P = -neg_A * (1.0 / w_col)[None, :]
    P = 0.5 * (P + P.T)
    n = P.shape[0]
    # Power iteration for lambda_max.
    v = jnp.ones((n,), dtype=P.dtype) / jnp.sqrt(jnp.asarray(n, P.dtype))

    def power(_, v):
        v = kernels._dot(P, v)
        return v / jnp.linalg.norm(v)

    v = jax.lax.fori_loop(0, 25, power, v)
    lam = v @ kernels._dot(P, v)
    X0 = jnp.eye(n, dtype=P.dtype) / (1.05 * lam)

    def body(_, X):
        # X <- X (2I - P X), written eye-free to avoid materializing an
        # (n, n) identity every iteration.
        Y = kernels._dot(P, X)
        return 2.0 * X - kernels._dot(X, Y)

    X = jax.lax.fori_loop(0, iters, body, X0)
    # Solution operator for (-A) x = h: x = -(X @ h) / w.
    return -(X / w_col[:, None])


def _blocked_tril_inverse(L, b: int):
    """Inverse of a lower-triangular matrix by block forward substitution.

    Everything is (b, b)-block matmuls plus nb small TriangularSolves, so
    XLA maps it onto the MXU; the full-size TriangularSolve (which takes
    minutes to compile on TPU) is never emitted.  ``L.shape[0]`` must be a
    multiple of ``b``.  Matmuls run at :data:`FACTOR_PRECISION`.
    """
    n = L.shape[0]
    nb = n // b
    eye_b = jnp.eye(b, dtype=L.dtype)
    diag_inv = [
        jax.lax.linalg.triangular_solve(
            L[i * b : (i + 1) * b, i * b : (i + 1) * b],
            eye_b,
            left_side=True,
            lower=True,
        )
        for i in range(nb)
    ]
    zero_b = jnp.zeros((b, b), dtype=L.dtype)
    columns = []
    for j in range(nb):
        col = [zero_b] * nb
        col[j] = diag_inv[j]
        for i in range(j + 1, nb):
            row_band = L[i * b : (i + 1) * b, j * b : i * b]  # (b, (i-j)b)
            stacked = jnp.concatenate(col[j:i], axis=0)  # ((i-j)b, b)
            col[i] = -_fdot(diag_inv[i], _fdot(row_band, stacked))
        columns.append(col)
    return jnp.block([[columns[j][i] for j in range(nb)] for i in range(nb)])


def _phase_bounds(nb: int, n_phases: int):
    """Split block indices ``[0, nb)`` into ``<= n_phases`` contiguous
    phases of near-equal length.  Returns the boundary list."""
    phases = max(1, min(n_phases, nb))
    return [round(nb * k / phases) for k in range(phases + 1)]


def _blocked_cholesky_loop(P, b: int, n_phases: int = 4):
    """Lower Cholesky factor of an SPD matrix by uniform-shape left-looking
    block columns: a ``fori_loop`` whose body is one masked panel-update
    matmul, one ``(b, b)`` Cholesky, and one ``(b, b)`` right-side
    TriangularSolve against the ``(n, b)`` panel.

    The XLA TPU lowering of a full-size ``jnp.linalg.cholesky`` takes
    ~39 s to COMPILE at n = 18k (measured, single-core host) and dominates
    cold-start factorization; this loop emits a handful of fixed-shape ops
    instead.  A single full-width loop would multiply against the
    not-yet-computed (zero) block columns of ``L`` every iteration
    (~2 n^3 flops versus n^3/3); to claw most of that back at unchanged
    compile cost, the iteration space is split into ``n_phases`` fori_loops
    whose panel-update width is statically clamped to the widest column
    range any iteration in that phase can actually touch (48% of the
    full-width matmul flops at nb = 9, phases = 4).  Panel updates run at
    the disciplined f32 matmul precision (the factor seeds solve-time
    refinement, whose contraction factor tracks the factor's accuracy).
    ``P.shape[0]`` must be a multiple of ``b``.
    """
    n = P.shape[0]
    nb = n // b
    row_idx = jnp.arange(n)
    bounds = _phase_bounds(nb, n_phases)
    L = jnp.zeros_like(P)
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        if lo == hi:
            continue
        # Iteration i reads block columns k < i of L, so every i in
        # [lo, hi) is covered by the first (hi-1)*b columns; columns of
        # the slice at block index >= i are still zero and add nothing.
        W = max((hi - 1) * b, b)

        def body(i, L, W=W):
            A_col = jax.lax.dynamic_slice(P, (0, i * b), (n, b))
            L_row = jax.lax.dynamic_slice(L, (i * b, 0), (b, W))
            # S = A[:, ci] - sum_{k<i} L[:, ck] @ L[ci, ck]^T
            S = A_col - kernels._dot(L[:, :W], L_row.T)
            D = jax.lax.dynamic_slice(S, (i * b, 0), (b, b))
            Ld = jnp.linalg.cholesky(D)
            # Panel = S @ Ld^{-T}; at the diagonal block this is exactly Ld.
            col = jax.lax.linalg.triangular_solve(
                Ld, S, left_side=False, lower=True, transpose_a=True
            )
            col = jnp.where(row_idx[:, None] >= i * b, col, 0.0)
            return jax.lax.dynamic_update_slice(L, col, (0, i * b))

        L = jax.lax.fori_loop(lo, hi, body, L)
    return L


def _tril_inverse_loop(L, b: int, n_phases: int = 4):
    """Inverse of a lower-triangular matrix by UNIFORM-SHAPE block forward
    substitution: a ``fori_loop`` whose body is one ``(b, H) @ (H, n)``
    matmul plus one ``(b, b)`` TriangularSolve with ``n`` right-hand sides.

    Compared with :func:`_blocked_tril_inverse` (an unrolled pyramid of
    ~nb^2/2 distinctly-shaped matmuls), the compiled program is a few ops
    regardless of ``n`` -- XLA compile time drops from 22.5 s to 7.5 s at
    n = 18k on a single-core host (measured), and cold-start factorization
    is compile-bound.  As in :func:`_blocked_cholesky_loop`, the iteration
    space is split into ``n_phases`` fori_loops so the accumulation height
    ``H`` only spans rows of ``X`` that some iteration of the phase can
    have written (the rest are zero); this recovers ~half of the
    full-width matmul flops at unchanged compile cost.  Matmuls run at
    :data:`FACTOR_PRECISION`.  ``L.shape[0]`` must be a multiple of ``b``.
    """
    n = L.shape[0]
    nb = n // b
    eye_b = jnp.eye(b, dtype=L.dtype)
    bounds = _phase_bounds(nb, n_phases)
    X = jnp.zeros((n, n), dtype=L.dtype)
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        if lo == hi:
            continue
        # Iteration i reads rows k < i of X: the first (hi-1)*b rows cover
        # every i in [lo, hi); rows at block index >= i are still zero.
        H = max((hi - 1) * b, b)

        def body(i, X, H=H):
            row = jax.lax.dynamic_slice(L, (i * b, 0), (b, H))  # L[i, :H]
            # S = sum_{k<i} L[i,k] X[k,:]
            S = _fdot(row, X[:H, :])
            # rhs = -S, with the identity added at block column i.
            rhs = jax.lax.dynamic_update_slice(
                -S,
                eye_b - jax.lax.dynamic_slice(S, (0, i * b), (b, b)),
                (0, i * b),
            )
            L_ii = jax.lax.dynamic_slice(L, (i * b, i * b), (b, b))
            Xi = jax.lax.linalg.triangular_solve(
                L_ii, rhs, left_side=True, lower=True
            )
            return jax.lax.dynamic_update_slice(X, Xi, (i * b, 0))

        X = jax.lax.fori_loop(lo, hi, body, X)
    return X


def _chol_inverse_body(P, w_col, block: int):
    """Shared body: SPD ``P`` -> solution operator ``-P^{-1}/w`` via
    Cholesky + blocked matmul-only triangular inverse
    (``P^{-1} = L^{-T} L^{-1}``)."""
    P = 0.5 * (P + P.T)
    n = P.shape[0]
    b = min(block, n)
    n_pad = -(-n // b) * b
    if n_pad != n:
        # Identity pad block: chol/inverse of blockdiag(P, I) is
        # blockdiag(chol/inv(P), I).
        padded = jnp.eye(n_pad, dtype=P.dtype)
        P = padded.at[:n, :n].set(P)
    L = _blocked_cholesky_loop(P, b)
    L_inv = _tril_inverse_loop(L, b)
    P_inv = _fdot(L_inv.T, L_inv)[:n, :n]
    return -(P_inv / w_col[:, None])


@partial(jax.jit, static_argnames=("block",))
def _jax_chol_explicit_inverse(neg_A, w_col, block: int = 2048):
    """Explicit solution operator ``M`` (``x = M @ h`` solves ``(-A) x = h``)
    via Cholesky factorization plus a blocked matmul-only triangular
    inverse.

    ~2 n^3 flops total versus ~100 n^3 for the Schulz-Hotelling iteration
    (:func:`_jax_spd_inverse`) -- the default large-film factorization on
    TPU.  Accuracy is backed by the same exact-residual refinement at solve
    time as every other factorization kind.
    """
    return _chol_inverse_body(-neg_A * (1.0 / w_col)[None, :], w_col, block)


@partial(jax.jit, static_argnames=("block",))
def _jax_chol_explicit_inverse_from_A(A, w_col, block: int = 2048):
    """Like :func:`_jax_chol_explicit_inverse` but takes the system matrix
    ``A`` directly (solving ``(-A) x = h``): the negation fuses into the
    elementwise ``P`` construction, so no separate ``-A`` buffer is ever
    materialized (each retained (n, n) buffer is ~1.4 GB at 100k-vertex
    scale; HBM is the binding constraint during multi-film factorization).
    """
    return _chol_inverse_body(A * (1.0 / w_col)[None, :], w_col, block)


_jax_chol_explicit_inverse_batch = jax.jit(
    jax.vmap(_jax_chol_explicit_inverse_from_A.__wrapped__, in_axes=(0, 0)),
    static_argnames=(),
)


def _leaf_spd_inverse(P):
    """Direct inverse of a small SPD block: Cholesky, then a (leaf, leaf)
    TriangularSolve against the identity, then ``L^-T L^-1``."""
    L = jnp.linalg.cholesky(P)
    L_inv = jax.lax.linalg.triangular_solve(
        L, jnp.eye(P.shape[0], dtype=P.dtype), left_side=True, lower=True
    )
    return _fdot(L_inv.T, L_inv)


def _schur_recursive_inverse(P, leaf: int):
    """Recursive 2x2-block Schur-complement inverse of an SPD matrix.

    With ``P = [[A, B^T], [B, C]]`` and ``S = C - B A^-1 B^T``::

        P^-1 = [[A^-1 + A^-1 B^T S^-1 B A^-1,  -A^-1 B^T S^-1],
                [        -S^-1 B A^-1,               S^-1    ]]

    Everything above the (leaf, leaf) base case is large matmuls
    (~(4/3) n^3 flops total), which the GSPMD partitioner can shard over a
    device mesh -- unlike a full-size Cholesky/TriangularSolve, which it
    replicates onto every device.  ``P.shape[0]`` must be a multiple of
    ``leaf``.  Matmuls run at :data:`FACTOR_PRECISION`.
    """
    n = P.shape[0]
    blocks = n // leaf
    if blocks <= 1:
        return _leaf_spd_inverse(P)
    h = (blocks // 2) * leaf
    A, Bt, C = P[:h, :h], P[:h, h:], P[h:, h:]
    A_inv = _schur_recursive_inverse(A, leaf)
    AiBt = _fdot(A_inv, Bt)  # A^-1 B^T, shape (h, n-h)
    S = C - _fdot(Bt.T, AiBt)
    S_inv = _schur_recursive_inverse(S, leaf)
    TR = -_fdot(AiBt, S_inv)  # -A^-1 B^T S^-1
    TL = A_inv - _fdot(TR, AiBt.T)
    return jnp.block([[TL, TR], [TR.T, S_inv]])


@partial(jax.jit, static_argnames=("leaf",))
def _jax_schur_explicit_inverse(neg_A, w_col, leaf: int = 2048):
    """Explicit solution operator ``M`` (``x = M @ h`` solves ``(-A) x = h``)
    via the matmul-only recursive Schur inverse.

    Same contract as :func:`_jax_chol_explicit_inverse`, but with every
    O(n^3) op expressed as a plain matmul so the computation shards cleanly
    under GSPMD (:func:`superscreen_tpu.parallel.sharded_spd_inverse`).
    Accuracy is backed by the exact-residual refinement at solve time.
    """
    return _schur_inverse_body(-neg_A * (1.0 / w_col)[None, :], w_col, leaf)


@partial(jax.jit, static_argnames=("leaf",))
def _jax_schur_explicit_inverse_from_A(A, w_col, leaf: int = 2048):
    """Like :func:`_jax_schur_explicit_inverse` but takes the system matrix
    ``A`` directly (the negation fuses into the elementwise ``P``
    construction -- no separate ``-A`` buffer, matching
    :func:`_jax_chol_explicit_inverse_from_A`'s HBM discipline).

    Opt-in on a single device (``SUPERSCREEN_TPU_LARGE_FACTOR=schur``):
    the bare recursion beats the Cholesky + blocked-triangular-inverse
    KERNEL 3.6x at n = 18432 on a v5e (0.13 s vs 0.47 s -- the blocked
    TRTRI's sequential panel dependencies idle the MXU), but its bf16
    error compounds down the Schur complements (7.5e-4 final-round
    residual at the 109k benchmark vs 5.2e-5 for Cholesky), needing the
    f32 Schulz correction below, and the warm factorize is
    assembly-bound anyway -- so the Cholesky pipeline stays the
    single-device default and this path's real home remains the
    GSPMD-sharded factorization.
    """
    return _schur_inverse_body(A * (1.0 / w_col)[None, :], w_col, leaf)


def _schur_inverse_body(P, w_col, leaf: int):
    """Shared body: SPD ``P = A diag(1/w)`` -> solution operator
    ``-P^{-1}/w`` via the matmul-only recursive Schur inverse (same
    contract as :func:`_chol_inverse_body`).

    The recursion's bf16 matmuls compound error down the Schur
    complements (measured 7.5e-4 final-round residual at the 109k
    benchmark vs 5.2e-5 for the Cholesky pipeline), so one
    Schulz-Hotelling correction step follows: ``X <- X + X (I - P X)``
    contracts the inverse error quadratically for two more (bf16)
    matmuls -- still far below the Cholesky pipeline's cost at large n,
    since that pipeline's blocked TRTRI idles the MXU on sequential
    panel dependencies.
    """
    P = 0.5 * (P + P.T)
    n = P.shape[0]
    b = min(leaf, n)
    n_pad = -(-n // b) * b
    Pn = P
    if n_pad != n:
        # Identity pad block: the inverse of blockdiag(P, I) is
        # blockdiag(P^-1, I).
        padded = jnp.eye(n_pad, dtype=P.dtype)
        P = padded.at[:n, :n].set(P)
    P_inv = _schur_recursive_inverse(P, b)[:n, :n]
    # One Schulz correction (eye-free: X(2I - P X) = 2X - X(PX)).  The
    # correction matvecs MUST run at true f32 -- pinned LITERALLY, not
    # through the env-overridable kernels._dot discipline: at bf16 the
    # ~3e-3 residual noise is amplified by ||X|| ~ cond(P) and the
    # "correction" diverges (measured 0.98 relative residual at the 109k
    # benchmark -- the same failure mode as _refine_safeguarded
    # documents), which no MATMUL_PRECISION=bfloat16 speed trade should
    # be able to trigger.
    Y = jnp.dot(Pn, P_inv, precision="float32")
    P_inv = 2.0 * P_inv - jnp.dot(P_inv, Y, precision="float32")
    return -(P_inv / w_col[:, None])


_jax_schur_explicit_inverse_batch = jax.jit(
    jax.vmap(
        _jax_schur_explicit_inverse_from_A.__wrapped__, in_axes=(0, 0, None)
    ),
    static_argnames=("leaf",),
)


#: AOT-compiled large-film factorization executables, keyed by
#: ``(n, dtype_name)`` -- filled by :func:`prewarm_factorization` (a
#: background-thread compile overlapped with system assembly) and consumed
#: by :func:`factor_system`.
_PREWARMED_FACTOR = {}
_PREWARM_THREADS = {}


def prewarm_factorization(n: int, dtype) -> None:
    """Starts compiling the default large-film factorization program
    (:func:`_jax_chol_explicit_inverse_from_A` at shape ``(n, n)``) in a
    daemon thread.

    Cold-start factorization is compile-bound: on TPU the blocked
    triangular inverse takes an order of magnitude longer to compile than
    the multi-film system assembly it follows.  XLA compilation releases
    the GIL, so kicking it off as soon as the shared pad size is known
    overlaps the compile with host prep, transfers, and the assembly
    programs.  :func:`factor_system` joins the thread and calls the AOT
    executable directly (also skipping any jit re-trace).

    No-op when the prewarmed path would not be taken (CPU backend, LU-size
    systems, a non-default method, or an installed factorization mesh), or
    when disabled with ``SUPERSCREEN_TPU_PREWARM_FACTOR=0`` (the overlap
    only pays on multi-core hosts; on a single-core host the background
    compile time-slices against the assembly compiles for no net win).
    """
    if os.environ.get("SUPERSCREEN_TPU_PREWARM_FACTOR", "1") == "0":
        return
    method = _large_factor_method()
    key = (int(n), jnp.dtype(dtype).name, method)
    if key in _PREWARMED_FACTOR or key in _PREWARM_THREADS:
        return
    if _on_cpu() or n <= LU_MAX_N_TPU or method not in ("inv", "schur"):
        return
    from ..parallel import sharding as _psh

    mesh = _psh.factorization_mesh()
    if mesh is not None and mesh.shape.get("model", 1) > 1:
        return
    import threading

    def compile_it():
        try:
            sds_A = jax.ShapeDtypeStruct((n, n), jnp.dtype(dtype))
            sds_w = jax.ShapeDtypeStruct((n,), jnp.dtype(dtype))
            fn = (
                _jax_chol_explicit_inverse_from_A
                if method == "inv"
                else _jax_schur_explicit_inverse_from_A
            )
            _PREWARMED_FACTOR[key] = fn.lower(sds_A, sds_w).compile()
        except Exception as exc:  # pragma: no cover - fall back to jit
            logger.info(f"factorization prewarm failed (falling back): {exc!r}")

    t = threading.Thread(target=compile_it, daemon=True)
    _PREWARM_THREADS[key] = t
    t.start()


def _prewarmed_executable(n: int, dtype, method: str):
    """The AOT factorization executable for ``(n, dtype, method)``,
    joining an in-flight prewarm thread first; None if never prewarmed."""
    key = (int(n), jnp.dtype(dtype).name, method)
    t = _PREWARM_THREADS.pop(key, None)
    if t is not None:
        t.join()
    return _PREWARMED_FACTOR.get(key)


@jax.jit
def _jax_inv_solve(M, h):
    return kernels._dot(M, h)


@partial(jax.jit, static_argnames=("refine_steps",))
def _jax_inv_solve_refined(A, M, h, refine_steps: int = 2):
    n = h.shape[0]
    nip = M.shape[0]
    if nip != n:
        widths = [(0, nip - n)] + [(0, 0)] * (h.ndim - 1)
        h = jnp.pad(h, widths)
    squeeze = h.ndim == 1
    if squeeze:
        h = h[:, None]
    def solve(rhs):
        return kernels._dot(M, rhs)

    x = _refine_safeguarded(solve, A, h, solve(h), refine_steps)
    if squeeze:
        x = x[:, 0]
    return x[:n]


@jax.jit
def _jax_chol_factor(neg_A, w_col):
    # The Brandt operator satisfies A = P @ diag(w) with P = A / w symmetric
    # positive definite (an inductance-like kernel) for homogeneous films;
    # factor P = -neg_A / w.
    P = -neg_A * (1.0 / w_col)[None, :]
    P = 0.5 * (P + P.T)
    return jnp.linalg.cholesky(P)


@jax.jit
def _jax_chol_solve(L, w_col, h):
    # Solve (-A) x = h with A = P diag(w):  P (w x) = -h
    # =>  x = -cho_solve(P, h) / w.
    h, restore = _widen_rhs(h)
    y = restore(jax.scipy.linalg.cho_solve((L, True), h))
    if y.ndim == 2:
        return -y / w_col[:, None]
    return -y / w_col


@partial(jax.jit, static_argnames=("refine_steps",))
def _jax_chol_solve_refined(A, L, w_col, h, refine_steps: int = 2):
    n = h.shape[0]
    nip = L.shape[0]
    if nip != n:
        widths = [(0, nip - n)] + [(0, 0)] * (h.ndim - 1)
        h = jnp.pad(h, widths)
    squeeze = h.ndim == 1
    if squeeze:
        h = h[:, None]

    def solve(rhs):
        return _jax_chol_solve(L, w_col, rhs)

    x = _refine_safeguarded(solve, A, h, solve(h), refine_steps)
    if squeeze:
        x = x[:, 0]
    return x[:n]


@partial(jax.jit, static_argnames=("pad",))
def _jax_pad_neg_A(neg_A, pad: int):
    """Block-diagonal padding of the (already negated) system with -I,
    i.e. A_pad = blockdiag(A, +I), keeping -A_pad/w negative definite and
    A_pad/w positive definite for the Cholesky path."""
    nip = neg_A.shape[0] + pad
    out = -jnp.eye(nip, dtype=neg_A.dtype)
    return out.at[: neg_A.shape[0], : neg_A.shape[0]].set(neg_A)


def lu_factor(neg_A, weights_col=None, pad_to=None) -> Tuple:
    """Factorizes ``-A`` (the matrix passed in is already negated).

    Returns ``(lu, piv)`` (LAPACK-style) on CPU or on TPU up to
    ``LU_MAX_N_TPU``.  For larger systems on TPU, when ``weights_col`` (the
    column scaling such that ``-A / w`` is symmetric positive definite) is
    provided, returns a tagged Cholesky factorization
    ``("chol", L, w_col)`` instead -- XLA's TPU LU panel exceeds scoped
    VMEM beyond ~16k rows, while Cholesky scales to the HBM limit.
    """
    if _on_cpu():
        import scipy.linalg as sla

        lu, piv = sla.lu_factor(np.asarray(neg_A))
        return lu, piv
    n = neg_A.shape[0]
    method = _large_factor_method()
    if pad_to is not None and pad_to > n:
        # Pad to a common shape so multiple films share one compiled
        # factorization/solve; the pad block is the identity (decoupled).
        if weights_col is not None:
            weights_col = np.concatenate(
                [np.asarray(weights_col), np.ones(pad_to - n)]
            ).astype(np.asarray(weights_col).dtype)
        neg_A = _jax_pad_neg_A(jnp.asarray(neg_A), pad_to - n)
        n = pad_to
    if n > LU_MAX_N_TPU:
        if weights_col is None:
            raise ValueError(
                f"XLA TPU LU supports n <= {LU_MAX_N_TPU} (got {n}); pass "
                "weights_col to enable the SPD inverse/Cholesky paths."
            )
        from ..parallel import sharding as _psh

        factor_mesh = _psh.factorization_mesh()
        if factor_mesh is not None and factor_mesh.shape.get("model", 1) > 1:
            # An installed factorization mesh takes precedence over
            # SUPERSCREEN_TPU_LARGE_FACTOR: GSPMD-sharded inverse, rows of
            # P and X split over the model axis, collectives over ICI.
            M = _psh.sharded_spd_inverse(
                factor_mesh, neg_A, jnp.asarray(weights_col)
            )
            return ("inv", M, jnp.asarray(weights_col))
        if method == "chol":
            L = _jax_chol_factor(jnp.asarray(neg_A), jnp.asarray(weights_col))
            return ("chol", L, jnp.asarray(weights_col))
        if method == "schulz":
            M = _jax_spd_inverse(jnp.asarray(neg_A), jnp.asarray(weights_col))
        elif method == "inv":
            # Cholesky + blocked triangular inverse (~2 n^3 flops, ~50x
            # fewer than the Schulz iteration).
            M = _jax_chol_explicit_inverse(
                jnp.asarray(neg_A), jnp.asarray(weights_col)
            )
        else:
            # Opt-in "schur" (and the "cg" fall-through when a dense
            # system was materialized anyway): matmul-only recursive
            # Schur inverse + one f32 Schulz correction -- see
            # _jax_schur_explicit_inverse_from_A for the measured
            # speed/accuracy trade vs the default Cholesky pipeline.
            M = _jax_schur_explicit_inverse(
                jnp.asarray(neg_A), jnp.asarray(weights_col)
            )
        return ("inv", M, jnp.asarray(weights_col))
    out = _jax_lu_factor(jnp.asarray(neg_A))
    return tuple(out)


def _large_factor_method() -> str:
    """Reads and validates SUPERSCREEN_TPU_LARGE_FACTOR (a typo would
    otherwise silently select the default explicit inverse)."""
    method = os.environ.get("SUPERSCREEN_TPU_LARGE_FACTOR", "inv")
    if method not in ("schur", "inv", "chol", "schulz", "cg"):
        raise ValueError(
            f"Unknown SUPERSCREEN_TPU_LARGE_FACTOR {method!r} "
            "(expected 'schur', 'inv', 'chol', 'schulz', or 'cg')."
        )
    return method

def factor_system(A, weights_col, force_sharded: bool = False):
    """Factorizes one film system given the system matrix ``A`` (solves
    are against ``-A``; the negation stays fused on TPU so no extra (n, n)
    buffer is allocated).  Honors SUPERSCREEN_TPU_LARGE_FACTOR like
    :func:`lu_factor`.

    ``force_sharded`` marks a film that exceeds the single-device dense
    ceiling and stayed dense only because a factorization mesh is
    installed (``solve_film._sharded_dense_ceiling``): the GSPMD-sharded
    inverse is then mandatory on EVERY backend -- including CPU, where the
    scipy shortcut would otherwise hide the partitioned program from
    virtual-device validation runs."""
    if force_sharded:
        from ..parallel import sharding as _psh

        factor_mesh = _psh.factorization_mesh()
        if factor_mesh is None or factor_mesh.shape.get("model", 1) <= 1:
            raise ValueError(
                "force_sharded factorization requires an installed "
                "factorization mesh with a model axis > 1 "
                "(parallel.set_factorization_mesh)."
            )
        w = jnp.asarray(weights_col)
        return (
            "inv",
            _psh.sharded_spd_inverse(factor_mesh, -jnp.asarray(A), w),
            w,
        )
    if _on_cpu():
        import scipy.linalg as sla

        return sla.lu_factor(-np.asarray(A))
    n = A.shape[0]
    if n <= LU_MAX_N_TPU:
        return tuple(_jax_lu_factor(-jnp.asarray(A)))
    w = jnp.asarray(weights_col)
    method = _large_factor_method()
    from ..parallel import sharding as _psh

    factor_mesh = _psh.factorization_mesh()
    if factor_mesh is not None and factor_mesh.shape.get("model", 1) > 1:
        # Same precedence as lu_factor: an installed factorization mesh
        # wins over SUPERSCREEN_TPU_LARGE_FACTOR.
        return (
            "inv",
            _psh.sharded_spd_inverse(factor_mesh, -jnp.asarray(A), w),
            w,
        )
    if method == "schulz":
        return ("inv", _jax_spd_inverse(-jnp.asarray(A), w), w)
    if method == "chol":
        return ("chol", _jax_chol_factor(-jnp.asarray(A), w), w)
    exe = _prewarmed_executable(n, w.dtype, method)
    if exe is not None:
        return ("inv", exe(jnp.asarray(A), w), w)
    if method == "inv":
        return ("inv", _jax_chol_explicit_inverse_from_A(jnp.asarray(A), w), w)
    return ("inv", _jax_schur_explicit_inverse_from_A(jnp.asarray(A), w), w)


def lu_factor_batched(As, weights_cols):
    """Factorizes F equally-shaped films in ONE device program: the
    Cholesky + blocked-triangular-inverse pipeline vmapped over the film
    axis (``As (F, n, n)`` system matrices, ``weights_cols (F, n)``).

    Returns a list of F ``("inv", M, w)`` factorizations (device arrays --
    views into the batched result, no extra copies).
    """
    if _on_cpu():
        import scipy.linalg as sla

        return [sla.lu_factor(-np.asarray(A)) for A in np.asarray(As)]
    if _large_factor_method() == "inv":
        Ms = _jax_chol_explicit_inverse_batch(
            jnp.asarray(As), jnp.asarray(weights_cols)
        )
    else:
        Ms = _jax_schur_explicit_inverse_batch(
            jnp.asarray(As), jnp.asarray(weights_cols), 2048
        )
    return [
        ("inv", Ms[i], jnp.asarray(weights_cols[i]))
        for i in range(Ms.shape[0])
    ]


def brandt_matvec(op, x):
    """Matrix-free ``A @ x`` for the Brandt system restricted to a film's
    interior: ``A = (-q_sub + diag(d)) diag(w) - L_lam`` where the q-block
    is assembled tile-by-tile from the gathered interior sites and never
    materialized (``O(block * n)`` memory).

    Args:
        op: Operator pieces: ``sub_sites (ni, 2)``, ``w_sub (ni,)``,
            ``diag (ni,)`` (the regularized Brandt diagonal, computed from
            the FULL site set), and the Lambda-scaled restricted Laplacian
            as COO triplets ``lap_rows/lap_cols/lap_vals``.
        x: ``(ni,)`` or ``(ni, B)``.

    Returns:
        ``A @ x`` with the same shape as ``x``.
    """
    from . import kernels

    x = jnp.asarray(x)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    ni = x.shape[0]
    wx = op["w_sub"][:, None] * x
    Ax = -kernels.q_apply(op["sub_sites"], wx) + op["diag"][:, None] * wx
    # L_lam @ x via segment-sum (rows <- vals * x[cols]).
    contrib = op["lap_vals"][:, None] * x[op["lap_cols"]]
    Ax = Ax - jax.ops.segment_sum(contrib, op["lap_rows"], num_segments=ni)
    if squeeze:
        Ax = Ax[:, 0]
    return Ax


@partial(jax.jit, static_argnames=("tol", "maxiter"))
def brandt_cg_solve(op, h, tol: float = 1e-6, maxiter: int = 1000):
    """Solves ``(-A) x = h`` matrix-free by preconditioned CG.

    ``P = A diag(1/w)`` is symmetric positive definite (an inductance-like
    kernel), so CG runs on ``P y = -h`` with a Jacobi preconditioner and
    ``x = y / w``.  Memory is ``O(block * n)`` -- this is the only path
    once the explicit inverse/Cholesky (O(n^2) storage) exceeds HBM.

    Args:
        op: Operator pieces (see :func:`brandt_matvec`).
        h: ``(ni,)`` or ``(ni, B)`` right-hand sides.
        tol: Relative residual tolerance (per column, on ``P y = -h``).
        maxiter: Iteration cap.

    Returns:
        ``x`` with the same shape as ``h``.
    """
    h = jnp.asarray(h)
    squeeze = h.ndim == 1
    if squeeze:
        h = h[:, None]
    w = op["w_sub"]

    def P_matvec(v):
        return brandt_matvec(op, v / w[:, None])

    # Jacobi preconditioner: diag(P) = diag(A) / w.
    minv = _jacobi_minv(op)

    b = -h
    bnorm = jnp.maximum(jnp.linalg.norm(b, axis=0), 1e-30)
    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = minv * r0
    rz0 = jnp.sum(r0 * z0, axis=0)

    def cond(state):
        _, r, _, _, _, k = state
        res = jnp.max(jnp.linalg.norm(r, axis=0) / bnorm)
        return (k < maxiter) & (res > tol)

    def body(state):
        x, r, z, p, rz, k = state
        Ap = P_matvec(p)
        pAp = jnp.sum(p * Ap, axis=0)
        alpha = jnp.where(jnp.abs(pAp) > 0, rz / pAp, 0.0)
        x = x + alpha[None, :] * p
        r = r - alpha[None, :] * Ap
        z = minv * r
        rz_new = jnp.sum(r * z, axis=0)
        beta = jnp.where(jnp.abs(rz) > 0, rz_new / rz, 0.0)
        p = z + beta[None, :] * p
        return (x, r, z, p, rz_new, k + 1)

    y, _, _, _, _, _ = jax.lax.while_loop(
        cond, body, (x0, r0, z0, z0, rz0, jnp.asarray(0))
    )
    x = y / w[:, None]
    if squeeze:
        x = x[:, 0]
    return x


@partial(jax.jit, static_argnames=("iters",))
def _cg_chunk(op, minv, state, iters: int):
    """Runs ``iters`` fixed PCG iterations (converged columns are held
    stable by the zero-guarded alpha/beta)."""
    w = op["w_sub"]

    def P_matvec(v):
        return brandt_matvec(op, v / w[:, None])

    def body(_, st):
        x, r, z, p, rz = st
        Ap = P_matvec(p)
        pAp = jnp.sum(p * Ap, axis=0)
        alpha = jnp.where(jnp.abs(pAp) > 0, rz / pAp, 0.0)
        x = x + alpha[None, :] * p
        r = r - alpha[None, :] * Ap
        z = minv * r
        rz_new = jnp.sum(r * z, axis=0)
        beta = jnp.where(jnp.abs(rz) > 0, rz_new / rz, 0.0)
        p = z + beta[None, :] * p
        return (x, r, z, p, rz_new)

    return jax.lax.fori_loop(0, iters, body, state)


def _jacobi_minv(op):
    """Jacobi preconditioner diag for ``P = A diag(1/w)``."""
    w = op["w_sub"]
    lam_diag = jax.ops.segment_sum(
        jnp.where(op["lap_rows"] == op["lap_cols"], op["lap_vals"], 0.0),
        op["lap_rows"],
        num_segments=w.shape[0],
    )
    p_diag = op["diag"] - lam_diag / w
    return jnp.where(jnp.abs(p_diag) > 0, 1.0 / p_diag, 1.0)[:, None]


def _warn_if_unconverged(res: float, tol: float, method: str) -> None:
    """Matrix-free solves return the final iterate either way; surface a
    loud diagnostic when the iteration cap was hit before ``tol`` (mirrors
    the dense path's check_inversion warning)."""
    if not np.isfinite(res) or res > tol:
        logger.warning(
            f"Matrix-free {method} solve did NOT converge: final relative "
            f"residual {res:.3e} > tol {tol:.0e}. The returned stream "
            f"function may be inaccurate; consider raising "
            f"SUPERSCREEN_TPU_MAX_MATERIALIZED_N to use a direct solve."
        )


def _bicgstab_state(h):
    """Initial state for the right-preconditioned BiCGStab iteration on
    ``P z' = b`` with ``z = minv * z'`` implicit in the operator."""
    b = -h
    x0 = jnp.zeros_like(b)
    ones = jnp.ones(b.shape[1], dtype=b.dtype)
    return (x0, b, b, jnp.zeros_like(b), jnp.zeros_like(b), ones, ones, ones)


@partial(jax.jit, static_argnames=("iters",))
def _bicgstab_chunk(op, minv, state, iters: int):
    """``iters`` fixed iterations of preconditioned BiCGStab on
    ``P y = b`` (P mildly non-symmetric, e.g. inhomogeneous Lambda).
    State: ``(x, r, rhat, p, v, rho, alpha, omega)`` with x in the
    preconditioned variable; converged/broken-down columns are held stable
    by the zero-guarded scalars."""
    w = op["w_sub"]

    def K_matvec(u):
        # Right preconditioning: apply P (minv u).
        return brandt_matvec(op, (minv * u) / w[:, None])

    def guarded_div(num, den):
        return jnp.where(jnp.abs(den) > 0, num / den, 0.0)

    def body(_, st):
        x, r, rhat, p, v, rho, alpha, omega = st
        rho_new = jnp.sum(rhat * r, axis=0)
        beta = guarded_div(rho_new, rho) * guarded_div(alpha, omega)
        p = r + beta[None, :] * (p - omega[None, :] * v)
        v = K_matvec(p)
        alpha = guarded_div(rho_new, jnp.sum(rhat * v, axis=0))
        s = r - alpha[None, :] * v
        t = K_matvec(s)
        omega = guarded_div(jnp.sum(t * s, axis=0), jnp.sum(t * t, axis=0))
        x = x + alpha[None, :] * p + omega[None, :] * s
        r = s - omega[None, :] * t
        return (x, r, rhat, p, v, rho_new, alpha, omega)

    return jax.lax.fori_loop(0, iters, body, state)


@partial(jax.jit, static_argnames=("tol", "maxiter"))
def brandt_bicgstab_solve(op, h, tol: float = 1e-6, maxiter: int = 500):
    """Solves ``(-A) x = h`` matrix-free by preconditioned BiCGStab.

    Used instead of :func:`brandt_cg_solve` when the operator carries the
    inhomogeneous-Lambda gradient term and is therefore non-symmetric.
    """
    h = jnp.asarray(h)
    squeeze = h.ndim == 1
    if squeeze:
        h = h[:, None]
    w = op["w_sub"]
    minv = _jacobi_minv(op)
    bnorm = jnp.maximum(jnp.linalg.norm(h, axis=0), 1e-30)
    state0 = _bicgstab_state(h)

    def cond(carry):
        st, k = carry
        res = jnp.max(jnp.linalg.norm(st[1], axis=0) / bnorm)
        return (k < maxiter) & (res > tol)

    def body(carry):
        st, k = carry
        return _bicgstab_chunk(op, minv, st, 1), k + 1

    (xp, *_), _ = jax.lax.while_loop(cond, body, (state0, jnp.asarray(0)))
    x = (minv * xp) / w[:, None]
    if squeeze:
        x = x[:, 0]
    return x


def brandt_bicgstab_solve_host(
    op, h, tol: float = 1e-6, maxiter: int = 1000, chunk: int = 25
):
    """Host-chunked variant of :func:`brandt_bicgstab_solve` (bounded
    device programs; see :func:`brandt_cg_solve_host`)."""
    h = jnp.asarray(h)
    squeeze = h.ndim == 1
    if squeeze:
        h = h[:, None]
    w = op["w_sub"]
    minv = _jacobi_minv(op)
    bnorm = jnp.maximum(jnp.linalg.norm(h, axis=0), 1e-30)
    state = _bicgstab_state(h)
    res = np.inf
    done = 0
    while done < maxiter:
        state = _bicgstab_chunk(op, minv, state, min(chunk, maxiter - done))
        done += chunk
        res = float(jnp.max(jnp.linalg.norm(state[1], axis=0) / bnorm))
        if res < tol or not np.isfinite(res):
            break
    _warn_if_unconverged(res, tol, "BiCGStab")
    x = (minv * state[0]) / w[:, None]
    if squeeze:
        x = x[:, 0]
    return x


def brandt_cg_solve_host(
    op, h, tol: float = 1e-6, maxiter: int = 1000, chunk: int = 25
):
    """Like :func:`brandt_cg_solve` but driven from the host in bounded
    chunks of iterations (one tiny device->host residual read per chunk).

    Each chunk is a short-running device program -- required on tunneled /
    time-shared TPUs where a single long-running program (minutes of CG at
    100k+ sites) trips execution watchdogs.
    """
    h = jnp.asarray(h)
    squeeze = h.ndim == 1
    if squeeze:
        h = h[:, None]
    w = op["w_sub"]
    minv = _jacobi_minv(op)
    b = -h
    bnorm = jnp.maximum(jnp.linalg.norm(b, axis=0), 1e-30)
    x0 = jnp.zeros_like(b)
    z0 = minv * b
    state = (x0, b, z0, z0, jnp.sum(b * z0, axis=0))
    done = 0
    res = np.inf
    while done < maxiter:
        state = _cg_chunk(op, minv, state, min(chunk, maxiter - done))
        done += chunk
        res = float(jnp.max(jnp.linalg.norm(state[1], axis=0) / bnorm))
        if res < tol or not np.isfinite(res):
            break
    _warn_if_unconverged(res, tol, "CG")
    x = state[0] / w[:, None]
    if squeeze:
        x = x[:, 0]
    return x


def _matrix_free_solve_host(op, h):
    """Dispatch a host-chunked matrix-free solve: CG for symmetric
    operators, BiCGStab when the operator carries the non-symmetric
    inhomogeneous-Lambda term (tagged via ``op['nonsym']``)."""
    if int(np.asarray(op.get("nonsym", 0))):
        return brandt_bicgstab_solve_host(op, h)
    return brandt_cg_solve_host(op, h)


def _pad_rhs(n_fac, h):
    """Pads the RHS with zeros when the factorization was built from a
    padded (block-diagonal identity) system; returns (padded_h, n_orig)."""
    n = h.shape[0]
    if n == n_fac:
        return h, n
    pad = [(0, n_fac - n)] + [(0, 0)] * (h.ndim - 1)
    return np.pad(np.asarray(h), pad), n


def lu_solve(lu_piv: Tuple, h):
    """Solves ``(-A) x = h`` given a factorization from :func:`lu_factor`.
    ``h`` may be a vector or a matrix of stacked right-hand sides.  If the
    factorization is larger than ``h`` (identity-padded system), the RHS is
    zero-padded and the solution sliced back."""
    if isinstance(lu_piv[0], str) and lu_piv[0] == "cg":
        return np.asarray(_matrix_free_solve_host(lu_piv[1], jnp.asarray(h)))
    if len(lu_piv) == 3 and lu_piv[0] == "chol":
        _, L, w_col = lu_piv
        h, n = _pad_rhs(L.shape[0], h)
        return np.asarray(_jax_chol_solve(L, w_col, jnp.asarray(h)))[:n]
    if len(lu_piv) == 3 and lu_piv[0] == "inv":
        _, M, _w = lu_piv
        h, n = _pad_rhs(M.shape[0], h)
        return np.asarray(_jax_inv_solve(M, jnp.asarray(h)))[:n]
    lu, piv = lu_piv
    h, n = _pad_rhs(lu.shape[0], h)
    if isinstance(lu, np.ndarray):
        import scipy.linalg as sla

        return sla.lu_solve((lu, piv), np.asarray(h))[:n]
    return np.asarray(_jax_lu_solve(lu, piv, jnp.asarray(h)))[:n]


def lu_solve_refined(A, lu_piv: Tuple, h, refine_steps: int = 2):
    """Solves ``(-A) x = h`` with ``refine_steps`` rounds of iterative
    refinement (``x += lu_solve(h + A @ x)``)."""
    if isinstance(lu_piv[0], str) and lu_piv[0] == "cg":
        # CG/BiCGStab control accuracy via their own tolerance; no outer
        # refinement.
        return np.asarray(_matrix_free_solve_host(lu_piv[1], jnp.asarray(h)))
    if len(lu_piv) == 3 and lu_piv[0] == "chol":
        _, L, w_col = lu_piv
        return np.asarray(
            _jax_chol_solve_refined(
                jnp.asarray(A), L, w_col, jnp.asarray(h),
                refine_steps=refine_steps,
            )
        )
    if len(lu_piv) == 3 and lu_piv[0] == "inv":
        _, M, _w = lu_piv
        return np.asarray(
            _jax_inv_solve_refined(
                jnp.asarray(A), M, jnp.asarray(h), refine_steps=refine_steps
            )
        )
    lu, piv = lu_piv
    if isinstance(lu, np.ndarray):
        import scipy.linalg as sla

        A = np.asarray(A)
        h = np.asarray(h)
        n = h.shape[0]
        if lu.shape[0] != n:
            # Identity-padded system: pad the RHS, slice the solution.
            widths = [(0, lu.shape[0] - n)] + [(0, 0)] * (h.ndim - 1)
            h = np.pad(h, widths)
        x = sla.lu_solve((lu, piv), h)
        for _ in range(refine_steps):
            r = h + A @ x
            x = x + sla.lu_solve((lu, piv), r)
        return x[:n]
    return np.asarray(
        _jax_lu_solve_refined(
            jnp.asarray(A), lu, piv, jnp.asarray(h), refine_steps=refine_steps
        )
    )


def _probing_colors(sites, separation: float) -> np.ndarray:
    """Spatial distance-coloring of ``sites`` for inverse-diagonal probing.

    Sites sharing a color are guaranteed to be at least ``separation``
    apart: sites are binned into square cells of side ``separation``, cells
    are classed by their coordinates modulo a 2x2 stride (same-class cells
    are >= ``separation`` apart edge-to-edge), and sites *within* one cell
    get distinct occupancy sub-indices.  The number of colors is therefore
    ``4 * max_cell_occupancy`` -- independent of n for a fixed mesh
    density, which is what makes probing cheaper than n exact solves.

    Returns:
        ``(n,)`` int colors in ``[0, n_colors)``, densely renumbered.
    """
    sites = np.asarray(sites, dtype=float)
    cell = np.floor(sites / float(separation)).astype(np.int64)
    cell -= cell.min(axis=0)  # non-negative for flat keys
    cls = (cell[:, 0] % 2) * 2 + (cell[:, 1] % 2)
    flat = cell[:, 0] * (cell[:, 1].max() + 1) + cell[:, 1]
    order = np.argsort(flat, kind="stable")
    occ = np.empty(len(sites), dtype=np.int64)
    sorted_flat = flat[order]
    # Occupancy rank within each cell: position since the cell's first site.
    starts = np.r_[0, np.flatnonzero(np.diff(sorted_flat)) + 1]
    ranks = np.arange(len(sites)) - np.repeat(
        starts, np.diff(np.r_[starts, len(sites)])
    )
    occ[order] = ranks
    colors = cls * (occ.max() + 1) + occ
    # Dense renumbering (drop unused (class, occupancy) combinations).
    _, dense = np.unique(colors, return_inverse=True)
    return dense


def matrix_free_response_diagonal(
    op,
    *,
    method: str = "auto",
    separation: Optional[float] = None,
    repeats: int = 4,
    chunk: int = 512,
    seed: int = 0,
) -> np.ndarray:
    """Diagonal of ``(-A)^{-1}`` for a matrix-free (CG/BiCGStab) film
    factorization -- the response of a unit probe vortex at its own core,
    per site, without ever materializing the (n, n) inverse.

    Methods:

    - ``"exact"``: solves ``(-A) X = I`` in ``chunk``-column blocks of
      one-hot right-hand sides (n/chunk batched matrix-free solves).
      Exact to the iterative solver's tolerance, cost O(n/chunk) solves --
      use for moderate n or when accuracy is paramount.
    - ``"probing"``: colored-Hutchinson estimator.  Sites are
      distance-colored (:func:`_probing_colors`) so same-color sites are
      >= ``separation`` apart; each repeat draws Rademacher signs ``s``,
      solves one batched system with ``n_colors`` right-hand sides
      ``V[:, c] = s * 1[color == c]``, and reads
      ``d_j ~= s_j * X[j, color_j]``.  The one-repeat estimator is
      *unbiased* with per-site standard deviation
      ``sqrt(sum_{k != j, color_k == color_j} K_jk^2)`` where
      ``K = (-A)^{-1}``; same-color sites are >= ``separation`` apart, so
      this is bounded by the response-column magnitude at that distance
      (the screened vortex stream decays ~1/r beyond the Pearl length) and
      shrinks a further ``1/sqrt(repeats)``.  Widen ``separation`` /
      raise ``repeats`` to tighten.
    - ``"auto"``: ``"exact"`` when n <= 8192, else ``"probing"``.

    Args:
        op: Matrix-free operator pieces (see :func:`brandt_matvec`).
        method: ``"auto"`` | ``"exact"`` | ``"probing"``.
        separation: Probing color separation in device length units
            (default: 16x the median site spacing).
        repeats: Independent sign draws averaged in probing mode.
        chunk: Columns per batched solve in exact mode.
        seed: RNG seed for the probing signs (deterministic by default).

    Returns:
        ``(n,)`` float64 diagonal of ``(-A)^{-1}``.
    """
    sites = np.asarray(op["sub_sites"], dtype=float)
    n = sites.shape[0]
    if method == "auto":
        method = "exact" if n <= 8192 else "probing"
    if method == "exact":
        diag = np.empty(n, dtype=float)
        eye_dtype = np.asarray(op["w_sub"]).dtype
        for start in range(0, n, chunk):
            cols = np.arange(start, min(start + chunk, n))
            E = np.zeros((n, len(cols)), dtype=eye_dtype)
            E[cols, np.arange(len(cols))] = 1.0
            X = np.asarray(_matrix_free_solve_host(op, jnp.asarray(E)))
            diag[cols] = X[cols, np.arange(len(cols))]
        return diag
    if method != "probing":
        raise ValueError(f"Unknown diagonal method {method!r}.")
    if separation is None:
        # Median nearest-neighbor spacing from a cheap k-d tree query.
        from scipy.spatial import cKDTree

        d, _ = cKDTree(sites).query(sites, k=2)
        separation = 16.0 * float(np.median(d[:, 1]))
    colors = _probing_colors(sites, separation)
    n_colors = int(colors.max()) + 1
    logger.info(
        "probing response diagonal: n=%d, %d colors, %d repeats",
        n, n_colors, repeats,
    )
    rng = np.random.default_rng(seed)
    est = np.zeros(n, dtype=float)
    eye_dtype = np.asarray(op["w_sub"]).dtype
    rows = np.arange(n)
    for _ in range(repeats):
        signs = rng.choice(np.array([-1.0, 1.0], dtype=eye_dtype), size=n)
        V = np.zeros((n, n_colors), dtype=eye_dtype)
        V[rows, colors] = signs
        X = np.asarray(_matrix_free_solve_host(op, jnp.asarray(V)))
        est += signs * X[rows, colors]
    return est / repeats
