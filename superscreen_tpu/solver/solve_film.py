"""Per-film linear systems and the single-film solve.

API parity with the reference ``superscreen/solver/solve_film.py``, with the
linear algebra moved to XLA:

* LU factorization / solves run on device via ``jax.scipy.linalg``
  (replacing scipy/LAPACK, reference ``solve_film.py:232,253,279``).
* Solves use optional fixed-count iterative refinement
  (``gf += lu_solve(h + A @ gf)``) so float32 TPU solves reach close to
  machine-precision backward error.
* The per-vortex response is computed as one batched ``lu_solve`` over the
  vortex unit vectors instead of materializing the full inverse ``K``
  (reference ``solve_film.py:541-554``).
* The dense O(n^2) Biot-Savart sums are the blocked JAX kernels in
  :mod:`superscreen_tpu.ops.kernels`.
"""

import logging
import os
import time
from dataclasses import dataclass
from functools import lru_cache, partial
from typing import Dict, Optional, Tuple, Union

import h5py
import numpy as np

from ..device import Device
from ..geometry import close_curve, path_vectors
from ..ops import kernels
from ..ops import linalg
from ..solution import FilmSolution
from .utils import FilmInfo, stream_from_terminal_current

logger = logging.getLogger("solve")

__all__ = [
    "LinearSystem",
    "TerminalSystems",
    "factorize_linear_systems",
    "solve_film",
    "solve_for_terminal_current_stream",
]


@dataclass
class LinearSystem:
    r"""The linear system for a film or hole.

    Args:
        A: The matrix
            :math:`\mathbf{Q}\mathbf{w}^T - \Lambda\nabla^2 -
            (\nabla\Lambda)\cdot\nabla`, restricted to ``indices``.
        indices: The mesh indices this system acts on.
        lu_piv: The LU factorization of ``-A``, or None.
        grad_Lambda_term: The :math:`(\nabla\Lambda)\cdot\nabla`
            contribution (0 for homogeneous films).
    """

    A: np.ndarray
    indices: np.ndarray
    lu_piv: Optional[Tuple] = None
    grad_Lambda_term: Union[float, np.ndarray] = 0.0

    def to_hdf5(self, h5group: h5py.Group) -> None:
        # Explicit host copies: serialization is the one place device
        # arrays cross back to the host.
        if self.A is not None:
            h5group["A"] = np.asarray(self.A)
        h5group["indices"] = np.asarray(self.indices)
        if self.lu_piv is not None:
            if isinstance(self.lu_piv[0], str) and self.lu_piv[0] == "cg":
                for key, val in self.lu_piv[1].items():
                    h5group[f"cg_{key}"] = np.asarray(val)
            elif len(self.lu_piv) == 3 and self.lu_piv[0] == "chol":
                h5group["chol_L"] = np.asarray(self.lu_piv[1])
                h5group["chol_w"] = np.asarray(self.lu_piv[2])
            elif len(self.lu_piv) == 3 and self.lu_piv[0] == "inv":
                h5group["inv_M"] = np.asarray(self.lu_piv[1])
                h5group["inv_w"] = np.asarray(self.lu_piv[2])
            else:
                h5group["lu"] = np.asarray(self.lu_piv[0])
                h5group["piv"] = np.asarray(self.lu_piv[1])
        if hasattr(self.grad_Lambda_term, "shape") and np.ndim(
            self.grad_Lambda_term
        ) > 0:
            h5group["grad_Lambda_term"] = np.asarray(self.grad_Lambda_term)
        else:
            h5group.attrs["grad_Lambda_term"] = self.grad_Lambda_term

    @staticmethod
    def from_hdf5(h5group: h5py.Group) -> "LinearSystem":
        A = np.array(h5group["A"]) if "A" in h5group else None
        indices = np.array(h5group["indices"])
        lu_piv = None
        if "cg_sub_sites" in h5group:
            import jax.numpy as jnp

            op = {
                key[len("cg_"):]: jnp.asarray(np.array(h5group[key]))
                for key in h5group
                if key.startswith("cg_")
            }
            lu_piv = ("cg", op)
        elif "lu" in h5group:
            lu_piv = (np.array(h5group["lu"]), np.array(h5group["piv"]))
        elif "chol_L" in h5group:
            import jax.numpy as jnp

            lu_piv = (
                "chol",
                jnp.asarray(np.array(h5group["chol_L"])),
                jnp.asarray(np.array(h5group["chol_w"])),
            )
        elif "inv_M" in h5group:
            import jax.numpy as jnp

            lu_piv = (
                "inv",
                jnp.asarray(np.array(h5group["inv_M"])),
                jnp.asarray(np.array(h5group["inv_w"])),
            )
        if "grad_Lambda_term" in h5group:
            grad_Lambda_term = np.array(h5group["grad_Lambda_term"])
        else:
            grad_Lambda_term = h5group.attrs["grad_Lambda_term"]
        return LinearSystem(
            A, indices, lu_piv=lu_piv, grad_Lambda_term=grad_Lambda_term
        )


@dataclass
class TerminalSystems:
    """The linear systems needed for the transport-current stream function
    of a film with terminals.

    Args:
        film: The film name.
        boundary: System for the film boundary.
        holes: ``{hole_name: system}`` systems for holes in the film.
        film_without_boundary: System for the film interior (incl. holes).
        film_without_boundary_or_holes: System for the film interior
            excluding holes (None if the film has no holes).
    """

    film: str
    boundary: LinearSystem
    holes: Dict[str, LinearSystem]
    film_without_boundary: LinearSystem
    film_without_boundary_or_holes: Optional[LinearSystem] = None

    def to_hdf5(self, h5group: h5py.Group) -> None:
        h5group.attrs["film"] = self.film
        self.boundary.to_hdf5(h5group.create_group("boundary"))
        holes_grp = h5group.create_group("holes")
        for name, system in self.holes.items():
            system.to_hdf5(holes_grp.create_group(name))
        self.film_without_boundary.to_hdf5(
            h5group.create_group("film_without_boundary")
        )
        if self.film_without_boundary_or_holes is not None:
            self.film_without_boundary_or_holes.to_hdf5(
                h5group.create_group("film_without_boundary_or_holes")
            )

    @staticmethod
    def from_hdf5(h5group: h5py.Group) -> "TerminalSystems":
        film = h5group.attrs["film"]
        boundary = LinearSystem.from_hdf5(h5group["boundary"])
        holes = {
            name: LinearSystem.from_hdf5(grp)
            for name, grp in h5group["holes"].items()
        }
        film_without_boundary = LinearSystem.from_hdf5(
            h5group["film_without_boundary"]
        )
        film_without_boundary_or_holes = None
        if "film_without_boundary_or_holes" in h5group:
            film_without_boundary_or_holes = LinearSystem.from_hdf5(
                h5group["film_without_boundary_or_holes"]
            )
        return TerminalSystems(
            film=film,
            boundary=boundary,
            holes=holes,
            film_without_boundary=film_without_boundary,
            film_without_boundary_or_holes=film_without_boundary_or_holes,
        )


def _op_matvec(A, x):
    """Precision-disciplined ``A @ x`` for operator blocks that may live on
    device.  On TPU a plain ``@`` between a device matrix and a host vector
    lowers to a SINGLE bf16 MXU pass (~3e-3 relative error); route those
    through :func:`kernels._dot` instead.  Host numpy operands keep the
    plain (exact) numpy matmul."""
    if isinstance(A, np.ndarray):
        return A @ x
    import jax.numpy as jnp

    return np.asarray(kernels._dot(A, jnp.asarray(x, A.dtype)))


def _build_system_1d(
    Q, weights, Lambda, laplacian, grad_Lambda_term, ix, inhomogeneous=False
):
    """The 'effective applied field' system: all rows, columns ``ix``."""
    if inhomogeneous:
        grad_Lambda = grad_Lambda_term[:, ix]
    else:
        grad_Lambda = 0
    return Q[:, ix] * weights[ix] - Lambda[ix, 0] * laplacian[:, ix] - grad_Lambda


def _build_system_2d(
    Q, weights, Lambda, laplacian, grad_Lambda_term, ix1d, inhomogeneous=False
):
    """The stream-function system restricted to rows and columns ``ix1d``.
    Works for numpy or device (jnp) operator matrices -- the restriction is
    a broadcasted gather, evaluated on device when the inputs live there."""
    rows = np.asarray(ix1d)[:, None]
    cols = np.asarray(ix1d)[None, :]
    if inhomogeneous:
        grad_Lambda = grad_Lambda_term[rows, cols]
    else:
        grad_Lambda = 0
    return (
        Q[rows, cols] * weights[ix1d]
        - Lambda[ix1d, 0] * laplacian[rows, cols]
        - grad_Lambda
    )


def _assemble_lowmem_A_body(
    sub_sites, diag, w_sub, lam_scaled_vals, rows, cols, ni, constrain
):
    """Traced body of the low-memory film-system assembly (see
    :func:`_assemble_lowmem_A`).  ``constrain`` pins the sharding of the
    (nip, nip) intermediates when the system is assembled distributed."""
    import jax.numpy as jnp

    nip = sub_sites.shape[0]
    q_sub = constrain(kernels.q_matrix(sub_sites, dtype=sub_sites.dtype))
    eye = jnp.eye(nip, dtype=bool)
    A = constrain(jnp.where(eye, diag[:, None], -q_sub) * w_sub[None, :])
    A = constrain(A.at[rows, cols].add(-lam_scaled_vals))
    idx = jnp.arange(nip)
    valid = idx < ni
    valid2d = valid[:, None] & valid[None, :]
    # Pad block = +I so that A_pad / w stays positive definite (the
    # Cholesky path factors P = -(-A_pad)/w); the padded equations
    # read (-I) x = 0 -> x = 0.
    pad_block = jnp.where(eye, jnp.asarray(1.0, A.dtype), 0.0)
    return jnp.where(valid2d, A, pad_block)


@lru_cache(maxsize=8)
def _assemble_lowmem_A_jit(out_sharding):
    """One compiled assembly program per output sharding (``None`` =
    single-device).  Module-level cache so repeated factorize calls in one
    process re-trace nothing."""
    import jax

    if out_sharding is None:
        constrain = lambda x: x  # noqa: E731
        return jax.jit(partial(_assemble_lowmem_A_body, constrain=constrain))
    constrain = partial(jax.lax.with_sharding_constraint, shardings=out_sharding)
    return jax.jit(
        partial(_assemble_lowmem_A_body, constrain=constrain),
        out_shardings=out_sharding,
    )


def _assemble_lowmem_A(
    sub_sites, diag, w_sub, lam_scaled_vals, rows, cols, ni, out_sharding=None
):
    """Fused on-device assembly of the low-memory film system:
    ``A = (-q(sub) + diag(d)) * w - scatter(Lambda_j * L_ij)``, padded to a
    shared shape with an identity block (``A_pad = blockdiag(A, -I)``).

    All inputs are padded to common sizes and ``ni`` (the number of valid
    rows/cols) is a traced scalar, so every film shares one compilation.
    Keeping the whole chain in one jit also lets XLA reuse the (nip, nip)
    buffers -- eager assembly holds ~6 live copies and exhausts HBM at
    large n.

    ``out_sharding`` (a ``NamedSharding``, typically row-sharded over the
    factorization mesh's ``model`` axis) assembles the system DISTRIBUTED:
    the output and every (nip, nip) intermediate (q block, scatter target)
    are sharding-constrained, so a film beyond one device's HBM never
    materializes whole anywhere -- each device builds only its row slab.
    """
    return _assemble_lowmem_A_jit(out_sharding)(
        sub_sites, diag, w_sub, lam_scaled_vals, rows, cols, ni
    )


def _assemble_lowmem_fused_body(
    sites_pad, w_pad, n, ixp, lam_scaled_vals, rows, cols, ni
):
    """Single-program assembly of the low-memory film system from the
    shape-padded FULL site set: the Brandt boundary vector ``C``, the
    matrix-free row sums ``q @ w``, the diagonal, the interior gather, the
    q-block, and the Laplacian scatter all trace into ONE jit.

    Compared with :func:`_assemble_lowmem_A` (which takes pre-gathered
    inputs and needs separate per-film-shape ``C_vector`` / ``q_apply``
    dispatches), every input here is padded to sizes SHARED across films,
    so the whole multi-film assembly costs one compilation and one device
    dispatch per film -- the dominant cost of both cold (compile wall) and
    warm (tunnel round-trip latency) factorization.

    Gather pad slots of ``ixp`` point at site 0; the coincident-point rule
    of the q kernel keeps those entries finite and the ``valid2d`` mask
    replaces the whole pad block with the identity regardless.
    """
    import jax.numpy as jnp

    n_pad = sites_pad.shape[0]
    nip = ixp.shape[0]
    dtype = w_pad.dtype
    mask = jnp.arange(n_pad) < n
    w_m = jnp.where(mask, w_pad, jnp.asarray(0.0, dtype))
    C = kernels.C_vector_masked(sites_pad, mask, n)
    q_row_w = kernels.q_apply(sites_pad, w_m)
    diag_full = (C + q_row_w) / jnp.where(mask, w_pad, jnp.asarray(1.0, dtype))
    sub_sites = sites_pad[ixp]
    diag = diag_full[ixp]
    valid = jnp.arange(nip) < ni
    w_sub = jnp.where(valid, w_pad[ixp], jnp.asarray(1.0, dtype))
    q_sub = kernels.q_matrix(sub_sites, dtype=dtype)
    eye = jnp.eye(nip, dtype=bool)
    A = jnp.where(eye, diag[:, None], -q_sub) * w_sub[None, :]
    A = A.at[rows, cols].add(-lam_scaled_vals)
    valid2d = valid[:, None] & valid[None, :]
    # Pad block = +I so that A_pad / w stays positive definite (the
    # Cholesky path factors P = -(-A_pad)/w); the padded equations
    # read (-I) x = 0 -> x = 0.
    pad_block = jnp.where(eye, jnp.asarray(1.0, A.dtype), 0.0)
    return jnp.where(valid2d, A, pad_block)


@lru_cache(maxsize=1)
def _assemble_lowmem_fused_jit():
    import jax

    return jax.jit(_assemble_lowmem_fused_body)


@lru_cache(maxsize=1)
def _assemble_lowmem_sliced_jit():
    """The fused assembly taking the STACKED multi-film inputs plus a film
    index: the per-film gather happens in-program, so the batch loop emits
    no eager slice ops (each would cost its own cold compile and a warm
    dispatch)."""
    import jax

    def sliced(
        i, sites_stack, w_stack, n_arr, ixp_stack, vals_stack, rows_stack,
        cols_stack, ni_arr,
    ):
        return _assemble_lowmem_fused_body(
            sites_stack[i],
            w_stack[i],
            n_arr[i],
            ixp_stack[i],
            vals_stack[i],
            rows_stack[i],
            cols_stack[i],
            ni_arr[i],
        )

    return jax.jit(sliced)


def _padded_film_arrays(film_info, pad_n, dtype):
    """Full film sites/weights zero/one-padded to the shared size ``pad_n``
    (pad sites sit at the origin; every consumer masks them out)."""
    sites_np = np.asarray(film_info.sites, dtype=dtype)
    n = sites_np.shape[0]
    sites_pad = np.zeros((pad_n, 2), dtype=dtype)
    sites_pad[:n] = sites_np
    w_pad = np.ones(pad_n, dtype=dtype)
    w_pad[:n] = np.asarray(film_info.weights, dtype=dtype)
    return sites_pad, w_pad, n


def _restricted_lambda_triplets(film_info, ix, dtype, bucket=None):
    """Scatter triplets of the Lambda terms restricted to ``ix`` (in
    restricted numbering): the Lambda-column-scaled Laplacian plus, for
    inhomogeneous films, the (grad Lambda . grad) term.  ``bucket`` pads
    the triplet count to a shared multiple (zero-valued adds at (0, 0)) so
    same-bucket films share one compiled scatter."""
    ni = len(ix)
    Lambda = np.asarray(film_info.lambda_info.Lambda)
    lap = film_info.laplacian  # COO
    pos = np.full(lap.shape[0], -1, dtype=np.int64)
    pos[ix] = np.arange(ni)
    keep = (pos[lap.rows] >= 0) & (pos[lap.cols] >= 0)
    rows = pos[lap.rows[keep]]
    cols = pos[lap.cols[keep]]
    lam_scaled_vals = (
        lap.vals[keep] * Lambda[lap.cols[keep], 0]
    ).astype(dtype)
    if film_info.lambda_info.inhomogeneous:
        # Inhomogeneous Lambda: the (grad Lambda . grad) term enters the
        # same scatter (both terms are subtracted from A).
        g_rows, g_cols, g_vals = _lowmem_grad_lambda_triplets(film_info, ix)
        rows = np.concatenate([rows, g_rows])
        cols = np.concatenate([cols, g_cols])
        lam_scaled_vals = np.concatenate(
            [lam_scaled_vals, g_vals.astype(dtype)]
        )
    if bucket is not None:
        nnz_pad = -(-len(rows) // bucket) * bucket
        pad = nnz_pad - len(rows)
        rows = np.concatenate([rows, np.zeros(pad, dtype=rows.dtype)])
        cols = np.concatenate([cols, np.zeros(pad, dtype=cols.dtype)])
        lam_scaled_vals = np.concatenate(
            [lam_scaled_vals, np.zeros(pad, dtype=dtype)]
        )
    return rows, cols, lam_scaled_vals


def _build_system_2d_lowmem(
    film_info, ix, pad_to=None, out_sharding=None, pad_n=None
):
    """The stream-function system for a large film without materializing the
    full Brandt kernel: the off-diagonal q-block is assembled directly from
    the gathered sites; the diagonal needs the full row sums ``q @ w`` and
    the boundary vector ``C``, both computed matrix-free.  The result is
    padded to ``pad_to`` with an identity block (decoupled).

    With ``pad_n`` (the shared full-site pad size) on a single device, the
    ENTIRE assembly -- C vector, row sums, diagonal, gather, q-block,
    scatter -- runs as one jitted program whose input shapes are shared by
    every film (:func:`_assemble_lowmem_fused_body`): one compile for the
    whole device, one dispatch per film.  With ``out_sharding`` the (n, n)
    system is instead assembled distributed (see
    :func:`_assemble_lowmem_A`)."""
    import jax.numpy as jnp

    ni = len(ix)
    nip = pad_to or ni
    dtype = np.asarray(film_info.weights).dtype
    rows, cols, lam_scaled_vals = _restricted_lambda_triplets(
        film_info, ix, dtype, bucket=65536 if pad_to is not None else None
    )
    if out_sharding is None and pad_n is not None:
        sites_pad, w_pad, n = _padded_film_arrays(film_info, pad_n, dtype)
        ixp = np.concatenate([ix, np.zeros(nip - ni, dtype=ix.dtype)])
        return _assemble_lowmem_fused_jit()(
            jnp.asarray(sites_pad),
            jnp.asarray(w_pad),
            jnp.asarray(n),
            jnp.asarray(ixp),
            jnp.asarray(lam_scaled_vals),
            jnp.asarray(rows),
            jnp.asarray(cols),
            jnp.asarray(ni),
        )
    sites = jnp.asarray(film_info.sites)
    w = jnp.asarray(film_info.weights)
    C = kernels.C_vector(sites, dtype=sites.dtype)
    q_row_w = kernels.q_apply(sites, w)
    # Padded gather indices: pad slots point at far-away dummy coordinates
    # (distinct, so the q kernel stays finite) and are overwritten with the
    # identity block inside the assembly.
    ixp = np.concatenate([ix, np.zeros(nip - ni, dtype=ix.dtype)])
    sub_sites = np.asarray(sites)[ixp]
    if nip > ni:
        span = float(
            max(np.ptp(np.asarray(sites)[:, 0]), np.ptp(np.asarray(sites)[:, 1]), 1.0)
        )
        dummy = 1e3 * span * (1.0 + np.arange(nip - ni, dtype=dtype))
        sub_sites[ni:, 0] = dummy
        sub_sites[ni:, 1] = dummy
    w_sub = np.concatenate(
        [np.asarray(film_info.weights)[ix], np.ones(nip - ni, dtype=dtype)]
    )
    diag = np.concatenate(
        [
            np.asarray((C[ix] + q_row_w[ix])) / np.asarray(film_info.weights)[ix],
            np.full(nip - ni, 1.0, dtype=dtype),
        ]
    ).astype(dtype)
    return _assemble_lowmem_A(
        jnp.asarray(sub_sites),
        jnp.asarray(diag),
        jnp.asarray(w_sub),
        jnp.asarray(lam_scaled_vals),
        jnp.asarray(rows),
        jnp.asarray(cols),
        jnp.asarray(ni),
        out_sharding=out_sharding,
    )


def _restricted_coo(op, pos, value_scale=None):
    """Restrict a COO operator to the index set encoded by ``pos`` (global
    index -> restricted position, -1 outside), optionally scaling each kept
    value by ``value_scale[global_row]``.  Returns (rows, cols, vals)."""
    keep = (pos[op.rows] >= 0) & (pos[op.cols] >= 0)
    rows_g = op.rows[keep]
    vals = op.vals[keep]
    if value_scale is not None:
        vals = vals * value_scale[rows_g]
    return pos[rows_g], pos[op.cols[keep]], vals


def _lowmem_grad_lambda_triplets(film_info, ix):
    """COO triplets (in restricted numbering) of the inhomogeneous-Lambda
    term ``(grad Lambda) . grad`` restricted to ``ix``:
    ``GL[i, j] = (gx@Lambda)[i] gx[i, j] + (gy@Lambda)[i] gy[i, j]``
    (the low-memory analog of the dense einsum at
    reference ``solver/solve_film.py:183``)."""
    gx, gy = film_info.gradient_coo
    Lambda = np.asarray(film_info.lambda_info.Lambda)[:, 0]
    pos = np.full(gx.shape[0], -1, dtype=np.int64)
    pos[ix] = np.arange(len(ix))
    parts = [
        _restricted_coo(op, pos, value_scale=np.asarray(op.matvec(Lambda)))
        for op in (gx, gy)
    ]
    return tuple(np.concatenate(axis) for axis in zip(*parts))


def _lowmem_operator_pieces(film_info, ix):
    """Matrix-free operator pieces for the interior Brandt system (used by
    the CG path, which never materializes even the (ni, ni) interior
    system): gathered interior sites, weights, the regularized diagonal
    (computed from the FULL site set), and the Lambda-scaled restricted
    Laplacian as COO triplets."""
    import jax.numpy as jnp

    sites = jnp.asarray(film_info.sites)
    w_full = jnp.asarray(film_info.weights)
    Lambda = np.asarray(film_info.lambda_info.Lambda)
    C = kernels.C_vector(sites, dtype=sites.dtype)
    q_row_w = kernels.q_apply(sites, w_full)
    ni = len(ix)
    dtype = np.asarray(film_info.weights).dtype
    sub_sites = np.asarray(sites)[ix].astype(dtype)
    w_sub = np.asarray(film_info.weights)[ix].astype(dtype)
    diag = (np.asarray(C[ix] + q_row_w[ix]) / w_sub).astype(dtype)
    lap = film_info.laplacian
    pos = np.full(lap.shape[0], -1, dtype=np.int64)
    pos[ix] = np.arange(ni)
    keep = (pos[lap.rows] >= 0) & (pos[lap.cols] >= 0)
    rows = pos[lap.rows[keep]]
    cols = pos[lap.cols[keep]]
    vals = (lap.vals[keep] * Lambda[lap.cols[keep], 0]).astype(dtype)
    inhomogeneous = film_info.lambda_info.inhomogeneous
    if inhomogeneous:
        # Fold the (grad Lambda . grad) triplets into the same segment-sum;
        # the resulting operator is mildly non-symmetric, so solves switch
        # from CG to BiCGStab (see linalg.lu_solve).
        g_rows, g_cols, g_vals = _lowmem_grad_lambda_triplets(film_info, ix)
        rows = np.concatenate([rows, g_rows])
        cols = np.concatenate([cols, g_cols])
        vals = np.concatenate([vals, g_vals.astype(dtype)])
    return {
        "sub_sites": jnp.asarray(sub_sites),
        "w_sub": jnp.asarray(w_sub),
        "diag": jnp.asarray(diag),
        "lap_rows": jnp.asarray(rows),
        "lap_cols": jnp.asarray(cols),
        "lap_vals": jnp.asarray(vals),
        "nonsym": jnp.asarray(1 if inhomogeneous else 0),
    }


def _coo_matvec_host(op, x):
    """Host (numpy) COO matvec.  Used where the result is consumed on the
    host and the work is O(nnz): on a tunneled TPU a device round-trip
    (two ~20-30 ms transfers) costs far more than the arithmetic."""
    rows = np.asarray(op.rows)
    vals = np.asarray(op.vals)
    cols = np.asarray(op.cols)
    return np.bincount(
        rows, weights=vals * np.asarray(x, dtype=float)[cols],
        minlength=op.shape[0],
    )


def _hole_host_part(film_info, mask):
    """Host-side terms of a hole's effective-field vector (subtracted from
    the device Q term): the Lambda-masked Laplacian matvec plus, for
    inhomogeneous films, the (grad Lambda . grad) corrections -- all
    O(nnz) sparse work."""
    Lambda = np.asarray(film_info.lambda_info.Lambda)[:, 0]
    out = _coo_matvec_host(film_info.laplacian, Lambda * mask)
    if film_info.lambda_info.inhomogeneous and film_info.gradient_coo is not None:
        gx, gy = film_info.gradient_coo
        out = out + _coo_matvec_host(gx, Lambda) * _coo_matvec_host(gx, mask)
        out = out + _coo_matvec_host(gy, Lambda) * _coo_matvec_host(gy, mask)
    return out


def _hole_Q_fused_body(sites_pad, w_pad, n, vec_mask):
    """Device part of a hole's effective-field vector on the shape-padded
    full site set: ``Q @ (w * vec_mask)`` with the Brandt diagonal built
    in-program (the row sums ``q @ w`` ride along as an extra q column).
    The sparse Laplacian/gradient terms are host work
    (:func:`_hole_host_part`)."""
    import jax.numpy as jnp

    n_pad = sites_pad.shape[0]
    dtype = w_pad.dtype
    mask = jnp.arange(n_pad) < n
    w_m = jnp.where(mask, w_pad, jnp.asarray(0.0, dtype))
    vec = w_m * vec_mask
    qV = kernels.q_apply(sites_pad, jnp.stack([vec, w_m], axis=1))
    C = kernels.C_vector_masked(sites_pad, mask, n)
    diag = (C + qV[:, 1]) / jnp.where(mask, w_pad, jnp.asarray(1.0, dtype))
    return jnp.where(mask, -qV[:, 0] + diag * vec, jnp.asarray(0.0, dtype))


@lru_cache(maxsize=1)
def _holes_Q_batched_jit():
    """All holes of all films in ONE scanned program: each step gathers its
    film's padded sites/weights from the stacked inputs, so one compile and
    one dispatch cover every hole (results stay on device -- factorization
    performs no device->host readback)."""
    import jax

    def batched(sites_stack, w_stack, n_arr, fidx, vec_masks):
        def one(args):
            f, vm = args
            return _hole_Q_fused_body(sites_stack[f], w_stack[f], n_arr[f], vm)

        return jax.lax.map(one, (fidx, vec_masks))

    return jax.jit(batched)


def _hole_effective_field_vector_lowmem(film_info, ix):
    """Effective-field vector for unit circulating current in a hole:
    ``(Q[:, ix] w[ix] - Lambda[ix] L[:, ix] - GL[:, ix]) @ 1``, computed
    matrix-free as ``Q @ (w mask) - L @ (Lambda mask) - GL @ mask``.

    Eager path (used by matrix-free CG films and distributed-assembly
    films); materializing films batch the device part through
    :func:`_assemble_lowmem_batch` instead."""
    n = len(film_info.weights)
    mask = np.zeros(n, dtype=film_info.weights.dtype)
    mask[ix] = 1.0
    Qv = kernels.Q_apply(
        film_info.sites, film_info.weights, film_info.weights * mask
    )
    return np.asarray(Qv) - _hole_host_part(film_info, mask)


def _assemble_lowmem_batch(
    batch, film_systems, hole_systems, pending, pad_to
):
    """Device phase of the low-memory factorization for all materializing
    films at once.

    The tunneled-TPU cost model dictates the shape of this function: every
    host->device transfer pays ~20-30 ms of latency on top of low
    bandwidth, so the per-film inputs (padded sites/weights, gather
    indices, scatter triplets, hole masks) are stacked on the host and
    shipped as ONE transfer per input kind.  Per-film dispatches then
    slice the stacks on device (free), all films share the one compiled
    assembly program (:func:`_assemble_lowmem_fused_body`), and every hole
    of every film runs as one scanned program with a single readback
    (:func:`_holes_Q_batched_jit`).
    """
    if not batch:
        return
    import jax.numpy as jnp

    nnz_pad = max(-(-len(e["vals"]) // 65536) * 65536 for e in batch)
    dtype = batch[0]["w_pad"].dtype
    idx_dtype = np.int32

    def stacked(key, width, dt):
        out = np.zeros((len(batch), width), dtype=dt)
        for i, e in enumerate(batch):
            out[i, : len(e[key])] = e[key]
        return jnp.asarray(out)

    sites_stack = jnp.asarray(np.stack([e["sites_pad"] for e in batch]))
    w_stack = jnp.asarray(np.stack([e["w_pad"] for e in batch]))
    n_arr = jnp.asarray(np.array([e["n"] for e in batch], dtype=idx_dtype))
    # Gather pad slots index site 0 (the zero fill); the assembly masks
    # the whole pad block to the identity regardless.
    ixp_stack = stacked("ix", pad_to, idx_dtype)
    rows_stack = stacked("rows", nnz_pad, idx_dtype)
    cols_stack = stacked("cols", nnz_pad, idx_dtype)
    vals_stack = stacked("vals", nnz_pad, dtype)
    ni_arr = jnp.asarray(np.array([e["ni"] for e in batch], dtype=idx_dtype))
    fuse = _assemble_lowmem_sliced_jit()
    for i, e in enumerate(batch):
        A = fuse(
            np.int32(i),
            sites_stack,
            w_stack,
            n_arr,
            ixp_stack,
            vals_stack,
            rows_stack,
            cols_stack,
            ni_arr,
        )
        film_systems[e["film"]] = LinearSystem(
            A=A, indices=e["ix"], lu_piv=None, grad_Lambda_term=0
        )
        # The SAME device buffer already referenced by the LinearSystem (no
        # negation here -- factor_system fuses the sign flip so no extra
        # (n, n) buffer is allocated).
        pending.append((e["film"], A, e["w_col"], False))
    holes = [
        (i, hole_name, h)
        for i, e in enumerate(batch)
        for hole_name, h in e["holes"].items()
    ]
    if not holes:
        return
    fidx = jnp.asarray(np.array([h[0] for h in holes], dtype=idx_dtype))
    vec_masks = jnp.asarray(np.stack([h[2]["vec_mask"] for h in holes]))
    Qvs = _holes_Q_batched_jit()(sites_stack, w_stack, n_arr, fidx, vec_masks)
    # The hole vectors STAY on device (sliced lazily, host part subtracted
    # as a tiny h2d transfer): factorization then completes with ZERO
    # device->host readbacks, which matters on tunneled TPU backends where
    # the process's first readback pays the channel-establishment cost
    # (utils/tunnel.py) -- a readback here would serialize factorization
    # behind it.  Consumers np.asarray() the vector when they need it.
    for k, (i, hole_name, h) in enumerate(holes):
        e = batch[i]
        hole_systems[e["film"]][hole_name] = LinearSystem(
            A=Qvs[k, : e["n"]] - jnp.asarray(h["host_part"], dtype=dtype),
            indices=h["indices"],
            grad_Lambda_term=0,
        )


#: Stage timings of the most recent :func:`factorize_linear_systems` call
#: (assembly vs factorization dispatch; device work is async, so the true
#: compute time is whatever the caller's block_until_ready observes on top).
FACTORIZE_STATS: Dict[str, float] = {}


def factorize_linear_systems(
    device: Device, film_info_dict: Dict[str, FilmInfo]
) -> Tuple[
    Dict[str, LinearSystem],
    Dict[str, Dict[str, LinearSystem]],
    Dict[str, TerminalSystems],
]:
    """Builds and LU-factorizes the linear systems for all films, holes, and
    terminals (reference: ``solver/solve_film.py:151-282``).

    Returns:
        ``{film: film_system}``, ``{film: {hole: hole_system}}``, and
        ``{film: TerminalSystems}``.
    """
    t_start = time.perf_counter()
    film_systems = {}
    hole_systems = {}
    terminal_systems = {}
    # Low-memory films defer factorization: equally-shaped systems are
    # batch-factorized in ONE device program after assembly.
    pending_factorizations = []  # (film_name, neg_A, w_col)
    # Host-prepped low-memory films whose device assembly runs batched
    # (stacked single transfers) after the loop.
    lowmem_batch = []
    # Pad low-memory film systems to one common size so all films share a
    # single compiled factorization/solve on TPU (compile time dominates
    # cold-start factorization otherwise).  Films that will route to the
    # matrix-free CG path never materialize a system, so they must not
    # inflate the shared pad size (one 80k CG film would otherwise blow a
    # 20k film's system up to (80k, 80k) and OOM the chip).
    lowmem_method = linalg._large_factor_method()
    single_device_max = int(
        os.environ.get("SUPERSCREEN_TPU_MAX_MATERIALIZED_N", "65000")
    )
    max_materialized = _sharded_dense_ceiling(single_device_max)
    lowmem_sizes = []
    lowmem_full_sizes = []
    lowmem_dtype = None
    for film_info in film_info_dict.values():
        if film_info.dense_kernel:
            continue
        ix = film_info.interior_indices
        if film_info.hole_indices:
            ix = np.setdiff1d(
                ix, np.concatenate(list(film_info.hole_indices.values()))
            )
        if lowmem_method == "cg" or len(ix) > max_materialized:
            continue
        lowmem_sizes.append(len(ix))
        lowmem_full_sizes.append(len(film_info.weights))
        lowmem_dtype = np.asarray(film_info.weights).dtype
    pad_to = None
    pad_n = None
    if lowmem_sizes:
        pad_to = -(-max(lowmem_sizes) // 2048) * 2048
        # Shared pad size for the FULL site set: lets every per-film device
        # program of the assembly (C vector, row sums, hole vectors) share
        # one compilation across films (cold-start compile wall).
        pad_n = -(-max(lowmem_full_sizes) // 2048) * 2048
        # Start compiling the (pad_to, pad_to) factorization program NOW in
        # a background thread: its compile dwarfs the assembly's, and XLA
        # compilation releases the GIL, so it overlaps with all the host
        # prep, transfers, and assembly below.
        linalg.prewarm_factorization(pad_to, lowmem_dtype)
    for film_name, film_info in film_info_dict.items():
        hole_systems[film_name] = {}
        interior_indices = film_info.interior_indices
        boundary_indices = film_info.boundary_indices
        hole_indices = film_info.hole_indices
        Lambda_info = film_info.lambda_info
        inhomogeneous = Lambda_info.inhomogeneous
        Lambda = Lambda_info.Lambda
        if not film_info.dense_kernel:
            # Low-memory path: never materialize the full (n, n) kernel.
            # Inhomogeneous Lambda is supported: the (grad Lambda . grad)
            # term folds into the sparse scatter/segment-sum triplets, and
            # matrix-free solves switch from CG to BiCGStab (the operator
            # is then mildly non-symmetric).
            if hole_indices:
                interior_indices = np.setdiff1d(
                    interior_indices,
                    np.concatenate(list(hole_indices.values())),
                )
            is_cg = (
                lowmem_method == "cg"
                or len(interior_indices) > max_materialized
            )
            ni = len(interior_indices)
            # Films beyond the single-device dense ceiling exist only
            # because an installed factorization mesh raised it: assemble
            # their system DISTRIBUTED (row-sharded over the mesh's model
            # axis) so the full (n, n) never lands on one device.
            out_sharding = None
            if not is_cg and ni > single_device_max:
                from ..parallel import sharding as _psh

                out_sharding = _psh.factorization_row_sharding()
            if is_cg or out_sharding is not None:
                # Eager per-hole vectors (rare paths; the common case runs
                # batched below).
                for hole_name, indices in hole_indices.items():
                    hole_systems[film_name][hole_name] = LinearSystem(
                        A=_hole_effective_field_vector_lowmem(
                            film_info, indices
                        ),
                        indices=indices,
                        grad_Lambda_term=0,
                    )
            if is_cg:
                # Matrix-free CG path: beyond ~65k interior sites even the
                # (ni, ni) system / explicit inverse exceeds HBM; solves
                # run as preconditioned CG with tiled kernel matvecs.
                film_systems[film_name] = LinearSystem(
                    A=None,
                    indices=interior_indices,
                    lu_piv=(
                        "cg",
                        _lowmem_operator_pieces(film_info, interior_indices),
                    ),
                    grad_Lambda_term=0,
                )
                continue
            w_col = np.concatenate(
                [
                    film_info.weights[interior_indices],
                    np.ones((pad_to or ni) - ni, dtype=film_info.weights.dtype),
                ]
            )
            if out_sharding is not None:
                A = _build_system_2d_lowmem(
                    film_info,
                    interior_indices,
                    pad_to,
                    out_sharding=out_sharding,
                )
                film_systems[film_name] = LinearSystem(
                    A=A,
                    indices=interior_indices,
                    lu_piv=None,  # filled by the batched factorization below
                    grad_Lambda_term=0,
                )
                # The SAME device buffer already referenced by the
                # LinearSystem (no negation here -- factor_system fuses the
                # sign flip so no extra (n, n) buffer is allocated).  The
                # True flag marks that the factorization MUST run
                # GSPMD-sharded (on any backend).
                pending_factorizations.append((film_name, A, w_col, True))
                continue
            # Common case: host-side prep only; the device phase for ALL
            # such films runs in _assemble_lowmem_batch with stacked
            # single-transfer inputs (tunnel latency dominates otherwise).
            dtype = np.asarray(film_info.weights).dtype
            sites_pad, w_pad, n = _padded_film_arrays(film_info, pad_n, dtype)
            rows, cols, vals = _restricted_lambda_triplets(
                film_info, interior_indices, dtype
            )
            holes_prep = {}
            for hole_name, indices in hole_indices.items():
                mask = np.zeros(n, dtype=dtype)
                mask[indices] = 1.0
                vec_mask = np.zeros(pad_n, dtype=dtype)
                vec_mask[:n] = mask
                holes_prep[hole_name] = dict(
                    indices=indices,
                    vec_mask=vec_mask,
                    host_part=_hole_host_part(film_info, mask),
                )
            lowmem_batch.append(
                dict(
                    film=film_name,
                    sites_pad=sites_pad,
                    w_pad=w_pad,
                    n=n,
                    ix=interior_indices,
                    rows=rows,
                    cols=cols,
                    vals=vals,
                    ni=ni,
                    w_col=w_col,
                    holes=holes_prep,
                )
            )
            continue
        if inhomogeneous:
            grad = film_info.gradient
            # (grad Lambda) . grad as an operator:
            # diag(gx @ Lambda) @ gx + diag(gy @ Lambda) @ gy
            # (matvecs precision-disciplined; the diag-scaled products are
            # elementwise broadcasts, not matmuls)
            gx, gy = grad
            dLx = _op_matvec(gx, Lambda[:, 0])
            dLy = _op_matvec(gy, Lambda[:, 0])
            grad_Lambda_term = dLx[:, None] * gx + dLy[:, None] * gy
        else:
            grad_Lambda_term = 0

        def make_system_1d(indices):
            return _build_system_1d(
                film_info.kernel,
                film_info.weights,
                Lambda,
                film_info.laplacian,
                grad_Lambda_term,
                indices,
                inhomogeneous=inhomogeneous,
            )

        def make_system_2d(indices):
            return _build_system_2d(
                film_info.kernel,
                film_info.weights,
                Lambda,
                film_info.laplacian,
                grad_Lambda_term,
                indices,
                inhomogeneous=inhomogeneous,
            )

        for hole_name, indices in hole_indices.items():
            hole_systems[film_name][hole_name] = LinearSystem(
                A=make_system_1d(indices),
                indices=indices,
                grad_Lambda_term=grad_Lambda_term,
            )

        if film_name in device.terminals:
            boundary_system = LinearSystem(
                A=make_system_1d(boundary_indices),
                indices=boundary_indices,
                grad_Lambda_term=grad_Lambda_term,
            )
            A = make_system_2d(interior_indices)
            film_without_boundary_system = LinearSystem(
                A=A,
                indices=interior_indices,
                lu_piv=linalg.factor_system(
                    A, np.asarray(film_info.weights)[interior_indices]
                ),
                grad_Lambda_term=grad_Lambda_term,
            )
            terminal_hole_systems = {}
            for hole_name, indices in hole_indices.items():
                terminal_hole_systems[hole_name] = LinearSystem(
                    A=make_system_1d(indices),
                    indices=indices,
                    grad_Lambda_term=grad_Lambda_term,
                )
            film_without_boundary_or_holes_system = None
            if hole_indices:
                ix = np.setdiff1d(
                    interior_indices, np.concatenate(list(hole_indices.values()))
                )
                A = make_system_2d(ix)
                film_without_boundary_or_holes_system = LinearSystem(
                    A=A,
                    indices=ix,
                    lu_piv=linalg.factor_system(
                        A, np.asarray(film_info.weights)[ix]
                    ),
                    grad_Lambda_term=grad_Lambda_term,
                )
            terminal_systems[film_name] = TerminalSystems(
                film=film_name,
                boundary=boundary_system,
                holes=terminal_hole_systems,
                film_without_boundary=film_without_boundary_system,
                film_without_boundary_or_holes=film_without_boundary_or_holes_system,
            )

        # The main film system: all sites in the film, not in a hole, and
        # (for terminal films) not on the boundary.  For terminal films
        # these index sets are exactly the terminal block's
        # film_without_boundary(_or_holes) systems (interior_indices
        # already excludes the boundary), so reuse that factorization
        # instead of paying a duplicate O(n^3) factorization and holding a
        # duplicate (n, n) system + inverse in HBM.
        if film_name in device.terminals:
            ts = terminal_systems[film_name]
            film_systems[film_name] = (
                ts.film_without_boundary_or_holes
                if hole_indices
                else ts.film_without_boundary
            )
            continue
        if hole_indices:
            interior_indices = np.setdiff1d(
                interior_indices, np.concatenate(list(hole_indices.values()))
            )
        A = make_system_2d(interior_indices)
        film_systems[film_name] = LinearSystem(
            A=A,
            indices=interior_indices,
            lu_piv=linalg.factor_system(
                A, np.asarray(film_info.weights)[interior_indices]
            ),
            grad_Lambda_term=grad_Lambda_term,
        )
    _assemble_lowmem_batch(
        lowmem_batch,
        film_systems,
        hole_systems,
        pending_factorizations,
        pad_to,
    )
    t_assembled = time.perf_counter()
    _factorize_pending(film_systems, pending_factorizations)
    t_done = time.perf_counter()
    FACTORIZE_STATS.clear()
    FACTORIZE_STATS.update(
        assembly_s=t_assembled - t_start,
        factor_dispatch_s=t_done - t_assembled,
        n_films=len(film_info_dict),
        n_batched=len(pending_factorizations),
        pad_to=pad_to or 0,
    )
    return film_systems, hole_systems, terminal_systems


def _sharded_dense_ceiling(single_device_max: int) -> int:
    """The dense-path site ceiling, raised when a GSPMD factorization mesh
    is installed: the explicit inverse is stored row-sharded over the
    mesh's ``model`` axis, so per-device bytes scale as ``n^2 / n_model``
    and the largest film the *slice* holds densely grows by
    ``sqrt(n_model)``.  This makes :func:`set_factorization_mesh`
    automatic dispatch (VERDICT r2 item 9): films that would fall to the
    matrix-free CG path on one chip stay dense *because* the shards
    together fit what one device cannot."""
    from ..parallel import sharding as _psh

    mesh = _psh.factorization_mesh()
    n_model = 1 if mesh is None else int(mesh.shape.get("model", 1))
    if n_model <= 1:
        return single_device_max
    return int(single_device_max * n_model**0.5)


def _factorize_pending(film_systems, pending):
    """Factorize the deferred (equally padded) low-memory systems, batching
    same-shape films into single vmapped device programs subject to an HBM
    budget (VERDICT r1 item 1: one program instead of a per-film loop)."""
    if not pending:
        return
    # Conservative default: batching STACKS the inputs (a copy), and the
    # films' A matrices and earlier factorizations stay resident in HBM,
    # so only small films are batched by default (a 16 GB v5e fits the
    # 4x~18k headline config only sequentially).
    budget = float(
        os.environ.get("SUPERSCREEN_TPU_FACTOR_BATCH_BYTES", 6e9)
    )
    # The batched kernel covers the single-device explicit-inverse methods
    # (the default Cholesky "inv" pipeline and the opt-in "schur",
    # dispatched inside lu_factor_batched); other methods and GSPMD
    # factorization meshes fall back to per-film factor_system rather
    # than silently switching algorithms.
    from ..parallel import sharding as _psh

    factor_mesh = _psh.factorization_mesh()
    mesh_active = (
        factor_mesh is not None and factor_mesh.shape.get("model", 1) > 1
    )
    if (
        linalg._large_factor_method() not in ("inv", "schur")
        or mesh_active
    ):
        for name, A, w_col, force_sharded in pending:
            film_systems[name].lu_piv = linalg.factor_system(
                A, w_col, force_sharded=force_sharded
            )
        return
    by_shape: Dict[tuple, list] = {}
    for entry in pending:
        by_shape.setdefault(entry[1].shape, []).append(entry)
    for shape, group in by_shape.items():
        n = shape[0]
        # ~4 live (n, n) buffers per film inside the batched program.
        per_film_bytes = 16.0 * n * n
        chunk_size = max(1, int(budget // per_film_bytes))
        for lo in range(0, len(group), chunk_size):
            chunk = group[lo : lo + chunk_size]
            if len(chunk) == 1:
                name, A, w_col, _ = chunk[0]
                film_systems[name].lu_piv = linalg.factor_system(A, w_col)
                continue
            import jax.numpy as jnp

            names = [c[0] for c in chunk]
            As = jnp.stack([jnp.asarray(c[1]) for c in chunk])
            w_cols = np.stack([np.asarray(c[2]) for c in chunk])
            logger.info(
                f"Batch-factorizing {len(chunk)} films of shape {shape} "
                f"in one device program."
            )
            for name, fac in zip(names, linalg.lu_factor_batched(As, w_cols)):
                film_systems[name].lu_piv = fac


def solve_for_terminal_current_stream(
    device: Device,
    film_info: FilmInfo,
    terminal_systems: TerminalSystems,
    terminal_currents: Dict[str, float],
    hp_system=None,
) -> np.ndarray:
    """Stream function from transport currents in a single film.

    Three-step algorithm (reference ``solve_film.py:308-390``):

    1. Set the boundary stream from the terminal currents and solve in the
       film ignoring holes.
    2. Set each hole's stream to the weighted average from step 1.
    3. Re-solve with the hole boundary conditions.

    With ``hp_system``, every matvec and solve runs at float64 accuracy
    (host effective-field blocks + f64-residual refinement around the f32
    factorizations; see :mod:`superscreen_tpu.solver.refine`).

    The drive enters through an affine map: the raw boundary stream is
    linear in the terminal currents (:func:`terminal_boundary_stream`),
    the reference's centering shifts it by a drive-dependent SCALAR
    (``-max + ptp/2`` over the raw array), and the remaining steps
    (:func:`solve_from_boundary_stream`) are linear in the boundary
    values.  ``sweep.solve_many(terminal_currents=...)`` exploits exactly
    this decomposition.
    """
    npoints = len(device.meshes[film_info.name].sites)
    if not any(terminal_currents.values()):
        return np.zeros(npoints)
    g = terminal_boundary_stream(
        device, film_info, terminal_systems, terminal_currents
    )
    # Center the boundary stream (reference solve_film.py:359).  The
    # interior entries are still zero here, so max/ptp see them too.
    g = g - np.max(g) + np.ptp(g) / 2
    return solve_from_boundary_stream(
        device, film_info, terminal_systems, g, hp_system=hp_system
    )


def terminal_boundary_stream(
    device: Device,
    film_info: FilmInfo,
    terminal_systems: TerminalSystems,
    terminal_currents: Dict[str, float],
) -> np.ndarray:
    """Raw (uncentered) boundary stream of a transport drive: ``(n,)``
    with the boundary entries set and interior zeros.  Linear in the
    terminal currents (reference ``solve_film.py:347-357``)."""
    return boundary_stream_from_indices(
        device,
        film_info.name,
        np.asarray(terminal_systems.boundary.indices),
        terminal_currents,
    )


def boundary_stream_from_indices(
    device: Device,
    film_name: str,
    boundary_indices: np.ndarray,
    terminal_currents: Dict[str, float],
) -> np.ndarray:
    """The terminal boundary walk given explicit CCW boundary indices (the
    single home of the ``ix_terminal[:-1]`` / ``remaining_boundary``
    conventions -- also reused by the adjoint model)."""
    mesh = device.meshes[film_name]
    points = mesh.sites
    npoints = len(points)
    boundary_points = points[boundary_indices]
    g = np.zeros(npoints)
    for terminal in device.terminals[film_name]:
        current = terminal_currents.get(terminal.name, 0.0)
        ix_boundary = np.sort(
            terminal.contains_points(boundary_points, index=True)
        )
        remaining_boundary = boundary_indices[ix_boundary[-1] :]
        ix_terminal = boundary_indices[ix_boundary]
        stream = stream_from_terminal_current(points[ix_terminal], -current)
        g[ix_terminal[:-1]] += stream
        g[remaining_boundary] += stream[-1]
    return g


def solve_from_boundary_stream(
    device: Device,
    film_info: FilmInfo,
    terminal_systems: TerminalSystems,
    g: np.ndarray,
    hp_system=None,
) -> np.ndarray:
    """Bootstrap steps 2-3 given the (already centered) boundary stream:
    solve the film interior ignoring holes, then pin each hole to its
    weighted average and re-solve.  Linear in ``g``'s boundary values."""
    mesh = device.meshes[film_info.name]
    weights = mesh.operators.weights
    npoints = len(mesh.sites)
    g = np.array(g, dtype=float, copy=True)

    if hp_system is not None:
        from . import refine

        solve_dtype = device.solve_dtype

        def _solve(system, A64, h):
            def precond(rhs):
                return linalg.lu_solve(
                    system.lu_piv, np.asarray(rhs, dtype=solve_dtype)
                )

            return refine.refined_solve(A64, precond, h)

        def _boundary_eff(g_boundary):
            return -(hp_system.boundary_eff64 @ g_boundary)

        def _hole_eff(name, g_hole):
            return -(hp_system.hole_eff64[name] @ g_hole)

    boundary_indices = terminal_systems.boundary.indices

    # Effective applied field of the boundary stream.
    Ha_eff = np.zeros(npoints)
    if hp_system is not None:
        Ha_eff += _boundary_eff(g[boundary_indices])
    else:
        Ha_eff += -_op_matvec(terminal_systems.boundary.A, g[boundary_indices])

    # 2. Solve ignoring holes.
    sysb = terminal_systems.film_without_boundary
    h = -Ha_eff[sysb.indices]
    if hp_system is not None:
        gf = _solve(sysb, hp_system.fwb_A64, h)
    else:
        gf = linalg.lu_solve_refined(sysb.A, sysb.lu_piv, h)
    g[sysb.indices] = gf
    if len(terminal_systems.holes) == 0:
        return g

    # 3. Hole averages, then re-solve without holes.
    Ha_eff = np.zeros(npoints)
    for hole_name, system in terminal_systems.holes.items():
        ix = system.indices
        g[ix] = np.average(g[ix], weights=weights[ix])
        if hp_system is not None:
            Ha_eff += _hole_eff(hole_name, g[ix])
        else:
            Ha_eff += -_op_matvec(system.A, g[ix])
    if hp_system is not None:
        Ha_eff += _boundary_eff(g[boundary_indices])
    else:
        Ha_eff += -_op_matvec(terminal_systems.boundary.A, g[boundary_indices])
    sysbh = terminal_systems.film_without_boundary_or_holes
    h = -Ha_eff[sysbh.indices]
    if hp_system is not None:
        gf = _solve(sysbh, hp_system.fwboh_A64, h)
    else:
        gf = linalg.lu_solve_refined(sysbh.A, sysbh.lu_piv, h)
    g[sysbh.indices] = gf
    return g


def solve_film(
    *,
    device: Device,
    applied_field: np.ndarray,
    film_info: FilmInfo,
    film_system: LinearSystem,
    hole_systems: Dict[str, LinearSystem],
    field_conversion: float,
    vortex_flux: float,
    terminal_systems: Optional[TerminalSystems] = None,
    field_from_other_films: Optional[np.ndarray] = None,
    check_inversion: bool = False,
    hp_system=None,
) -> FilmSolution:
    """Computes the stream function and fields within a single film.

    Reference: ``superscreen/solver/solve_film.py:440-574``.

    Args:
        device: The device being solved.
        applied_field: Applied field at the film's mesh sites
            (solver units, ``current_units / length_units``).
        film_info: The :class:`FilmInfo` for the film.
        film_system: The film's :class:`LinearSystem`.
        hole_systems: ``{hole_name: LinearSystem}``.
        field_conversion: Conversion factor from user field units to solver
            units.
        vortex_flux: Flux of a single vortex in solver units.
        terminal_systems: The film's :class:`TerminalSystems` (if any).
        field_from_other_films: Screening field from other films.
        check_inversion: Verify the solve accuracy and warn on failure.
        hp_system: A :class:`superscreen_tpu.solver.refine.HighPrecisionSystem`
            enabling float64-residual refinement around the f32 device
            factorization (see :mod:`superscreen_tpu.solver.refine`); the
            hole effective fields, current density, and self-field are then
            also computed in float64 on the host.

    Returns:
        A :class:`FilmSolution` (fields converted back to user units).
    """
    circulating_currents = film_info.circulating_currents
    terminal_currents = film_info.terminal_currents or {}
    mesh = device.meshes[film_info.name]
    points = mesh.sites

    weights = film_info.weights
    Q = film_info.kernel
    if hp_system is not None:
        weights = hp_system.weights64
        applied_field = np.asarray(applied_field, dtype=np.float64)

    Hz_applied = applied_field
    if field_from_other_films is not None:
        Hz_applied = Hz_applied + field_from_other_films

    g = np.zeros_like(Hz_applied)
    Ha_eff = np.zeros_like(Hz_applied)

    # Hole boundary conditions: g[hole] = I_circ and its effective field.
    for name, system in hole_systems.items():
        indices = system.indices
        current = circulating_currents.get(name, 0)
        g[indices] += current
        if hp_system is not None:
            Ha_eff += -(hp_system.hole_eff64[name] @ g[indices])
        elif np.ndim(system.A) == 1:
            # Low-memory mode: the effective field of a unit circulating
            # current is a precomputed vector.
            Ha_eff += np.asarray(-(system.A * current))
        else:
            Ha_eff += -_op_matvec(system.A, g[indices])

    if film_info.name in device.terminals:
        g_transport = solve_for_terminal_current_stream(
            device,
            film_info,
            terminal_systems,
            terminal_currents,
            hp_system=hp_system,
        )
        g += g_transport
        boundary_sites = points[film_info.boundary_indices]
        boundary_stream = g_transport[film_info.boundary_indices]
        boundary_centers = 0.5 * (
            boundary_sites + np.roll(boundary_sites, -1, axis=0)
        )
        boundary_stream = 0.5 * (
            boundary_stream + np.roll(boundary_stream, -1, axis=0)
        )
        edge_lengths, boundary_normals = path_vectors(close_curve(boundary_sites))
        if hp_system is not None:
            from . import refine as _refine

            Ha_transport = _refine.boundary_effective_field64(
                points,
                boundary_centers,
                edge_lengths,
                boundary_normals,
                boundary_stream,
            )
        else:
            Ha_transport = np.asarray(
                kernels.boundary_effective_field(
                    points,
                    boundary_centers,
                    edge_lengths,
                    boundary_normals,
                    boundary_stream,
                )
            )
        Ha_eff += Ha_transport

    indices = film_system.indices
    A = film_system.A
    h = Hz_applied[indices] - Ha_eff[indices]
    if hp_system is not None:
        from . import refine

        solve_dtype = device.solve_dtype

        def _precond(rhs):
            return linalg.lu_solve(
                film_system.lu_piv, np.asarray(rhs, dtype=solve_dtype)
            )

        gf = refine.refined_solve(hp_system.A64, _precond, h)
    else:
        gf = linalg.lu_solve_refined(A, film_system.lu_piv, h)
    g[indices] += gf

    if check_inversion and (A is not None or hp_system is not None):
        A_chk = hp_system.A64 if hp_system is not None else A
        gf_p = gf
        if A_chk.shape[0] != len(gf):
            gf_p = np.concatenate(
                [gf, np.zeros(A_chk.shape[0] - len(gf), gf.dtype)]
            )
        hsim = -_op_matvec(A_chk, gf_p)[: len(h)]
        if not np.allclose(hsim, h):
            logger.warning(
                f"Unable to solve for stream function in {film_info.name!r}, "
                f"maximum error {np.abs(hsim - h).max():.3e}."
            )

    if film_info.vortices:
        # One batched lu_solve over the vortex unit vectors (Brandt Eq. 28)
        # instead of materializing the full inverse.
        if hp_system is not None:
            n_sys = len(indices)
            rhs_dtype = np.float64
        else:
            n_sys = A.shape[0] if A is not None else len(indices)
            rhs_dtype = A.dtype if A is not None else film_info.weights.dtype
        rhs = np.zeros((n_sys, len(film_info.vortices)), dtype=rhs_dtype)
        scales = np.zeros(len(film_info.vortices), dtype=float)
        for k, vortex in enumerate(film_info.vortices):
            xy = (vortex.x, vortex.y)
            j_film = int(np.argmin(np.linalg.norm(points[indices] - xy, axis=1)))
            j_device = int(np.argmin(np.linalg.norm(points - xy, axis=1)))
            rhs[j_film, k] = 1.0
            scales[k] = vortex_flux * vortex.nPhi0 / weights[j_device]
        if hp_system is not None:
            K_cols = -refine.refined_solve(hp_system.A64, _precond, rhs)
        elif A is not None:
            # Refined like the main solve: the bf16 FACTOR_PRECISION
            # default relies on solve-time refinement, and vortex response
            # columns are physics outputs (streams, landscape energies).
            K_cols = -linalg.lu_solve_refined(A, film_system.lu_piv, rhs)[
                : len(indices)
            ]
        else:
            K_cols = -linalg.lu_solve(film_system.lu_piv, rhs)[: len(indices)]
        g[indices] += K_cols @ scales

    # Current density J = curl(g z) = (dg/dy, -dg/dx).
    grad_x = mesh.operators.gradient_x
    grad_y = mesh.operators.gradient_y
    if hp_system is not None:
        J = np.stack(
            [refine.coo_matvec64(grad_y, g), -refine.coo_matvec64(grad_x, g)],
            axis=1,
        )
    else:
        J = np.array(
            [np.asarray(grad_y.matvec(g)), -np.asarray(grad_x.matvec(g))]
        ).T
    if film_info.name in device.terminals:
        Gx = mesh.operators.gradient_tri_x
        Gy = mesh.operators.gradient_tri_y
        if hp_system is not None:
            J_tri = np.stack(
                [refine.coo_matvec64(Gy, g), -refine.coo_matvec64(Gx, g)],
                axis=1,
            )
            screening_field = refine.biot_savart_within_film64(
                points, mesh.triangle_centroids, mesh.triangle_areas, J_tri
            )
        else:
            J_tri = np.array(
                [np.asarray(Gy.matvec(g)), -np.asarray(Gx.matvec(g))]
            ).T
            screening_field = np.asarray(
                kernels.biot_savart_within_film(
                    points, mesh.triangle_centroids, mesh.triangle_areas, J_tri
                )
            )
    elif hp_system is not None:
        # Q @ (w g) in float64: Q_ii w_i = brandt_diag_i, off-diagonal -q_ij.
        screening_field = hp_system.brandt_diag64 * g - refine.q_apply64(
            points, points, weights * g
        )
    elif Q is not None:
        # Eq. 7 in [Kirtley-RSI-2016] / [Kirtley-SST-2016].
        screening_field = _op_matvec(Q, weights * g)
    else:
        # Low-memory mode: apply the Brandt kernel matrix-free.
        screening_field = kernels.Q_apply(
            film_info.sites, weights, weights * g
        )
    if field_from_other_films is not None:
        field_from_other_films = field_from_other_films / field_conversion
    return FilmSolution(
        stream=g,
        current_density=J,
        applied_field=applied_field / field_conversion,
        self_field=screening_field / field_conversion,
        field_from_other_films=field_from_other_films,
    )
