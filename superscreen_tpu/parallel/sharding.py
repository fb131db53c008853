"""Multi-chip sharding for batched solves.

The scaling model (in "How to Scale Your Model" terms): pick a mesh, annotate
input shardings, and let XLA insert the collectives.

Two axes are used:

* ``"data"``: the sweep/batch axis.  Sweep right-hand sides are sharded
  across devices; each device runs independent triangular solves against a
  replicated LU factorization.  No communication on the hot path.
* ``"model"``: rows of the dense kernel/operator matrices.  The O(n^2)
  memory of the Brandt kernel ``Q`` is the scaling wall (a 100k-vertex film
  needs 40 GB in fp32); sharding ``Q`` row-wise puts ``n/d`` rows on each
  device, and the self-field matvec ``Q @ (w g)`` becomes a local matmul on
  each row block followed by an all-gather of the output rows over ICI.

For single-chip execution both axes have size 1 and everything reduces to
plain jit.
"""

import logging
from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger("parallel")

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "sharded_film_data",
    "shard_sweep_inputs",
    "sharded_biot_savart",
    "sharded_self_field",
    "sharded_spd_inverse",
    "set_factorization_mesh",
    "factorization_mesh",
]

#: When set (via :func:`set_factorization_mesh`), large dense
#: factorizations in :mod:`superscreen_tpu.ops.linalg` run GSPMD-sharded
#: over this mesh's ``model`` axis.
_FACTOR_MESH: Optional[Mesh] = None


def set_factorization_mesh(mesh: Optional[Mesh]) -> None:
    """Route large dense factorizations (Schulz inverse / Cholesky) through
    ``mesh``: the O(n^3) matmuls are sharded row-wise over the ``model``
    axis so a film too large for one chip's HBM can use the whole slice.
    Pass None to go back to single-device factorization."""
    global _FACTOR_MESH
    _FACTOR_MESH = mesh


def factorization_mesh() -> Optional[Mesh]:
    """The mesh installed by :func:`set_factorization_mesh`, if any."""
    return _FACTOR_MESH


def factorization_row_sharding() -> Optional[NamedSharding]:
    """Row sharding (``P("model", None)``) over the installed factorization
    mesh, or None when no mesh with a model axis > 1 is installed.  This is
    the layout shared by the distributed system assembly
    (``solver.solve_film._assemble_lowmem_A``) and the sharded inverse
    (:func:`sharded_spd_inverse`) -- assembling directly into it means the
    (n, n) system transfers zero bytes between the two stages."""
    mesh = _FACTOR_MESH
    if mesh is None or mesh.shape.get("model", 1) <= 1:
        return None
    return NamedSharding(mesh, P("model", None))


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Creates a ``(data, model)`` device mesh.

    Args:
        n_data: Size of the batch axis (defaults to
            ``len(devices) // n_model``).
        n_model: Size of the matrix-row axis.
        devices: The devices to use (defaults to all available).

    Returns:
        A :class:`jax.sharding.Mesh` with axes ``("data", "model")``.
    """
    if devices is None:
        devices = jax.devices()
    n_devices = len(devices)
    if n_data is None:
        n_data = n_devices // n_model
    if n_data * n_model != n_devices:
        raise ValueError(
            f"n_data * n_model ({n_data} * {n_model}) must equal the number "
            f"of devices ({n_devices})."
        )
    dev_array = np.array(devices).reshape(n_data, n_model)
    return Mesh(dev_array, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding that puts a leading batch axis on the ``data`` mesh axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated sharding."""
    return NamedSharding(mesh, P())


def _pad_film_site_axis(data, n_model: int):
    """Zero-pads a :class:`FilmSweepData`'s site axis so ``n`` divides the
    ``model`` mesh axis, making the dense kernel ``Q`` row-shardable.

    Padded sites are placed at distinct far-away dummy coordinates (so every
    pairwise kernel stays finite) with unit vertex weight (the matrix-free
    self-field divides by weights, so zero would NaN its padded rows); their
    current density is exactly zero (the sparse gradients never scatter to
    them), so they contribute nothing as Biot-Savart sources, and they are
    never interior sites, so they contribute nothing to any solve.  Returns
    a new ``FilmSweepData`` with ``n`` updated to the padded size (callers
    build sweep inputs from the returned ``n``; :func:`shard_sweep_inputs`
    pads pre-built inputs).
    """
    import jax.numpy as jnp
    from dataclasses import replace

    n = data.n
    n_p = _round_up_div(n, n_model)
    pad = n_p - n
    if pad == 0:
        return data
    if data.fft_grid is not None:
        # The FFT-coupling grid data indexes the unpadded sites; padding
        # underneath it would corrupt the interpolation.  Replication of Q
        # (the fallback below) is the safe behavior here.
        logger.warning(
            f"Film {data.name!r}: not padding the site axis because FFT "
            "coupling grid data is attached; Q will be replicated."
        )
        return data

    def zpad(arr, axis):
        if arr is None:
            return None
        widths = [(0, 0)] * arr.ndim
        widths[axis] = (0, pad)
        return jnp.pad(jnp.asarray(arr), widths)

    weights = jnp.asarray(data.weights)
    weights_p = jnp.concatenate(
        [weights, jnp.ones(pad, dtype=weights.dtype)]
    )
    new = dict(
        n=n_p,
        sites=_pad_sites(jnp.asarray(data.sites), pad),
        weights=weights_p,
        Q=None if data.Q is None else zpad(zpad(data.Q, 0), 1),
        hole_masks=zpad(data.hole_masks, 1),
        hole_ha_vecs=zpad(data.hole_ha_vecs, 1),
        g_offset=(
            None
            if data.g_offset is None
            else zpad(data.g_offset, data.g_offset.ndim - 1)
        ),
        ha_offset=(
            None
            if data.ha_offset is None
            else zpad(data.ha_offset, data.ha_offset.ndim - 1)
        ),
        # Gather-form gradients: padded sites read site 0 with weight 0,
        # so their current density is exactly zero.
        gx_idx=zpad(data.gx_idx, 0),
        gx_w=zpad(data.gx_w, 0),
        gy_idx=zpad(data.gy_idx, 0),
        gy_w=zpad(data.gy_w, 0),
    )
    return replace(data, **new)


def sharded_film_data(
    film_data: Dict[str, "object"], mesh: Mesh, pad_to_shardable: bool = True
):
    """Places each film's sweep arrays on the mesh: the dense kernel ``Q``,
    the system matrix ``A`` (residual-refinement matvecs), and an
    explicit-inverse factor ``fac_a`` are sharded row-wise over ``model``
    (all matmul-only consumers, so GSPMD partitions them); LU/Cholesky
    factors and everything else are replicated (triangular solves do not
    partition row-wise).

    Args:
        film_data: ``{film_name: FilmSweepData}`` from
            :mod:`superscreen_tpu.sweep`.
        mesh: The device mesh.
        pad_to_shardable: Pad each film's site axis (far-away zero-weight
            dummy sites) so ``n`` divides the ``model`` axis and ``Q``
            row-shards instead of replicating.  Build sweep inputs from the
            returned films' ``n`` (or pass the returned dict to
            :func:`shard_sweep_inputs` to pad pre-built inputs).

    Returns:
        A new ``{film_name: FilmSweepData}`` with device-placed arrays.
    """
    from ..sweep import FilmSweepData, _FSD_ARRAY_FIELDS, _FSD_STATIC_FIELDS

    row_sharded = NamedSharding(mesh, P("model", None))
    replicated = replicated_sharding(mesh)
    n_model = mesh.shape["model"]
    out = {}
    for name, data in film_data.items():
        if pad_to_shardable and n_model > 1:
            data = _pad_film_site_axis(data, n_model)
        kwargs = {}
        for f in _FSD_STATIC_FIELDS:
            kwargs[f] = getattr(data, f)
        # Row-shardable (n, n) operands: matmul-only consumers.  fac_a is
        # only matmul-consumed for the explicit-inverse representation;
        # LU/Cholesky factors feed triangular solves and stay replicated.
        shardable = {"Q", "A"}
        if data.fac_kind == "inv":
            shardable.add("fac_a")
        for f in _FSD_ARRAY_FIELDS:
            val = getattr(data, f)
            if val is None:
                kwargs[f] = None
                continue
            if f in shardable and val.ndim == 2 and val.shape[0] == val.shape[1]:
                if val.shape[0] % n_model == 0:
                    kwargs[f] = jax.device_put(val, row_sharded)
                else:
                    logger.warning(
                        f"Film {name!r}: {f} has {val.shape[0]} rows, not "
                        f"divisible by the model axis "
                        f"({n_model}); REPLICATING {f} on every "
                        f"device ({val.nbytes / 1e9:.2f} GB each). Pad the "
                        f"mesh or change the model-axis size to shard it."
                    )
                    kwargs[f] = jax.device_put(val, replicated)
            else:
                kwargs[f] = jax.device_put(val, replicated)
        out[name] = FilmSweepData(**kwargs)
    return out


def shard_sweep_inputs(
    Hz_applied: Dict[str, np.ndarray],
    I_circ: Dict[str, np.ndarray],
    mesh: Mesh,
    film_data: Optional[Dict[str, "object"]] = None,
) -> Tuple[Dict, Dict]:
    """Shards the sweep right-hand sides over the ``data`` axis.

    Pass ``film_data`` (the dict returned by :func:`sharded_film_data`) when
    the applied fields were built against the UNPADDED meshes: each film's
    ``Hz`` is zero-padded on the site axis to that film's (possibly padded)
    ``n`` so shapes agree inside the sweep.  Padded sites are never interior
    sites, so the pad values are inert.
    """
    sh = NamedSharding(mesh, P("data", None))
    Hz = {}
    for k, v in Hz_applied.items():
        v = np.asarray(v)
        if film_data is not None and film_data[k].n > v.shape[1]:
            v = np.pad(v, ((0, 0), (0, film_data[k].n - v.shape[1])))
        Hz[k] = jax.device_put(v, sh)
    Ic = {k: jax.device_put(np.asarray(v), sh) for k, v in I_circ.items()}
    return Hz, Ic


def _round_up_div(n, m):
    return -(-n // m) * m


def sharded_biot_savart(mesh, src_sites, src_areas, J, dst_sites, dz2):
    """Inter-film Biot-Savart with the O(n_src * n_dst) work sharded over
    the device mesh: destination rows split across ``model``, the sweep
    batch across ``data``.  Sources are replicated, so the hot path has
    ZERO communication -- each device computes its (B/d_data, n/d_model)
    output block locally (on TPU via the Pallas tile kernel, which is
    single-device code made multi-chip by ``shard_map``).

    Args:
        mesh: ``(data, model)`` device mesh from :func:`make_mesh`.
        src_sites: ``(n_src, 2)`` source sites (replicated).
        src_areas: ``(n_src,)`` vertex areas.
        J: ``(B, n_src, 2)`` batched sheet current (sharded or shardable
            over ``data``).
        dst_sites: ``(n_dst, 2)`` evaluation sites.
        dz2: Squared layer separation.

    Returns:
        ``(B, n_dst)`` field, sharded ``P("data", "model")``.
    """
    import jax.numpy as jnp

    from ..ops import kernels

    n_dst = dst_sites.shape[0]
    B = J.shape[0]
    n_model = mesh.shape["model"]
    n_data = mesh.shape["data"]
    # Pad to shard-divisible shapes; padded rows/batch entries are
    # discarded below.
    n_dst_p = _round_up_div(n_dst, n_model)
    B_p = _round_up_div(B, n_data)
    dst_p = jnp.pad(jnp.asarray(dst_sites), ((0, n_dst_p - n_dst), (0, 0)))
    J_p = jnp.pad(jnp.asarray(J), ((0, B_p - B), (0, 0), (0, 0)))

    f = jax.shard_map(
        lambda s, a, Jl, d, z: kernels.biot_savart_film_to_film_dz2(
            s, a, Jl, d, z, use_pallas=True
        ),
        mesh=mesh,
        in_specs=(P(), P(), P("data", None, None), P("model", None), P()),
        out_specs=P("data", "model"),
    )
    out = f(
        jnp.asarray(src_sites),
        jnp.asarray(src_areas),
        J_p,
        dst_p,
        jnp.asarray(dz2),
    )
    return out[:B, :n_dst]


def self_field_diagonal(mesh, sites, weights):
    """The regularized Brandt diagonal ``(C + q @ w) / w`` with the O(n^2)
    row-sum sharded over the ``model`` axis (the O(n) boundary vector ``C``
    is computed replicated).  Returns a replicated ``(n,)`` array suitable
    for reuse across :func:`sharded_self_field` calls."""
    import jax.numpy as jnp

    from ..ops import kernels

    sites = jnp.asarray(sites)
    weights = jnp.asarray(weights)
    n = sites.shape[0]
    n_p = _round_up_div(n, mesh.shape["model"])
    sites_p = _pad_sites(sites, n_p - n)
    f = jax.shard_map(
        lambda s_shard, s_full, w_full: kernels.q_apply_rect(
            s_shard, s_full, w_full[:, None], use_pallas=True
        )[:, 0],
        mesh=mesh,
        in_specs=(P("model", None), P(), P()),
        out_specs=P("model"),
    )
    q_row_w = f(sites_p, sites, weights)[:n]
    C = kernels.C_vector(sites, dtype=sites.dtype)
    return (C + q_row_w) / weights


def _pad_sites(sites, pad):
    """Append ``pad`` dummy sites far away from the geometry (distinct
    coordinates, so kernel distances stay finite)."""
    import jax.numpy as jnp

    if pad == 0:
        return sites
    span = jnp.max(jnp.abs(sites)) + 1.0
    coords = 1e6 * span * (1.0 + jnp.arange(pad, dtype=sites.dtype))
    return jnp.concatenate([sites, jnp.stack([coords, coords], axis=1)])


def sharded_self_field(mesh, sites, weights, g, diag=None):
    """Self-field ``Q @ (w * g)`` with rows sharded over ``model`` and the
    batch over ``data``: each device computes its row block of the O(n^2)
    kernel matvec locally.

    Args:
        mesh: ``(data, model)`` device mesh.
        sites: ``(n, 2)`` mesh sites (replicated).
        weights: ``(n,)`` vertex areas.
        g: ``(B, n)`` stream functions.
        diag: Optional precomputed Brandt diagonal from
            :func:`self_field_diagonal` -- pass it when calling repeatedly
            for the same mesh to skip the O(n^2 / n_model) row sums.

    Returns:
        ``(B, n)`` self-field, sharded ``P("data", "model")``.
    """
    import jax.numpy as jnp

    sites = jnp.asarray(sites)
    weights = jnp.asarray(weights)
    g = jnp.asarray(g)
    n = sites.shape[0]
    B = g.shape[0]
    n_p = _round_up_div(n, mesh.shape["model"])
    B_p = _round_up_div(B, mesh.shape["data"])
    if diag is None:
        diag = self_field_diagonal(mesh, sites, weights)
    sites_p = _pad_sites(sites, n_p - n)
    wg = weights[None, :] * g  # (B, n)
    wg_p = jnp.pad(wg, ((0, B_p - B), (0, 0)))

    from ..ops import kernels

    # The O(n^2) off-diagonal block runs sharded; the O(n) diagonal term
    # is added on the replicated arrays afterwards.
    f = jax.shard_map(
        lambda s_shard, s_full, wg_full: -kernels.q_apply_rect(
            s_shard, s_full, wg_full.T, use_pallas=True
        ).T,
        mesh=mesh,
        in_specs=(P("model", None), P(), P("data", None)),
        out_specs=P("data", "model"),
    )
    off_diag = f(sites_p, sites, wg_p)  # (B_p, n_p)
    return off_diag[:B, :n] + diag[None, :] * wg


def sharded_spd_inverse(mesh, neg_A, w_col, method: Optional[str] = None):
    """Explicit Brandt-system inverse with the O(n^3) matmuls GSPMD-sharded
    over the mesh's ``model`` axis (VERDICT r1 item 5 / SURVEY 5.7:
    "sharded dense LU / iterative solves").

    Both bodies are pure matmuls, so placing the input row-sharded lets XLA
    partition every matmul and insert the ICI collectives; each device
    holds ``n / n_model`` rows, putting films beyond one chip's HBM in
    reach of dense factorization.

    Args:
        mesh: ``(data, model)`` device mesh.
        neg_A: The negated film system matrix ``-A``.
        w_col: Column weights such that ``-A / w`` is SPD.
        method: ``"schur"`` (default; recursive Schur-complement inverse,
            ~(4/3) n^3 flops) or ``"schulz"`` (Schulz-Hotelling iteration,
            ~100 n^3 flops but self-correcting).  Defaults to
            ``SUPERSCREEN_TPU_SHARDED_FACTOR``.

    Returns the solution operator ``M`` (``x = M @ h`` solves
    ``(-A) x = h``), row-sharded over ``model``.
    """
    import os

    import jax.numpy as jnp

    from ..ops import linalg

    if method is None:
        method = os.environ.get("SUPERSCREEN_TPU_SHARDED_FACTOR", "schur")
    if method not in ("schur", "schulz"):
        # Validate BEFORE the multi-GB device_put below.
        raise ValueError(
            f"Unknown sharded factorization method {method!r} "
            "(expected 'schur' or 'schulz')."
        )
    row = NamedSharding(mesh, P("model", None))
    replicated = NamedSharding(mesh, P())
    neg_A = jax.device_put(jnp.asarray(neg_A), row)
    w_col = jax.device_put(jnp.asarray(w_col), replicated)
    # One jitted program with the OUTPUT pinned row-sharded: eager op-by-op
    # execution (or an unconstrained jit) lets XLA hand back a replicated
    # M, which would put the full (n, n) inverse on every device and defeat
    # the point of the model axis.
    body = (
        linalg._jax_spd_inverse
        if method == "schulz"
        else linalg._jax_schur_explicit_inverse
    )
    return jax.jit(body, out_shardings=row)(neg_A, w_col)
