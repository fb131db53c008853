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

from typing import Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "sharded_film_data",
    "shard_sweep_inputs",
    "sharded_biot_savart",
    "sharded_self_field",
]


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


def sharded_film_data(film_data: Dict[str, "object"], mesh: Mesh):
    """Places each film's sweep arrays on the mesh: the dense kernel ``Q``
    and the system matrix ``A`` are sharded row-wise over ``model``;
    everything else is replicated.

    Args:
        film_data: ``{film_name: FilmSweepData}`` from
            :mod:`superscreen_tpu.sweep`.
        mesh: The device mesh.

    Returns:
        A new ``{film_name: FilmSweepData}`` with device-placed arrays.
    """
    from ..sweep import FilmSweepData, _FSD_ARRAY_FIELDS, _FSD_STATIC_FIELDS

    row_sharded = NamedSharding(mesh, P("model", None))
    replicated = replicated_sharding(mesh)
    out = {}
    for name, data in film_data.items():
        kwargs = {}
        for f in _FSD_STATIC_FIELDS:
            kwargs[f] = getattr(data, f)
        for f in _FSD_ARRAY_FIELDS:
            val = getattr(data, f)
            if val is None:
                kwargs[f] = None
                continue
            if f in ("Q",) and val.ndim == 2 and val.shape[0] % mesh.shape[
                "model"
            ] == 0:
                kwargs[f] = jax.device_put(val, row_sharded)
            else:
                kwargs[f] = jax.device_put(val, replicated)
        out[name] = FilmSweepData(**kwargs)
    return out


def shard_sweep_inputs(
    Hz_applied: Dict[str, np.ndarray],
    I_circ: Dict[str, np.ndarray],
    mesh: Mesh,
) -> Tuple[Dict, Dict]:
    """Shards the sweep right-hand sides over the ``data`` axis."""
    sh = NamedSharding(mesh, P("data", None))
    Hz = {k: jax.device_put(np.asarray(v), sh) for k, v in Hz_applied.items()}
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
    if B % n_data or _round_up_div(n_dst, n_model) != n_dst:
        # Pad to shard-divisible shapes; padded rows/batch entries are
        # discarded below.
        pass
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


def sharded_self_field(mesh, sites, weights, g):
    """Self-field ``Q @ (w * g)`` with rows sharded over ``model`` and the
    batch over ``data``.  The regularized Brandt diagonal (which needs the
    FULL site set) is computed matrix-free and replicated (O(n) work); the
    O(n^2) off-diagonal kernel matvec is computed per row shard.

    Args:
        mesh: ``(data, model)`` device mesh.
        sites: ``(n, 2)`` mesh sites (replicated).
        weights: ``(n,)`` vertex areas.
        g: ``(B, n)`` stream functions.

    Returns:
        ``(B, n)`` self-field, sharded ``P("data", "model")``.
    """
    import jax.numpy as jnp

    from ..ops import kernels

    sites = jnp.asarray(sites)
    weights = jnp.asarray(weights)
    g = jnp.asarray(g)
    n = sites.shape[0]
    B = g.shape[0]
    n_model = mesh.shape["model"]
    n_data = mesh.shape["data"]
    n_p = _round_up_div(n, n_model)
    B_p = _round_up_div(B, n_data)
    # Replicated O(n) prep: the Brandt diagonal from the full site set.
    C = kernels.C_vector(sites, dtype=sites.dtype)
    q_row_w = kernels.q_apply(sites, weights)
    diag = (C + q_row_w) / weights  # (n,)
    span = jnp.max(jnp.abs(sites)) + 1.0
    pad_coords = 1e6 * span * (1.0 + jnp.arange(n_p - n, dtype=sites.dtype))
    sites_p = jnp.concatenate(
        [sites, jnp.stack([pad_coords, pad_coords], axis=1)]
    )
    diag_p = jnp.pad(diag, (0, n_p - n))
    wg = weights[None, :] * g  # (B, n)
    wg_p = jnp.pad(wg, ((0, B_p - B), (0, 0)))

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
    off_diag = f(sites_p, sites_p[:n], wg_p)  # (B_p, n_p)
    out = off_diag[:B, :n] + diag[None, :] * wg
    return out
