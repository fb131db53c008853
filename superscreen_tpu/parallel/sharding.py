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
