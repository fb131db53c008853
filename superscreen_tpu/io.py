"""HDF5 serialization helpers.

Arbitrary Python objects (applied-field callables, position-dependent
``Parameter`` penetration depths) are dill-pickled into ``np.void``
attributes/datasets, as in the reference ``superscreen/io.py:8-44``.
:func:`h5_context` is the shared open-file-or-group adapter used by every
``to_hdf5``/``from_hdf5`` in the package.
"""

from contextlib import contextmanager, nullcontext
from typing import Any

import dill
import h5py
import numpy as np

__all__ = ["serialize_obj", "deserialize_obj", "h5_context"]

_PICKLE_SUFFIX = ".pickle"


@contextmanager
def h5_context(path_or_group, mode: str):
    """Yield an :class:`h5py.Group`, opening ``path_or_group`` as a file if
    it is not already an open group."""
    if isinstance(path_or_group, h5py.Group):
        ctx = nullcontext(path_or_group)
    else:
        ctx = h5py.File(path_or_group, mode)
    with ctx as group:
        yield group


def _pickled(obj: Any) -> np.void:
    return np.void(dill.dumps(obj))


def _unpickled(raw) -> Any:
    return dill.loads(np.void(raw).tobytes())


def serialize_obj(group: h5py.Group, obj: Any, name: str, attr: bool = False) -> None:
    """Serialize ``obj`` into ``group`` under ``name``.

    With ``attr=True``, natively-storable values (numbers, strings, small
    arrays) become plain HDF5 attributes; anything else falls back to a
    dill-pickled ``<name>.pickle`` attribute.  Without ``attr``, the object
    is always pickled into a dataset.
    """
    if not attr:
        group[name + _PICKLE_SUFFIX] = _pickled(obj)
        return
    try:
        group.attrs[name] = obj
    except TypeError:
        group.attrs[name + _PICKLE_SUFFIX] = _pickled(obj)


def deserialize_obj(group: h5py.Group, name: str, attr: bool = False) -> Any:
    """Inverse of :func:`serialize_obj`."""
    pickled_name = name + _PICKLE_SUFFIX
    if attr:
        if name in group.attrs:
            return group.attrs[name]
        if pickled_name in group.attrs:
            return _unpickled(group.attrs[pickled_name])
    elif pickled_name in group:
        return _unpickled(group[pickled_name][()])
    raise IOError(f"Unable to load {name}.")
