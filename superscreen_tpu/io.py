"""HDF5 serialization helpers.

Arbitrary Python objects (applied-field callables, position-dependent
``Parameter`` penetration depths) are stored as dill-pickled bytes inside
``np.void`` attributes/datasets, mirroring the reference ``superscreen/io.py``.
"""

from typing import Any

import dill
import h5py
import numpy as np

__all__ = ["serialize_obj", "deserialize_obj"]


def serialize_obj(group: h5py.Group, obj: Any, name: str, attr: bool = False) -> None:
    """Serialize an object into an :class:`h5py.Group`.

    Args:
        group: The group in which to save the object.
        obj: The object to serialize.
        name: The name under which to store it.
        attr: Store as a group attribute when the type allows it.
    """
    if attr:
        try:
            group.attrs[name] = obj
        except TypeError:
            group.attrs[f"{name}.pickle"] = np.void(dill.dumps(obj))
    else:
        group[f"{name}.pickle"] = np.void(dill.dumps(obj))


def deserialize_obj(group: h5py.Group, name: str, attr: bool = False) -> Any:
    """Deserialize an object previously stored with :func:`serialize_obj`."""
    if attr:
        if name in group.attrs:
            return group.attrs[name]
        if f"{name}.pickle" in group.attrs:
            return dill.loads(np.void(group.attrs[f"{name}.pickle"]).tobytes())
    elif f"{name}.pickle" in group:
        return dill.loads(np.void(group[f"{name}.pickle"][()]).tobytes())
    raise IOError(f"Unable to load {name}.")
