"""Layer: one plane of the device stack.

A layer fixes a vertical position ``z0`` and the screening strength of any
films placed in it, specified either directly as an effective penetration
depth ``Lambda`` or as a London penetration depth plus film thickness
(``Lambda = london_lambda**2 / thickness``).  Either quantity may be a plain
number or a position-dependent :class:`superscreen_tpu.Parameter`.

Public contract matches the reference ``superscreen/device/layer.py:11-138``;
the internals here store the screening specification as a tagged pair and
derive everything else from it.
"""

import numbers

import h5py

from ..io import deserialize_obj, serialize_obj
from ..parameter import Parameter

__all__ = ["Layer"]


def _values_match(a, b) -> bool:
    try:
        return bool(a == b)
    except Exception:
        return False

# Tags for the internal screening specification.
_DIRECT = "Lambda"  # user gave Lambda directly
_LONDON = "london"  # user gave (london_lambda, thickness)


class Layer:
    """A single layer of a superconducting device.

    Args:
        name: Name of the layer.
        Lambda: Effective magnetic penetration depth of films in this layer.
            Mutually exclusive with ``london_lambda``/``thickness``.
        london_lambda: London penetration depth of films in this layer.
            Requires ``thickness``.
        thickness: Film thickness; requires ``london_lambda``.
        z0: Vertical position of the layer plane.
    """

    def __init__(self, name, Lambda=None, london_lambda=None, thickness=None, z0=0):
        gave_direct = Lambda is not None
        gave_london = london_lambda is not None or thickness is not None
        if gave_direct and gave_london:
            raise ValueError(
                f"Layer {name!r}: Lambda is mutually exclusive with "
                "london_lambda/thickness."
            )
        if gave_direct:
            spec = (_DIRECT, Lambda)
        elif london_lambda is not None and thickness is not None:
            spec = (_LONDON, (london_lambda, thickness))
        else:
            raise ValueError(
                f"Layer {name!r}: specify either Lambda, or both "
                "london_lambda and thickness."
            )
        self.name = name
        self.z0 = z0
        self._spec = spec

    @property
    def london_lambda(self):
        tag, value = self._spec
        return value[0] if tag == _LONDON else None

    @london_lambda.setter
    def london_lambda(self, new):
        tag, value = self._spec
        if tag != _LONDON:
            raise AttributeError(
                "This layer is specified directly by Lambda; set Lambda instead."
            )
        self._spec = (_LONDON, (new, value[1]))

    @property
    def thickness(self):
        tag, value = self._spec
        return value[1] if tag == _LONDON else None

    @thickness.setter
    def thickness(self, new):
        tag, value = self._spec
        if tag != _LONDON:
            raise AttributeError(
                "This layer is specified directly by Lambda; set Lambda instead."
            )
        self._spec = (_LONDON, (value[0], new))

    @property
    def Lambda(self):
        """Effective penetration depth ``Lambda = london_lambda**2 / thickness``."""
        tag, value = self._spec
        if tag == _DIRECT:
            return value
        london, d = value
        return london**2 / d

    @Lambda.setter
    def Lambda(self, value) -> None:
        if self._spec[0] != _DIRECT:
            raise AttributeError(
                "This layer is specified by (london_lambda, thickness); "
                "set those instead of Lambda."
            )
        self._spec = (_DIRECT, value)

    def copy(self) -> "Layer":
        tag, value = self._spec
        if tag == _DIRECT:
            return Layer(self.name, Lambda=value, z0=self.z0)
        return Layer(
            self.name, london_lambda=value[0], thickness=value[1], z0=self.z0
        )

    def __deepcopy__(self, memo) -> "Layer":
        return self.copy()

    def __repr__(self) -> str:
        def fmt(q):
            return f"{q:.3f}" if isinstance(q, numbers.Real) else repr(q)

        return (
            f"Layer({self.name!r}, Lambda={fmt(self.Lambda)}, "
            f"london_lambda={fmt(self.london_lambda) if self.london_lambda is not None else None}, "
            f"thickness={fmt(self.thickness) if self.thickness is not None else None}, "
            f"z0={self.z0:.3f})"
        )

    def _key(self):
        return (self.name, self.z0, self.london_lambda, self.thickness, self.Lambda)

    def __eq__(self, other) -> bool:
        if not isinstance(other, Layer):
            return NotImplemented
        return self is other or all(
            _values_match(a, b) for a, b in zip(self._key(), other._key())
        )

    # -- HDF5 ---------------------------------------------------------------
    def to_hdf5(self, h5group: h5py.Group) -> None:
        h5group.attrs["name"] = self.name
        h5group.attrs["z0"] = self.z0
        tag, value = self._spec
        h5group.attrs["spec"] = tag
        if tag == _DIRECT:
            serialize_obj(h5group, value, "Lambda", attr=True)
        else:
            h5group.attrs["thickness"] = value[1]
            serialize_obj(h5group, value[0], "london_lambda", attr=True)

    @staticmethod
    def from_hdf5(h5group: h5py.Group) -> "Layer":
        name = str(h5group.attrs["name"])
        z0 = float(h5group.attrs["z0"])
        # Files written before the "spec" tag existed are recognized by
        # which attributes are present.
        has_london = (
            "london_lambda" in h5group.attrs
            or "london_lambda.pickle" in h5group.attrs
        )
        if has_london:
            return Layer(
                name,
                london_lambda=deserialize_obj(h5group, "london_lambda", attr=True),
                thickness=float(h5group.attrs["thickness"]),
                z0=z0,
            )
        return Layer(
            name, Lambda=deserialize_obj(h5group, "Lambda", attr=True), z0=z0
        )
