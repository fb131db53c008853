"""Hypres SQUID susceptometer layouts (400 nm and 250 nm).

The reference builds these from digitized GDS coordinate files
(``docs/notebooks/squids/hypres/small.py:11-20`` loads
``hypres-400nm.npz``; ``xsmall.py:22`` loads ``hypres-250nm.npz``).
Those ``.npz`` data files are NOT distributed with the reference source
checkout, so here the loaders accept an explicit path (or the
``SUPERSCREEN_TPU_HYPRES_DATA`` directory) and raise a clear error when
the digitized coordinates are unavailable.  The layer stack
(:func:`hypres_squid_layers`) and the device-assembly logic are complete.
"""

import os
from typing import Dict, Optional

import numpy as np

from ..device import Device, Polygon
from ..geometry import box
from .layers import hypres_squid_layers

__all__ = ["hypres_squid_layers", "load_polygons", "make_squid"]

_LAYER_OF = {
    "fc": "BE",
    "fc_center": "BE",
    "fc_shield": "W1",
    "pl": "W1",
    "pl_center": "W1",
    "pl_shield": "W2",
    "pl_shield2": "BE",
}


def _data_path(filename: str, data_path: Optional[str]) -> str:
    if data_path is not None:
        return data_path
    root = os.environ.get("SUPERSCREEN_TPU_HYPRES_DATA")
    if root:
        candidate = os.path.join(root, filename)
        if os.path.isfile(candidate):
            return candidate
    raise FileNotFoundError(
        f"The digitized Hypres geometry file {filename!r} is not part of "
        "the reference source distribution. Provide it via the data_path "
        "argument or the SUPERSCREEN_TPU_HYPRES_DATA directory."
    )


def load_polygons(
    filename: str = "hypres-400nm.npz", data_path: Optional[str] = None
) -> Dict[str, np.ndarray]:
    """Loads the digitized polygon coordinates for a Hypres layout."""
    with np.load(_data_path(filename, data_path)) as data:
        return dict(data)


def make_squid(
    with_terminals: bool = True,
    align_layers: str = "middle",
    data_path: Optional[str] = None,
) -> Device:
    """Builds the Hypres 400 nm susceptometer (reference
    ``docs/notebooks/squids/hypres/small.py``) from digitized coordinates.

    Args:
        with_terminals: Cut the field coil open and attach source/drain
            terminals.
        align_layers: Model-plane placement within each metal layer.
        data_path: Path to ``hypres-400nm.npz`` (see module docstring).
    """
    coords = load_polygons("hypres-400nm.npz", data_path)
    films = {
        name: Polygon(name, layer=_LAYER_OF[name], points=coords[name]).resample(151)
        for name in ("fc", "fc_shield", "pl", "pl_shield")
    }
    holes = {
        name: Polygon(name, layer=_LAYER_OF[name], points=coords[name]).resample(151)
        for name in ("pl_center", "fc_center")
    }

    terminals = None
    if with_terminals:
        fc_center = holes.pop("fc_center")
        mask = Polygon(points=box(5)).rotate(45).translate(6.5, -5.5)
        films["fc"] = (
            films["fc"].difference(mask, fc_center).resample(501).set_layer("BE")
        )

        def lead(name, dx, dy):
            return (
                Polygon(name, layer="BE", points=box(2, 0.1))
                .rotate(45)
                .translate(dx, dy)
            )

        terminals = {"fc": [lead("source", 5.5, -2.95), lead("drain", 3.95, -4.5)]}

    return Device(
        "hypres_400nm",
        layers=hypres_squid_layers(align=align_layers),
        films=list(films.values()),
        holes=list(holes.values()),
        terminals=terminals,
        length_units="um",
    )
