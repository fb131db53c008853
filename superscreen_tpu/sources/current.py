"""Sheet-current Biot-Savart field source.

Reference: ``superscreen/sources/current.py``.  The O(n_eval * n_mesh) sum is
evaluated by the blocked JAX kernel
:func:`superscreen_tpu.ops.kernels.biot_savart_2d_field`.
"""

from typing import Optional, Union

import numpy as np

from ..ops.kernels import biot_savart_2d_field
from ..parameter import Parameter
from ..units import ureg

__all__ = ["biot_savart_2d", "SheetCurrentField"]


def biot_savart_2d(
    x: Union[float, np.ndarray],
    y: Union[float, np.ndarray],
    z: Union[float, np.ndarray],
    *,
    positions: np.ndarray,
    current_densities: np.ndarray,
    z0: float = 0,
    areas: Optional[np.ndarray] = None,
    length_units: str = "um",
    current_units: str = "uA",
    vector: bool = True,
) -> np.ndarray:
    """Magnetic field (tesla) at ``(x, y, z)`` from a 2D sheet of current at
    height ``z0``.

    Args:
        x, y, z: Evaluation coordinates (``length_units``), scalars or
            shape ``(n,)`` vectors.
        positions: ``(m, 2)`` sheet coordinates in ``length_units``.
        current_densities: ``(m, 2)`` sheet current density in
            ``current_units / length_units``.
        z0: Vertical position of the current sheet.
        areas: ``(m,)`` vertex areas in ``length_units**2``; computed by
            Delaunay triangulation if omitted.
        length_units: Units of all coordinates.
        current_units: Units of currents.
        vector: Return the full vector field ``(n, 3)`` instead of just the
            z-component ``(n,)``.
    """
    to_meter = ureg(length_units).to("m").magnitude
    to_amp_per_meter = (
        ureg(f"{current_units} / {length_units}").to("A / m").magnitude
    )
    x, y, z = np.atleast_1d(x, y, z)
    if z.shape[0] == 1:
        z = z * np.ones_like(x)
    eval_positions = np.stack([x, y, z], axis=1) * to_meter
    positions, current_densities = np.atleast_2d(positions, current_densities)
    current_densities = current_densities * to_amp_per_meter
    positions = positions * to_meter
    z0 = z0 * np.ones(len(positions)) * to_meter
    if areas is None:
        from scipy.spatial import Delaunay

        from ..ops.fem import vertex_areas

        triangles = Delaunay(positions).simplices
        areas = vertex_areas(positions, triangles)
    else:
        areas = np.asarray(areas) * to_meter**2
    positions = np.concatenate([positions, z0[:, np.newaxis]], axis=1)
    B = biot_savart_2d_field(
        eval_positions, positions, current_densities, areas, vector=vector
    )
    return np.asarray(B)


def SheetCurrentField(
    *,
    sheet_positions: np.ndarray,
    current_densities: np.ndarray,
    z0: float,
    length_units: str = "um",
    current_units: str = "uA",
) -> Parameter:
    """A Parameter computing the z-component of the field (in tesla) from a
    2D sheet of current, so one solution can drive another model.

    Args:
        sheet_positions: ``(m, 2)`` sheet coordinates.
        current_densities: ``(m, 2)`` sheet current density.
        z0: Vertical position of the sheet.
        length_units: Units of all coordinates.
        current_units: Units of currents.
    """
    return Parameter(
        biot_savart_2d,
        positions=sheet_positions,
        current_densities=current_densities,
        z0=z0,
        length_units=length_units,
        current_units=current_units,
        vector=False,
    )
