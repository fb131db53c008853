"""Sheet-current Biot-Savart field source.

Same physics as ``superscreen/sources/current.py``; the O(n_eval * n_mesh)
sum runs through the blocked JAX kernel
:func:`superscreen_tpu.ops.kernels.biot_savart_2d_field` instead of a
numba loop.
"""

from typing import Optional, Union

import numpy as np

from ..ops.kernels import biot_savart_2d_field
from ..parameter import Parameter
from ..units import ureg


__all__ = ["biot_savart_2d", "SheetCurrentField"]


def _si_factor(units: str, target: str) -> float:
    """Conversion factor from ``units`` to the SI ``target`` unit."""
    return ureg(units).to(target).magnitude


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
    meters = _si_factor(length_units, "m")
    x, y, z = np.atleast_1d(x, y, z)
    z = np.broadcast_to(z, x.shape) if z.size == 1 else z
    targets = np.column_stack([x, y, z]) * meters

    sheet_xy, densities = np.atleast_2d(positions, current_densities)
    sheet_xy = sheet_xy * meters
    densities = densities * _si_factor(
        f"{current_units} / {length_units}", "A / m"
    )
    if areas is None:
        from scipy.spatial import Delaunay

        from ..ops.fem import vertex_areas

        # sheet_xy is in meters here, so the computed areas are in m**2.
        areas = vertex_areas(sheet_xy, Delaunay(sheet_xy).simplices)
    else:
        areas = np.asarray(areas) * meters**2
    sheet_xyz = np.column_stack(
        [sheet_xy, np.full(len(sheet_xy), z0 * meters)]
    )
    field = biot_savart_2d_field(
        targets, sheet_xyz, densities, areas, vector=vector
    )
    return np.asarray(field)


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
