"""Fluxoid tools: enclosing polygons and fluxoid-state optimization.

Reference: ``superscreen/fluxoid.py``.
"""

import logging
from typing import Dict, List, Optional, Union

import numpy as np

from . import polygon_ops as pops
from .device import Device
from .solution import Solution
from .solver import FactorizedModel, solve

logger = logging.getLogger(__name__)

__all__ = ["make_fluxoid_polygons", "find_fluxoid_solution"]


def make_fluxoid_polygons(
    device: Device,
    holes: Optional[Union[List[str], str]] = None,
    join_style: str = "mitre",
    interp_points: Optional[int] = None,
) -> Dict[str, np.ndarray]:
    """Generates polygons enclosing the given holes for fluxoid calculation:
    each hole is buffered outward by half the minimum distance to any other
    polygon in its layer (reference: ``fluxoid.py:13-52``).

    Args:
        device: The device.
        holes: Hole name(s) (defaults to all holes).
        join_style: Buffer join style.
        interp_points: Resample the polygons to this many vertices.

    Returns:
        ``{hole_name: polygon_coordinates}``.
    """
    device_polygons = {**device.films, **device.holes}
    device_holes = device.holes
    if holes is None:
        holes = list(device_holes)
    if isinstance(holes, str):
        holes = [holes]
    polygons = {}
    for name in holes:
        hole = device_holes[name]
        min_dist = min(
            pops.polygon_boundary_distance(hole.points, other.points)
            for other in device_polygons.values()
            if other.layer == hole.layer and other.name != name
        )
        delta = min_dist / 2
        new_poly = pops.buffer_polygon(hole.points, delta, join_style=join_style)
        if interp_points:
            new_poly = pops.resample_polygon(new_poly, interp_points)
        polygons[name] = new_poly
    return polygons


def find_fluxoid_solution(
    model: FactorizedModel,
    fluxoids: Optional[Dict[str, float]] = None,
    **solve_kwargs,
) -> Solution:
    """Solves for the circulating currents that realize the given fluxoid
    state (in units of Phi_0 per hole), then returns the optimized solution.

    The circulating currents are the solution of ``M I = Phi_target - Phi_0``
    where ``M`` is the mutual inductance matrix (reference:
    ``fluxoid.py:55-119``).

    Args:
        model: The factorized model.
        fluxoids: ``{hole_name: fluxoid_in_Phi_0}`` (missing holes default
            to 0).
        solve_kwargs: Passed to :func:`superscreen_tpu.solve`.
    """
    device = model.device
    fluxoids = fluxoids or {}
    hole_names = list(device.holes)
    current_units = model.current_units
    inductance_units = f"Phi_0 / {current_units}"
    solve_kwargs = solve_kwargs.copy()
    applied_field = solve_kwargs.pop("applied_field", None)
    target_fluxoids = np.array([fluxoids.get(name, 0) for name in hole_names])

    orig_circulating_currents = model.circulating_currents
    try:
        model.set_circulating_currents({name: 0 for name in hole_names})
        solution_no_circ = solve(
            model=model, applied_field=applied_field, **solve_kwargs
        )[-1]

        if not hole_names:
            if np.any(target_fluxoids):
                raise ValueError(
                    "Cannot calculate nonzero fluxoid solution for a device "
                    "with no holes."
                )
            return solution_no_circ

        base_fluxoids = np.array(
            [
                sum(solution_no_circ.hole_fluxoid(name)).to("Phi_0").magnitude
                for name in hole_names
            ]
        )
        M = device.mutual_inductance_matrix(units=inductance_units, **solve_kwargs)
        I_circ = np.linalg.solve(
            np.asarray(M.magnitude), target_fluxoids - base_fluxoids
        )
        circulating_currents = dict(zip(hole_names, I_circ))
        model.set_circulating_currents(circulating_currents)
        solution = solve(model=model, applied_field=applied_field, **solve_kwargs)[
            -1
        ]
    finally:
        model.set_circulating_currents(orig_circulating_currents)
    return solution
