"""Top-level solve orchestration and the factorized-model cache.

API parity with the reference ``superscreen/solver/solve.py``: the
applied-field-independent work (film metadata + LU factorizations) lives in
:class:`FactorizedModel` so sweeps reuse it; :func:`solve` runs the initial
per-film solve plus ``iterations`` rounds of self-consistent inter-film
Biot-Savart coupling (the blocked JAX kernel
:func:`superscreen_tpu.ops.kernels.biot_savart_film_to_film`).
"""

import copy
import itertools
import logging
import os
from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Sequence, Union

import h5py
import numpy as np

from ..device import Device
from ..ops import kernels
from ..solution import FilmSolution, Solution, Vortex
from ..sources import ConstantField
from .solve_film import (
    LinearSystem,
    TerminalSystems,
    factorize_linear_systems,
    solve_film,
)
from .utils import (
    FilmInfo,
    currents_to_floats,
    field_conversion_factor,
    make_film_info,
)

logger = logging.getLogger("solve")

__all__ = ["FactorizedModel", "factorize_model", "solve"]


@dataclass
class FactorizedModel:
    """A pre-factorized model: everything applied-field-independent.

    Args:
        device: The :class:`Device`.
        film_info: ``{film_name: FilmInfo}``.
        film_systems: ``{film_name: LinearSystem}``.
        hole_systems: ``{film_name: {hole_name: LinearSystem}}``.
        terminal_systems: ``{film_name: TerminalSystems}``.
        terminal_currents: ``{film_name: {terminal_name: current}}``.
        circulating_currents: ``{hole_name: current}``.
        vortices: ``{film_name: vortices}``.
        current_units: The current units.
    """

    device: Device
    film_info: Dict[str, FilmInfo]
    film_systems: Dict[str, LinearSystem]
    hole_systems: Dict[str, Dict[str, LinearSystem]]
    terminal_systems: Dict[str, TerminalSystems]
    terminal_currents: Dict[str, Dict[str, float]]
    circulating_currents: Dict[str, float]
    vortices: Dict[str, Sequence[Vortex]]
    current_units: str

    def to_hdf5(self, h5group: h5py.Group) -> None:
        """Saves the model (including LU factors) to HDF5."""
        h5group.attrs["current_units"] = self.current_units
        self.device.to_hdf5(h5group.create_group("device"))
        film_info_grp = h5group.create_group("film_info")
        for film, info in self.film_info.items():
            info.to_hdf5(film_info_grp.create_group(film))
        film_systems_grp = h5group.create_group("film_systems")
        for film, system in self.film_systems.items():
            system.to_hdf5(film_systems_grp.create_group(film))
        hole_systems_grp = h5group.create_group("hole_systems")
        for film, holes in self.hole_systems.items():
            film_grp = hole_systems_grp.create_group(film)
            for hole, system in holes.items():
                system.to_hdf5(film_grp.create_group(hole))
        terminal_systems_grp = h5group.create_group("terminal_systems")
        for film, systems in self.terminal_systems.items():
            systems.to_hdf5(terminal_systems_grp.create_group(film))
        term_grp = h5group.create_group("terminal_currents")
        for film, terminals in self.terminal_currents.items():
            film_grp = term_grp.create_group(film)
            film_grp.attrs.update(terminals)
        circ_grp = h5group.create_group("circulating_currents")
        circ_grp.attrs.update(self.circulating_currents)
        vortex_grp = h5group.create_group("vortices")
        i = 0
        for film_vortices in self.vortices.values():
            for vortex in film_vortices:
                vortex.to_hdf5(vortex_grp.create_group(str(i)))
                i += 1

    @staticmethod
    def from_hdf5(h5group: h5py.Group) -> "FactorizedModel":
        """Loads a model from HDF5."""
        current_units = h5group.attrs["current_units"]
        device = Device.from_hdf5(h5group["device"])
        film_info = {
            film: FilmInfo.from_hdf5(grp)
            for film, grp in h5group["film_info"].items()
        }
        film_systems = {
            film: LinearSystem.from_hdf5(grp)
            for film, grp in h5group["film_systems"].items()
        }
        hole_systems = {}
        for film, grp in h5group["hole_systems"].items():
            hole_systems[film] = {
                hole: LinearSystem.from_hdf5(subgrp)
                for hole, subgrp in grp.items()
            }
        terminal_systems = {
            film: TerminalSystems.from_hdf5(grp)
            for film, grp in h5group["terminal_systems"].items()
        }
        terminal_currents = {
            film: dict(grp.attrs)
            for film, grp in h5group["terminal_currents"].items()
        }
        circulating_currents = dict(h5group["circulating_currents"].attrs)
        vortex_grp = h5group["vortices"]
        all_vortices = [
            Vortex.from_hdf5(vortex_grp[i]) for i in sorted(vortex_grp, key=int)
        ]
        vortices = {film: [] for film in film_info}
        for vortex in all_vortices:
            vortices[vortex.film].append(vortex)
        vortices = {film: tuple(v) for film, v in vortices.items()}
        return FactorizedModel(
            device=device,
            film_info=film_info,
            film_systems=film_systems,
            hole_systems=hole_systems,
            terminal_systems=terminal_systems,
            terminal_currents=terminal_currents,
            circulating_currents=circulating_currents,
            vortices=vortices,
            current_units=current_units,
        )

    def set_circulating_currents(
        self, circulating_currents: Dict[str, float]
    ) -> None:
        """Sets the circulating currents without re-factorizing.

        Args:
            circulating_currents: ``{hole_name: current}`` in
                ``self.current_units``.
        """
        diff = set(circulating_currents) - set(self.device.holes)
        if diff:
            raise KeyError(
                "circulating_currents contains keys not in "
                f"self.device.holes: {list(diff)!r}"
            )
        self.circulating_currents = circulating_currents.copy()
        holes_by_film = self.device.holes_by_film()
        for film_name, film_info in self.film_info.items():
            holes = [hole.name for hole in holes_by_film[film_name]]
            film_info.circulating_currents = {}
            for hole, current in self.circulating_currents.items():
                if hole in holes:
                    film_info.circulating_currents[hole] = current

    def set_vortices(self, vortices: Sequence[Vortex]) -> None:
        """Sets the vortices without re-factorizing."""
        by_film = {name: [] for name in self.film_info}
        for vortex in vortices:
            by_film[vortex.film].append(vortex)
        self.vortices = {}
        for name, film in self.film_info.items():
            film.vortices = tuple(by_film[name])
            self.vortices[name] = film.vortices

    def copy(self) -> "FactorizedModel":
        return copy.copy(self)


def factorize_model(
    *,
    device: Device,
    current_units: str,
    terminal_currents: Optional[Dict[str, Dict]] = None,
    circulating_currents: Optional[Dict[str, Union[float, str]]] = None,
    vortices: Optional[Sequence[Vortex]] = None,
) -> FactorizedModel:
    """Prepares the applied-field-independent part of a model, LU-factorizing
    the per-film linear systems on device.

    Args:
        device: The device to simulate.
        current_units: Units for currents; applied fields are converted to
            ``current_units / device.length_units``.
        terminal_currents: ``{film_name: {terminal_name: current}}``.
        circulating_currents: ``{hole_name: current}`` (floats in
            ``current_units``, or strings/Quantities with units).
        vortices: Vortices in the device.
    """
    ureg = device.ureg
    circulating_currents = circulating_currents or {}
    circulating_currents = currents_to_floats(
        circulating_currents, ureg, current_units
    )
    terminal_currents = terminal_currents or {}
    terminal_currents = {
        film_name: currents_to_floats(currents, ureg, current_units)
        for film_name, currents in terminal_currents.items()
    }
    for film_name, currents in terminal_currents.items():
        if sum(currents.values()):
            raise ValueError(
                f"Terminal currents in film {film_name!r} are not conserved."
            )
    vortices = vortices or []

    film_info = make_film_info(
        device=device,
        vortices=vortices,
        circulating_currents=circulating_currents,
        terminal_currents=terminal_currents,
    )
    film_systems, hole_systems, terminal_systems = factorize_linear_systems(
        device, film_info
    )
    vortices_by_film = {name: info.vortices for name, info in film_info.items()}
    return FactorizedModel(
        device,
        film_info,
        film_systems,
        hole_systems,
        terminal_systems,
        terminal_currents,
        circulating_currents,
        vortices_by_film,
        current_units,
    )


def _solve_device_resident(
    *,
    model: "FactorizedModel",
    applied_fields: Dict[str, np.ndarray],
    field_conversion: float,
    vortex_flux: float,
    iterations: int,
    solution_kwargs: Dict,
    save_path,
    return_solutions: bool,
) -> Optional[List[Solution]]:
    """Runs :func:`solve`'s numeric core as one jitted device program.

    The initial per-film solve plus the ``iterations``-round self-consistent
    coupling loop (reference ``solver/solve.py:459-545``) execute device-
    resident via the batched sweep machinery (batch size 1), with the full
    per-iteration history returned in a single host round-trip.  Matches
    ``solve_film`` results, including transport-terminal films (whose
    fixed transport stream and boundary effective field enter as offsets);
    ``check_inversion`` uses the legacy per-stage path.
    """
    import jax.numpy as jnp

    from ..sweep import (
        _get_sweep_data,
        _run_sweep_history,
        _strip_metadata,
    )

    device = model.device
    films = list(device.films)
    dtype = device.solve_dtype
    film_data = _get_sweep_data(model)
    Hz = {
        name: jnp.asarray(applied_fields[name][None].astype(dtype))
        for name in films
    }
    I_circ = {}
    for name in films:
        holes = film_data[name].hole_names
        row = np.array(
            [model.circulating_currents.get(h, 0.0) for h in holes],
            dtype=dtype,
        )
        I_circ[name] = jnp.asarray(row[None])
    eff_iterations = iterations if len(films) >= 2 else 0
    gs, Js, selfs, others = _run_sweep_history(
        _strip_metadata(film_data),
        Hz,
        I_circ,
        vortex_flux,
        eff_iterations,
        2,  # refine_steps, matching linalg.lu_solve_refined's default
    )
    # ONE host transfer for the whole history: pack every per-film
    # quantity into a single flat device buffer (each tunnel round-trip
    # costs ~0.1-1 s).  np.array copies below keep the final arrays
    # writable (downstream matplotlib tri interpolators write in place).
    import jax.numpy as _jnp

    packed = _jnp.concatenate(
        [
            _jnp.ravel(arr)
            for name in films
            for arr in (gs[name], Js[name], selfs[name], others[name])
        ]
    )
    flat = np.asarray(packed)
    gs_h, Js_h, selfs_h, others_h = {}, {}, {}, {}
    offset = 0

    def _take(shape):
        nonlocal offset
        size = int(np.prod(shape))
        out = np.array(flat[offset:offset + size]).reshape(shape)
        offset += size
        return out

    for name in films:
        hist_shape = gs[name].shape  # (H, B, n)
        gs_h[name] = _take(hist_shape)
        Js_h[name] = _take(hist_shape + (2,))
        selfs_h[name] = _take(hist_shape)
        others_h[name] = _take(hist_shape)
    gs, Js, selfs, others = gs_h, Js_h, selfs_h, others_h

    inv = 1.0 / field_conversion
    n_solutions = 1 if (len(films) < 2 or iterations < 1) else iterations + 1
    solutions: List[Solution] = []
    h5file = None
    try:
        if save_path is not None:
            h5file = h5py.File(save_path, "x")
            model.device.to_hdf5(h5file.create_group("device"))
        for i in range(n_solutions):
            film_solutions = {}
            for name in films:
                other = None
                if i > 0:
                    other = others[name][i, 0] * inv
                film_solutions[name] = FilmSolution(
                    stream=gs[name][i, 0],
                    current_density=Js[name][i, 0],
                    applied_field=applied_fields[name] * inv,
                    self_field=selfs[name][i, 0] * inv,
                    field_from_other_films=other,
                )
            solution = Solution(
                device=device, film_solutions=film_solutions, **solution_kwargs
            )
            if h5file is not None:
                solution.to_hdf5(
                    h5file.create_group(str(i)), device_path="/device"
                )
            if return_solutions:
                solutions.append(solution)
    finally:
        if h5file is not None:
            h5file.close()
    if return_solutions:
        return solutions
    return None


def solve(
    device: Optional[Device] = None,
    *,
    model: Optional[FactorizedModel] = None,
    applied_field: Optional[Callable] = None,
    terminal_currents: Optional[Dict[str, Dict]] = None,
    circulating_currents: Optional[Dict[str, Union[float, str]]] = None,
    vortices: Optional[Sequence[Vortex]] = None,
    field_units: str = "mT",
    current_units: str = "uA",
    check_inversion: bool = False,
    iterations: int = 0,
    return_solutions: bool = True,
    save_path: Optional[os.PathLike] = None,
    log_level: Optional[int] = None,
    progress_bar: bool = True,
    _solver: str = "superscreen_tpu.solve",
) -> List[Solution]:
    """Computes stream functions and fields for all films in a device.

    Strategy (reference ``solver/solve.py:290-549``):

    1. Solve each film given only the applied field.
    2. For ``iterations`` rounds, compute each film's screening field at
       every other film (Biot-Savart) and re-solve.

    Args:
        device: The device to simulate (or provide ``model``).
        model: A pre-factorized model (mutually exclusive with ``device``,
            ``terminal_currents``, ``circulating_currents``, ``vortices``).
        applied_field: Callable ``H_z(x, y, z)`` in ``field_units``.
        terminal_currents: ``{film_name: {terminal_name: current}}``.
        circulating_currents: ``{hole_name: current}``.
        vortices: Vortices in the device.
        field_units: Units of the applied field (H or B).
        current_units: Units for currents.
        check_inversion: Verify solve accuracy.
        iterations: Number of self-consistent coupling rounds.
        return_solutions: Return the list of Solutions.
        save_path: HDF5 path for incremental saving.
        log_level: Logging level.
        progress_bar: Show a progress bar over iterations.

    Returns:
        A list of ``iterations + 1`` Solutions (if ``return_solutions``).
    """
    if log_level is not None:
        logging.basicConfig(level=log_level)

    if model is None:
        if device is None:
            raise ValueError("Either a model or a device must be provided.")
        logger.info("Factorizing model.")
        model = factorize_model(
            device=device,
            current_units=current_units,
            terminal_currents=terminal_currents,
            circulating_currents=circulating_currents,
            vortices=vortices,
        )
    elif (
        device is not None
        or terminal_currents is not None
        or circulating_currents is not None
        or vortices is not None
    ):
        raise ValueError(
            "If model argument is provided, device, terminal_currents, "
            "circulating_currents, and vortices must be None."
        )

    if not isinstance(model, FactorizedModel):
        raise TypeError(
            f"model must be an instance of FactorizedModel (got {type(model)})."
        )

    device = model.device
    film_info = model.film_info
    film_systems = model.film_systems
    hole_systems = model.hole_systems
    terminal_systems = model.terminal_systems
    current_units = model.current_units

    if not device.meshes:
        raise ValueError(
            "The device does not have a mesh. Call device.make_mesh() to "
            "generate it."
        )

    dtype = device.solve_dtype
    ureg = device.ureg
    length_units = device.length_units
    meshes = device.meshes
    applied_field = applied_field or ConstantField(0)
    field_conversion = field_conversion_factor(
        field_units, current_units, length_units=length_units, ureg=ureg
    )
    logger.debug(
        f"Conversion factor from {field_units} to "
        f"{current_units} / {length_units}: {field_conversion}."
    )

    applied_fields = {}
    for film, mesh in meshes.items():
        layer = device.layers[film_info[film].layer]
        z0 = layer.z0 * np.ones(len(mesh.sites))
        Hz_applied = np.squeeze(
            np.asarray(
                applied_field(mesh.sites[:, 0], mesh.sites[:, 1], z0)
            )
            * field_conversion.magnitude
        ).astype(dtype, copy=False)
        Hz_applied = np.atleast_1d(Hz_applied)
        if Hz_applied.shape[0] == 1:
            Hz_applied = np.full(len(mesh.sites), Hz_applied.item(), dtype=dtype)
        if Hz_applied.ndim != 1:
            raise ValueError(
                "Expected applied_field to return a 1D vector, "
                f"got a {Hz_applied.ndim}D array."
            )
        applied_fields[film] = Hz_applied

    # Vortex flux in magnetization-like units: Phi_0 / mu_0 has dimensions
    # of [current] * [length].
    vortex_flux = (
        ureg("Phi_0 / mu_0").to(f"{current_units} * {length_units}").magnitude
    )

    solution_kwargs = dict(
        applied_field_func=applied_field,
        field_units=field_units,
        current_units=current_units,
        circulating_currents=model.circulating_currents,
        terminal_currents=model.terminal_currents,
        vortices=[v for vs in model.vortices.values() for v in vs]
        if isinstance(model.vortices, dict)
        else model.vortices,
        solver=_solver,
    )

    device_solve = os.environ.get("SUPERSCREEN_TPU_DEVICE_SOLVE", "auto")
    has_cg_film = any(
        s.lu_piv is not None
        and isinstance(s.lu_piv[0], str)
        and s.lu_piv[0] == "cg"
        for s in film_systems.values()
    )
    if (
        not check_inversion
        and device_solve != "0"
        # "auto": matrix-free CG films use the legacy per-stage path, whose
        # host-chunked CG keeps each device program short (a single jitted
        # CG running minutes trips execution watchdogs on tunneled TPUs);
        # force the fully device-resident path with
        # SUPERSCREEN_TPU_DEVICE_SOLVE=1.
        and not (device_solve == "auto" and has_cg_film)
    ):
        # Device-resident path: the whole initial solve + self-consistent
        # iteration history runs as one jitted program (one dispatch, one
        # host round-trip), instead of ~one dispatch per film per stage.
        return _solve_device_resident(
            model=model,
            applied_fields=applied_fields,
            field_conversion=field_conversion.magnitude,
            vortex_flux=vortex_flux,
            iterations=iterations,
            solution_kwargs=solution_kwargs,
            save_path=save_path,
            return_solutions=return_solutions,
        )

    solutions: List[Solution] = []
    film_solutions: Dict[str, FilmSolution] = {}

    for film_name in device.films:
        logger.info(f"Calculating {film_name!r} response to applied field.")
        film_solutions[film_name] = solve_film(
            device=device,
            applied_field=applied_fields[film_name],
            field_from_other_films=None,
            film_system=film_systems[film_name],
            hole_systems=hole_systems[film_name],
            film_info=film_info[film_name],
            field_conversion=field_conversion.magnitude,
            vortex_flux=vortex_flux,
            terminal_systems=terminal_systems.get(film_name, None),
            check_inversion=check_inversion,
        )

    solution = Solution(
        device=device, film_solutions=film_solutions, **solution_kwargs
    )
    if save_path is not None:
        with h5py.File(save_path, "x") as h5file:
            device.to_hdf5(h5file.create_group("device"))
            solution.to_hdf5(h5file.create_group(str(0)), device_path="/device")
    if return_solutions:
        solutions.append(solution)
    else:
        del solution

    if len(device.films) < 2 or iterations < 1:
        if return_solutions:
            return solutions
        return

    try:
        from tqdm import tqdm
    except ImportError:  # pragma: no cover
        def tqdm(x, **kw):
            return x

    for i in tqdm(
        range(iterations), desc="Solver iterations", disable=(not progress_bar)
    ):
        other_screening_fields = {
            name: np.zeros(len(mesh.sites), dtype=dtype)
            for name, mesh in meshes.items()
        }
        for source_film, film in itertools.product(device.films, repeat=2):
            if film == source_film:
                continue
            layer = device.layers[film_info[film].layer]
            other_layer = device.layers[film_info[source_film].layer]
            logger.debug(
                f"Calculating screening field at {film!r} "
                f"from {source_film!r} ({i + 1}/{iterations})."
            )
            other_screening_fields[film] += np.asarray(
                kernels.biot_savart_film_to_film(
                    meshes[source_film].sites,
                    other_layer.z0,
                    film_info[source_film].weights,
                    film_solutions[source_film].current_density,
                    meshes[film].sites,
                    layer.z0,
                ),
                dtype=dtype,
            )

        film_solutions = {}
        for film_name in device.films:
            film_solutions[film_name] = solve_film(
                device=device,
                applied_field=applied_fields[film_name],
                field_from_other_films=other_screening_fields[film_name],
                film_system=film_systems[film_name],
                hole_systems=hole_systems[film_name],
                film_info=film_info[film_name],
                field_conversion=field_conversion.magnitude,
                vortex_flux=vortex_flux,
                terminal_systems=terminal_systems.get(film_name, None),
                check_inversion=check_inversion,
            )
        solution = Solution(
            device=device, film_solutions=film_solutions, **solution_kwargs
        )
        if save_path is not None:
            with h5py.File(save_path, "r+") as h5file:
                solution.to_hdf5(
                    h5file.create_group(str(i + 1)), device_path="/device"
                )
        if return_solutions:
            solutions.append(solution)
        else:
            del solution
    if return_solutions:
        return solutions
