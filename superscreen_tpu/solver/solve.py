"""Top-level solve orchestration and the factorized-model cache.

API parity with the reference ``superscreen/solver/solve.py``: the
applied-field-independent work (film metadata + LU factorizations) lives in
:class:`FactorizedModel` so sweeps reuse it; :func:`solve` runs the initial
per-film solve plus ``iterations`` rounds of self-consistent inter-film
Biot-Savart coupling (the blocked JAX kernel
:func:`superscreen_tpu.ops.kernels.biot_savart_film_to_film`).
"""

import copy
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


def _save_mapping(parent: h5py.Group, name: str, mapping: Dict) -> h5py.Group:
    """Writes a ``{key: obj}`` dict of ``to_hdf5``-able objects as one
    subgroup per key under ``parent[name]``."""
    grp = parent.create_group(name)
    for key, obj in mapping.items():
        obj.to_hdf5(grp.create_group(key))
    return grp


def _load_mapping(grp: h5py.Group, loader) -> Dict:
    return {key: loader(sub) for key, sub in grp.items()}


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
        _save_mapping(h5group, "film_info", self.film_info)
        _save_mapping(h5group, "film_systems", self.film_systems)
        holes = h5group.create_group("hole_systems")
        for film, systems in self.hole_systems.items():
            _save_mapping(holes, film, systems)
        _save_mapping(h5group, "terminal_systems", self.terminal_systems)
        terms = h5group.create_group("terminal_currents")
        for film, currents in self.terminal_currents.items():
            terms.create_group(film).attrs.update(currents)
        circ = h5group.create_group("circulating_currents")
        circ.attrs.update(self.circulating_currents)
        flat_vortices = [v for vs in self.vortices.values() for v in vs]
        _save_mapping(
            h5group, "vortices", {str(i): v for i, v in enumerate(flat_vortices)}
        )

    @staticmethod
    def from_hdf5(h5group: h5py.Group) -> "FactorizedModel":
        """Loads a model from HDF5."""
        film_info = _load_mapping(h5group["film_info"], FilmInfo.from_hdf5)
        vortex_grp = h5group["vortices"]
        vortices = {film: [] for film in film_info}
        for i in sorted(vortex_grp, key=int):
            vortex = Vortex.from_hdf5(vortex_grp[i])
            vortices[vortex.film].append(vortex)
        return FactorizedModel(
            device=Device.from_hdf5(h5group["device"]),
            film_info=film_info,
            film_systems=_load_mapping(
                h5group["film_systems"], LinearSystem.from_hdf5
            ),
            hole_systems={
                film: _load_mapping(grp, LinearSystem.from_hdf5)
                for film, grp in h5group["hole_systems"].items()
            },
            terminal_systems=_load_mapping(
                h5group["terminal_systems"], TerminalSystems.from_hdf5
            ),
            terminal_currents={
                film: dict(grp.attrs)
                for film, grp in h5group["terminal_currents"].items()
            },
            circulating_currents=dict(h5group["circulating_currents"].attrs),
            vortices={film: tuple(vs) for film, vs in vortices.items()},
            current_units=h5group.attrs["current_units"],
        )

    def set_circulating_currents(
        self, circulating_currents: Dict[str, float]
    ) -> None:
        """Sets the circulating currents without re-factorizing.

        Args:
            circulating_currents: ``{hole_name: current}`` in
                ``self.current_units``.
        """
        unknown = set(circulating_currents) - set(self.device.holes)
        if unknown:
            raise KeyError(
                "circulating_currents contains keys not in "
                f"self.device.holes: {list(unknown)!r}"
            )
        self.circulating_currents = dict(circulating_currents)
        holes_by_film = self.device.holes_by_film()
        for film_name, info in self.film_info.items():
            film_holes = {hole.name for hole in holes_by_film[film_name]}
            info.circulating_currents = {
                hole: current
                for hole, current in self.circulating_currents.items()
                if hole in film_holes
            }

    def set_vortices(self, vortices: Sequence[Vortex]) -> None:
        """Sets the vortices without re-factorizing (with the same
        placement validation as :func:`factorize_model`)."""
        from .utils import get_holes_and_vortices_by_film

        # Validates film names, in-film placement, and not-in-hole.
        per_film = get_holes_and_vortices_by_film(self.device, list(vortices))[1]
        for name, info in self.film_info.items():
            info.vortices = tuple(per_film[name])
        self.vortices = {
            name: info.vortices for name, info in self.film_info.items()
        }

    def copy(self) -> "FactorizedModel":
        """A copy sharing the (immutable, expensive) factorizations but
        with independent drive state, so ``set_circulating_currents`` /
        ``set_vortices`` on the copy never mutate the original."""
        new = copy.copy(self)
        new.film_info = {
            name: copy.copy(info) for name, info in self.film_info.items()
        }
        for info in new.film_info.values():
            info.circulating_currents = dict(info.circulating_currents)
        new.circulating_currents = dict(self.circulating_currents)
        new.terminal_currents = {
            k: dict(v) for k, v in self.terminal_currents.items()
        }
        new.vortices = dict(self.vortices)
        return new


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
    # Establish the device->host transfer channel NOW, in a background
    # thread: on tunneled TPU backends the process's first readback pays a
    # large one-time channel-setup cost (see utils/tunnel.py); starting it
    # here overlaps it with film-info construction and system assembly.
    from ..utils.tunnel import warm_transfer_channel

    warm_transfer_channel()
    ureg = device.ureg
    circulating_currents = currents_to_floats(
        circulating_currents or {}, ureg, current_units
    )
    terminal_currents = {
        film_name: currents_to_floats(currents, ureg, current_units)
        for film_name, currents in (terminal_currents or {}).items()
    }
    # Validate names up front: a misspelled hole/film/terminal key would
    # otherwise be silently dropped by the .get(name, 0) lookups downstream
    # and produce wrong physics with no error.
    unknown_holes = set(circulating_currents) - set(device.holes)
    if unknown_holes:
        raise KeyError(
            "circulating_currents contains keys not in device.holes: "
            f"{sorted(unknown_holes)!r}"
        )
    for film_name, currents in terminal_currents.items():
        if film_name not in device.terminals:
            raise KeyError(
                f"terminal_currents film {film_name!r} has no terminals "
                f"(films with terminals: {sorted(device.terminals)!r})."
            )
        terminal_names = {t.name for t in device.terminals[film_name]}
        unknown = set(currents) - terminal_names
        if unknown:
            raise KeyError(
                f"terminal_currents[{film_name!r}] contains unknown "
                f"terminals {sorted(unknown)!r} "
                f"(have: {sorted(terminal_names)!r})."
            )
        # Conservation up to float rounding (an exact truth test rejects
        # validly conserved multi-terminal drives like 0.1 + 0.2 - 0.3).
        total = sum(currents.values())
        scale = max((abs(c) for c in currents.values()), default=0.0)
        if abs(total) > 1e-9 * max(1.0, scale):
            raise ValueError(
                f"Terminal currents in film {film_name!r} are not conserved."
            )
    film_info = make_film_info(
        device=device,
        vortices=list(vortices or []),
        circulating_currents=circulating_currents,
        terminal_currents=terminal_currents,
    )
    film_systems, hole_systems, terminal_systems = factorize_linear_systems(
        device, film_info
    )
    model = FactorizedModel(
        device=device,
        film_info=film_info,
        film_systems=film_systems,
        hole_systems=hole_systems,
        terminal_systems=terminal_systems,
        terminal_currents=terminal_currents,
        circulating_currents=circulating_currents,
        vortices={name: info.vortices for name, info in film_info.items()},
        current_units=current_units,
    )
    _start_sweep_prewarm(model)
    return model


def _start_sweep_prewarm(model: "FactorizedModel") -> None:
    """Best-effort background warm-up of the first solve after a
    factorization.

    The factorization returns with its device work still in flight; a
    user's first ``solve()``/``solve_many`` then pays (measured on the
    v5e transport strip, 10.4k sites, warm compile cache): ~11 s of
    ``FilmSweepData`` construction -- the terminal bootstrap's sequential
    small solves and readbacks ride the tunnel's per-transfer latency --
    plus ~7 s of fused-program trace + executable load.  Both are
    input-independent, so a daemon thread runs them NOW, overlapped with
    the in-flight factorization: it populates the model's sweep-data
    cache and, for devices whose first solve program is predictable
    (single film, or multi-film solves with ``iterations=0`` -- the
    coupled program's shape depends on the user's ``iterations``),
    executes one zero-field B=1 solve to fill the jit dispatch cache.
    XLA compilation and device dispatch release the GIL, so the overlap
    is real.  Disable with ``SUPERSCREEN_TPU_PREWARM_SWEEP=0``.
    """
    import os

    if os.environ.get("SUPERSCREEN_TPU_PREWARM_SWEEP", "1") != "1":
        return
    try:
        import jax

        if jax.default_backend() == "cpu" or jax.device_count() > 1:
            return
    except Exception:  # pragma: no cover - backend probe is best-effort
        return
    import threading
    import weakref

    # Weakref: if the caller drops the model BEFORE this thread gets
    # scheduled, the prewarm aborts instead of resurrecting it.  This is
    # narrow protection only -- once the thread starts it holds a strong
    # reference (via the sweep-data arrays) for its whole run, so
    # factorize-in-a-loop callers that cannot afford two resident models
    # should disable the prewarm outright
    # (SUPERSCREEN_TPU_PREWARM_SWEEP=0, as bench.py does for its
    # headline factorize loop).
    model_ref = weakref.ref(model)

    def _prewarm():
        try:
            import jax
            import jax.numpy as jnp

            from ..sweep import (
                _get_sweep_data,
                _run_sweep_history,
                _strip_metadata,
            )

            model = model_ref()
            if model is None:  # already dropped by the caller
                return
            film_data = _get_sweep_data(model)  # cached on the model
            films = list(model.device.films)
            dtype = model.device.solve_dtype
            Hz = {
                f: jnp.zeros((1, film_data[f].n), dtype=dtype) for f in films
            }
            I_circ = {
                f: jnp.zeros(
                    (1, len(film_data[f].hole_names)), dtype=dtype
                )
                for f in films
            }
            out = _run_sweep_history(
                _strip_metadata(film_data), Hz, I_circ, 1.0, 0, 2, "exact"
            )
            jax.block_until_ready(out)
        except Exception:  # pragma: no cover - prewarm is best-effort
            logger.debug("sweep prewarm failed", exc_info=True)

    threading.Thread(target=_prewarm, daemon=True).start()


class _SolutionSink:
    """Sinks the stream of Solutions a solve produces.

    Owns the two side effects shared by every solve path: incremental HDF5
    saving (group ``str(i)`` per solution, device saved once at
    ``/device``) and accumulation of the returned list.  Use as a context
    manager so the file handle closes even if a solve step raises.
    """

    def __init__(self, device: Device, save_path, keep: bool):
        self._keep = keep
        self._solutions: List[Solution] = []
        self._h5file = None
        self._count = 0
        if save_path is not None:
            self._h5file = h5py.File(save_path, "x")
            device.to_hdf5(self._h5file.create_group("device"))

    def __enter__(self) -> "_SolutionSink":
        return self

    def __exit__(self, *exc) -> None:
        if self._h5file is not None:
            self._h5file.close()

    def append(self, solution: Solution) -> None:
        if self._h5file is not None:
            solution.to_hdf5(
                self._h5file.create_group(str(self._count)),
                device_path="/device",
            )
        self._count += 1
        if self._keep:
            self._solutions.append(solution)

    def result(self) -> Optional[List[Solution]]:
        return self._solutions if self._keep else None


def _sample_applied_fields(
    device: Device,
    film_info: Dict[str, FilmInfo],
    applied_field: Callable,
    field_conversion: float,
    dtype=None,
) -> Dict[str, np.ndarray]:
    """Evaluates the applied field at every film's mesh sites (at the film's
    layer height), scaled into solver units ``current_units/length_units``."""
    dtype = dtype or device.solve_dtype
    out = {}
    for film, mesh in device.meshes.items():
        sites = mesh.sites
        z0 = device.layers[film_info[film].layer].z0
        values = applied_field(sites[:, 0], sites[:, 1], np.full(len(sites), z0))
        Hz = np.atleast_1d(
            np.squeeze(np.asarray(values) * field_conversion).astype(
                dtype, copy=False
            )
        )
        if Hz.shape[0] == 1:
            Hz = np.full(len(sites), Hz.item(), dtype=dtype)
        if Hz.ndim != 1:
            raise ValueError(
                "Expected applied_field to return a 1D vector, "
                f"got a {Hz.ndim}D array."
            )
        out[film] = Hz
    return out


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
    coupling: str = "exact",
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
        _attach_fft_grids,
        _get_sweep_data,
        _run_sweep_history,
        _strip_metadata,
    )

    device = model.device
    films = list(device.films)
    dtype = device.solve_dtype
    film_data = _get_sweep_data(model)
    if coupling == "fft" and iterations > 0 and len(films) > 1:
        film_data = _attach_fft_grids(model, film_data, films)
    else:
        coupling = "exact"
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
        coupling,
    )
    # ONE host transfer for the whole history: pack every per-film
    # quantity into a single flat device buffer (each tunnel round-trip
    # costs ~0.1-1 s).  np.array copies below keep the final arrays
    # writable (downstream matplotlib tri interpolators write in place).
    packed = jnp.concatenate(
        [
            jnp.ravel(arr)
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
    with _SolutionSink(device, save_path, return_solutions) as sink:
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
            sink.append(
                Solution(
                    device=device,
                    film_solutions=film_solutions,
                    **solution_kwargs,
                )
            )
        return sink.result()


def _solve_all_films(
    model: FactorizedModel,
    applied_fields: Dict[str, np.ndarray],
    other_fields: Optional[Dict[str, np.ndarray]],
    field_conversion: float,
    vortex_flux: float,
    check_inversion: bool,
    hp_systems: Optional[Dict] = None,
) -> Dict[str, FilmSolution]:
    """One stage of the legacy path: solves every film independently given
    the applied field plus (optionally) the screening field of the others."""
    film_solutions = {}
    for name in model.device.films:
        film_solutions[name] = solve_film(
            device=model.device,
            applied_field=applied_fields[name],
            field_from_other_films=(
                None if other_fields is None else other_fields[name]
            ),
            film_system=model.film_systems[name],
            hole_systems=model.hole_systems[name],
            film_info=model.film_info[name],
            field_conversion=field_conversion,
            vortex_flux=vortex_flux,
            terminal_systems=model.terminal_systems.get(name, None),
            check_inversion=check_inversion,
            hp_system=None if hp_systems is None else hp_systems[name],
        )
    return film_solutions


def _coupling_fields(
    model: FactorizedModel,
    film_solutions: Dict[str, FilmSolution],
    high_precision: bool = False,
    coupling: str = "exact",
) -> Dict[str, np.ndarray]:
    """Screening field each film feels from every *other* film's current
    density (Biot-Savart, evaluated at the target film's layer height).

    ``coupling="fft"`` applies the analytic Fourier transfer to each
    source film's stream function instead of the O(n_src * n_dst) pairwise
    sum -- the same operator the batched sweep uses (``sweep.
    _coupling_round``), exposed here so the legacy per-stage ``solve``
    path shares the dispatch (reference inter-film hot loop:
    ``solver/solve.py:28-73``)."""
    device = model.device
    dtype = np.float64 if high_precision else device.solve_dtype
    z0_of = {
        name: device.layers[info.layer].z0
        for name, info in model.film_info.items()
    }
    fields = {
        name: np.zeros(len(mesh.sites), dtype=dtype)
        for name, mesh in device.meshes.items()
    }
    if coupling == "fft" and not high_precision:
        import jax.numpy as jnp

        from ..ops.fft_coupling import (
            build_film_grid_data,
            fft_fields_from_spectra,
            fft_source_spectrum,
        )

        grids = getattr(model, "_fft_grid_cache", None)
        if grids is None:
            grids = build_film_grid_data(device)
            try:
                model._fft_grid_cache = grids
            except (AttributeError, TypeError):
                pass
        spectra = {
            name: fft_source_spectrum(
                grids[name],
                np.asarray(
                    film_solutions[name].stream, dtype=device.solve_dtype
                )[None],
            )
            for name in device.films
        }
        for target in device.films:
            sources = [s for s in device.films if s != target]
            if not sources:
                continue
            spec_stack = jnp.stack([spectra[s] for s in sources])
            dzs = jnp.asarray(
                [abs(z0_of[target] - z0_of[s]) for s in sources]
            )
            contrib = fft_fields_from_spectra(
                grids[target], spec_stack, dzs
            )[0]
            fields[target] += np.asarray(contrib, dtype=dtype)
        return fields
    pad_geo = None
    if not high_precision:
        pad_geo = _padded_coupling_geometry(device, model, film_solutions)
    for source in device.films:
        for target in device.films:
            if target == source:
                continue
            if high_precision:
                from .refine import biot_savart_film_to_film64

                contrib = biot_savart_film_to_film64(
                    device.meshes[source].sites,
                    z0_of[source],
                    device.meshes[source].operators.weights,
                    film_solutions[source].current_density,
                    device.meshes[target].sites,
                    z0_of[target],
                )
            elif pad_geo is not None:
                src_sites, src_w, src_J = pad_geo[source]
                contrib = kernels.biot_savart_film_to_film(
                    src_sites,
                    z0_of[source],
                    src_w,
                    src_J,
                    pad_geo[target][0],
                    z0_of[target],
                )[: len(device.meshes[target].sites)]
            else:
                contrib = kernels.biot_savart_film_to_film(
                    device.meshes[source].sites,
                    z0_of[source],
                    model.film_info[source].weights,
                    film_solutions[source].current_density,
                    device.meshes[target].sites,
                    z0_of[target],
                )
            fields[target] += np.asarray(contrib, dtype=dtype)
    return fields


def _padded_coupling_geometry(device, model, film_solutions):
    """Per-film (sites, weights, J) padded to one shared site count.

    Heterogeneous film sizes would compile one pairwise Biot-Savart
    kernel per ORDERED size combination -- up to n*(n-1) XLA/Pallas
    programs per solve (the huber susceptometer pays 12 at four distinct
    film sizes); padding to the common maximum collapses them to one.
    Padded sites carry zero weight and current and sit at distinct
    far-away coordinates per film, so they contribute nothing and never
    coincide with any real or padded point (r > 0, no 0 * inf NaNs even
    at dz = 0).  Engages only where the compile savings are large (>= 3
    films with heterogeneous sizes) -- mirrors
    ``sweep._common_coupling_geometry``.  Returns None when padding is
    not worthwhile.
    """
    films = list(device.films)
    sizes = [len(device.meshes[f].sites) for f in films]
    nmax = max(sizes)
    if len(films) < 3 or all(s == nmax for s in sizes):
        return None
    scale = 1e6 * (
        max(float(np.max(np.abs(device.meshes[f].sites))) for f in films)
        + 1.0
    )
    out = {}
    for i, f in enumerate(films):
        sites = np.asarray(device.meshes[f].sites)
        w = np.asarray(model.film_info[f].weights)
        J = np.asarray(film_solutions[f].current_density)
        npad = nmax - len(sites)
        if npad:
            coords = scale * (1.0 + i * nmax + np.arange(npad))
            sites = np.concatenate(
                [sites, np.stack([coords, coords], axis=1).astype(sites.dtype)]
            )
            w = np.concatenate([w, np.zeros(npad, dtype=w.dtype)])
            J = np.concatenate(
                [J, np.zeros((npad, 2), dtype=J.dtype)], axis=0
            )
        out[f] = (sites, w, J)
    return out


def _resolve_model(
    device: Optional[Device],
    model: Optional[FactorizedModel],
    current_units: str,
    terminal_currents,
    circulating_currents,
    vortices,
) -> FactorizedModel:
    """Returns the model to solve, factorizing the device if needed and
    rejecting ambiguous argument combinations."""
    if model is None:
        if device is None:
            raise ValueError("Either a model or a device must be provided.")
        logger.info("Factorizing model.")
        return factorize_model(
            device=device,
            current_units=current_units,
            terminal_currents=terminal_currents,
            circulating_currents=circulating_currents,
            vortices=vortices,
        )
    if any(
        arg is not None
        for arg in (device, terminal_currents, circulating_currents, vortices)
    ):
        raise ValueError(
            "If model argument is provided, device, terminal_currents, "
            "circulating_currents, and vortices must be None."
        )
    if not isinstance(model, FactorizedModel):
        raise TypeError(
            f"model must be an instance of FactorizedModel (got {type(model)})."
        )
    return model


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
    high_precision: bool = False,
    coupling: str = "auto",
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
        high_precision: Solve to float64 accuracy on float32 hardware via
            host-side f64 iterative refinement around the device
            factorizations (see :mod:`superscreen_tpu.solver.refine`).
            Costs one f64 host copy of each film system plus O(n^2) host
            matvecs per solve.  Forces ``coupling="exact"``.
        coupling: Inter-film coupling operator for the self-consistent
            rounds: "auto" (default -- the same per-round cost model as
            :func:`superscreen_tpu.solve_many`, see
            ``sweep._resolve_auto_coupling`` and docs/COUPLING.md),
            "exact" (O(n_src * n_dst) pairwise Biot-Savart, the reference
            algorithm, ``solver/solve.py:28-73``), or "fft" (analytic
            Fourier transfer; requires films on distinct layer heights;
            accuracy limited by FFT wraparound, ~7e-3 per application at
            the default padding).

    Returns:
        A list of ``iterations + 1`` Solutions (if ``return_solutions``).
    """
    if log_level is not None:
        logging.basicConfig(level=log_level)
    if coupling not in ("auto", "exact", "fft"):
        raise ValueError(
            f"coupling must be 'auto', 'exact', or 'fft' (got {coupling!r})."
        )

    model = _resolve_model(
        device,
        model,
        current_units,
        terminal_currents,
        circulating_currents,
        vortices,
    )
    device = model.device
    current_units = model.current_units
    if not device.meshes:
        raise ValueError(
            "The device does not have a mesh. Call device.make_mesh() to "
            "generate it."
        )

    ureg = device.ureg
    length_units = device.length_units
    field_conversion = field_conversion_factor(
        field_units, current_units, length_units=length_units, ureg=ureg
    )
    logger.debug(
        f"Conversion factor from {field_units} to "
        f"{current_units} / {length_units}: {field_conversion}."
    )
    hp_systems = None
    if high_precision:
        from .refine import get_hp_systems

        hp_systems = get_hp_systems(model)
    # Resolve the coupling dispatch once, sharing solve_many's cost model.
    if high_precision:
        coupling = "exact"
    elif coupling == "auto":
        from ..sweep import _resolve_auto_coupling

        coupling = _resolve_auto_coupling(
            model, list(device.films), iterations
        )

    applied_field = applied_field or ConstantField(0)
    applied_fields = _sample_applied_fields(
        device,
        model.film_info,
        applied_field,
        field_conversion.magnitude,
        dtype=np.float64 if high_precision else None,
    )
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
        for s in model.film_systems.values()
    )
    if (
        not check_inversion
        and not high_precision  # hp refinement is a host/device ping-pong
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
            coupling=coupling,
        )

    # Legacy per-stage path: one solve_film call per film per stage, with
    # explicit Biot-Savart coupling rounds in between.
    try:
        from tqdm import tqdm
    except ImportError:  # pragma: no cover
        def tqdm(x, **kw):
            return x

    coupled = len(device.films) >= 2 and iterations >= 1
    with _SolutionSink(device, save_path, return_solutions) as sink:
        logger.info("Calculating each film's response to the applied field.")
        film_solutions = _solve_all_films(
            model,
            applied_fields,
            None,
            field_conversion.magnitude,
            vortex_flux,
            check_inversion,
            hp_systems=hp_systems,
        )
        sink.append(
            Solution(device=device, film_solutions=film_solutions, **solution_kwargs)
        )
        if coupled:
            for i in tqdm(
                range(iterations),
                desc="Solver iterations",
                disable=(not progress_bar),
            ):
                logger.debug(f"Coupling round {i + 1}/{iterations}.")
                film_solutions = _solve_all_films(
                    model,
                    applied_fields,
                    _coupling_fields(
                        model,
                        film_solutions,
                        high_precision=high_precision,
                        coupling=coupling,
                    ),
                    field_conversion.magnitude,
                    vortex_flux,
                    check_inversion,
                    hp_systems=hp_systems,
                )
                sink.append(
                    Solution(
                        device=device,
                        film_solutions=film_solutions,
                        **solution_kwargs,
                    )
                )
        return sink.result()
