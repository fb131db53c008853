"""Solution containers and post-processing.

API parity with the reference ``superscreen/solution.py``: ``FilmSolution``
holds raw per-film results; ``Solution`` provides interpolation, flux/fluxoid
integrals, and field/vector-potential evaluation anywhere in space (via the
blocked JAX Biot-Savart kernels).
"""

import datetime as dt
import logging
import os
from contextlib import nullcontext
from dataclasses import dataclass
from typing import (
    Any,
    Callable,
    Dict,
    List,
    Literal,
    NamedTuple,
    Optional,
    Sequence,
    Union,
)

import h5py
import numpy as np

from .about import version_dict
from .device import Device, Polygon
from .geometry import path_vectors
from .io import deserialize_obj, serialize_obj
from .ops.fem import in_polygon
from .parameter import Constant
from .sources.current import biot_savart_2d
from .units import Quantity

logger = logging.getLogger("solution")

__all__ = ["Fluxoid", "Vortex", "FilmSolution", "Solution"]

InterpolatorType = Literal["linear", "cubic"]


class Fluxoid(NamedTuple):
    """The fluxoid of a closed region S:

    flux part: ``int_S mu_0 H_z dA``;
    supercurrent part: ``oint_{dS} mu_0 Lambda J . dl``.
    """

    flux_part: Union[float, Quantity]
    supercurrent_part: Union[float, Quantity]


@dataclass
class Vortex:
    """A vortex at ``(x, y)`` in ``film`` carrying ``nPhi0`` flux quanta.

    Args:
        x: Vortex x-position.
        y: Vortex y-position.
        film: Name of the film in which the vortex is pinned.
        nPhi0: Number of flux quanta in the vortex.
    """

    x: float
    y: float
    film: str
    nPhi0: float = 1

    def to_hdf5(self, h5group: h5py.Group) -> None:
        h5group.attrs["x"] = self.x
        h5group.attrs["y"] = self.y
        h5group.attrs["film"] = self.film
        h5group.attrs["nPhi0"] = self.nPhi0

    @staticmethod
    def from_hdf5(h5group: h5py.Group) -> "Vortex":
        return Vortex(
            x=h5group.attrs["x"],
            y=h5group.attrs["y"],
            film=h5group.attrs["film"],
            nPhi0=h5group.attrs["nPhi0"],
        )


class FilmSolution:
    """Raw solution data for a single film (all arrays are in solver units:
    fields in ``current_units / length_units``... converted to
    ``field_units`` by the solver before construction).

    Args:
        stream: The stream function at the mesh sites.
        current_density: The sheet current density at the mesh sites.
        applied_field: The applied field at the mesh sites.
        self_field: The field from screening currents in this film.
        field_from_other_films: The field from screening currents in other
            films, if any.
    """

    def __init__(
        self,
        stream: np.ndarray,
        current_density: np.ndarray,
        applied_field: np.ndarray,
        self_field: np.ndarray,
        field_from_other_films: Optional[np.ndarray] = None,
    ):
        self.stream = np.asarray(stream)
        self.current_density = np.asarray(current_density)
        self.applied_field = np.asarray(applied_field)
        self.self_field = np.asarray(self_field)
        if field_from_other_films is not None:
            field_from_other_films = np.asarray(field_from_other_films)
        self.field_from_other_films = field_from_other_films
        self._total_field: Optional[np.ndarray] = None

    @property
    def total_field(self) -> np.ndarray:
        """The total out-of-plane field in the film."""
        if self._total_field is None:
            self._total_field = self.applied_field + self.self_field
            if self.field_from_other_films is not None:
                self._total_field = self._total_field + self.field_from_other_films
        return self._total_field

    def to_hdf5(self, h5group: h5py.Group) -> None:
        h5group["stream"] = self.stream
        h5group["current_density"] = self.current_density
        h5group["applied_field"] = self.applied_field
        h5group["self_field"] = self.self_field
        if self.field_from_other_films is not None:
            h5group["field_from_other_films"] = self.field_from_other_films

    @staticmethod
    def from_hdf5(h5group: h5py.Group) -> "FilmSolution":
        field_from_other_films = h5group.get("field_from_other_films", None)
        if field_from_other_films is not None:
            field_from_other_films = np.array(field_from_other_films)
        return FilmSolution(
            stream=np.array(h5group["stream"]),
            current_density=np.array(h5group["current_density"]),
            applied_field=np.array(h5group["applied_field"]),
            self_field=np.array(h5group["self_field"]),
            field_from_other_films=field_from_other_films,
        )

    def is_close(
        self, other: "FilmSolution", rtol: float = 1e-4, atol: float = 1e-7
    ) -> bool:
        """Whether two FilmSolutions agree within tolerances."""
        kw = dict(rtol=rtol, atol=atol)
        return (
            np.allclose(self.stream, other.stream, **kw)
            and np.allclose(self.applied_field, other.applied_field, **kw)
            and np.allclose(self.self_field, other.self_field, **kw)
            and np.allclose(self.total_field, other.total_field, **kw)
        )

    def __eq__(self, other) -> bool:
        if other is self:
            return True
        if not isinstance(other, FilmSolution):
            return False
        if (self.field_from_other_films is None) != (
            other.field_from_other_films is None
        ):
            return False
        return self.is_close(other)


class Solution:
    """Stream functions and fields for a solved :class:`Device`, plus
    post-processing.

    Args:
        device: The solved device.
        film_solutions: ``{film_name: FilmSolution}`` raw results in
            ``field_units``, ``current_units``, and ``device.length_units``.
        applied_field_func: The applied-field callable.
        field_units: Units of the applied/computed fields.
        current_units: Units of currents.
        circulating_currents: ``{hole_name: circulating_current}``.
        terminal_currents: ``{film_name: {terminal_name: current}}``.
        vortices: Vortices in the device.
        solver: The solver name that generated this solution.
    """

    def __init__(
        self,
        *,
        device: Device,
        film_solutions: Dict[str, FilmSolution],
        applied_field_func: Callable,
        field_units: str,
        current_units: str,
        circulating_currents: Optional[Dict[str, float]] = None,
        terminal_currents: Optional[Dict[str, Dict[str, float]]] = None,
        vortices: Optional[List[Vortex]] = None,
        solver: str = "superscreen_tpu.solve",
    ):
        self.device = device.copy(with_mesh=True, copy_mesh=False)
        self.film_solutions = film_solutions
        self.applied_field_func = applied_field_func
        self.circulating_currents = circulating_currents or {}
        self.terminal_currents = terminal_currents or {}
        self.vortices = vortices or []
        self._field_units = field_units
        self._current_units = current_units
        self._solver = solver
        self._time_created = dt.datetime.now()
        self._version_info = version_dict()

    @property
    def field_units(self) -> str:
        """Units of magnetic fields."""
        return self._field_units

    @property
    def current_units(self) -> str:
        """Units of currents."""
        return self._current_units

    @property
    def solver(self) -> str:
        """The solver that generated this solution."""
        return self._solver

    @property
    def time_created(self) -> dt.datetime:
        """Creation timestamp."""
        return self._time_created

    @property
    def version_info(self) -> Dict[str, str]:
        """Dependency versions at creation time."""
        return self._version_info

    @staticmethod
    def _select_interpolator(method: InterpolatorType):
        import matplotlib.tri as mtri

        return {
            "linear": mtri.LinearTriInterpolator,
            "cubic": mtri.CubicTriInterpolator,
        }[method]

    def interp_current_density(
        self,
        positions: np.ndarray,
        *,
        film: str,
        method: InterpolatorType = "linear",
        units: Optional[str] = None,
        with_units: bool = False,
    ) -> np.ndarray:
        """Interpolates the sheet current density within a film.

        Args:
            positions: ``(m, 2)`` coordinates at which to evaluate ``J``.
            film: The film in which to interpolate.
            method: "linear" or "cubic".
            units: Desired units (default
                ``current_units / length_units``).
            with_units: Return a Quantity array.
        """
        device = self.device
        default_units = f"{self.current_units} / {device.length_units}"
        if units is None:
            units = default_units
        positions = np.atleast_2d(positions)
        xv, yv = positions.T
        interp_type = self._select_interpolator(method)
        mesh = device.meshes[film]
        J = self.film_solutions[film].current_density
        Jx_interp = interp_type(mesh.triangulation, J[:, 0])
        Jy_interp = interp_type(mesh.triangulation, J[:, 1])
        J = np.array([Jx_interp(xv, yv).data, Jy_interp(xv, yv).data]).T
        in_film = device.films[film].contains_points(positions)
        J[~in_film] = 0
        J[~np.isfinite(J).all(axis=1)] = 0
        J = Quantity(J, default_units).to(units)
        if with_units:
            return J
        return J.magnitude

    def current_through_path(
        self,
        path_coords: np.ndarray,
        *,
        film: str,
        interp_method: str = "linear",
        units: Union[str, None] = None,
        with_units: bool = True,
    ) -> Union[float, Quantity]:
        """Total current crossing a path (line integral of ``J . n``).

        Args:
            path_coords: ``(n, 2)`` path coordinates.
            film: The film in which to evaluate ``J``.
            interp_method: "linear" or "cubic".
            units: Desired current units.
            with_units: Return a Quantity.
        """
        device = self.device
        if units is None:
            units = self.current_units
        path_coords = np.asarray(path_coords, dtype=float)
        edge_positions = (path_coords[:-1] + path_coords[1:]) / 2
        J_edge = self.interp_current_density(
            edge_positions, film=film, method=interp_method, with_units=False
        )
        edge_lengths, unit_normals = path_vectors(path_coords)
        J_dot_n = np.sum(J_edge * unit_normals, axis=1)
        # Midpoint rule: J.n is sampled at edge centers, so the line
        # integral is the plain sum of J.n * dl.  (The reference applies
        # np.trapezoid to these per-edge products, solution.py:359, which
        # half-weights the two end edges -- a first-order error at the path
        # ends and exactly zero for a two-point path.)
        integral = np.sum(J_dot_n * edge_lengths)
        total_current = Quantity(
            integral, f"{self.current_units} / {device.length_units}"
        ) * Quantity(1.0, device.length_units)
        total_current = total_current.to(units)
        if not with_units:
            total_current = total_current.magnitude
        return total_current

    def interp_field(
        self,
        positions: np.ndarray,
        *,
        film: str,
        dataset: Literal[
            "field", "self_field", "applied_field", "field_from_other_films"
        ] = "field",
        method: InterpolatorType = "linear",
        units: Optional[str] = None,
        with_units: bool = False,
    ):
        """Interpolates the z-component of a field dataset within a film.

        Args:
            positions: ``(m, 2)`` coordinates.
            film: The film in which to interpolate.
            dataset: One of "field", "self_field", "applied_field",
                "field_from_other_films".
            method: "linear" or "cubic".
            units: Desired units (default ``field_units``).
            with_units: Return a Quantity array.
        """
        from .solver.utils import convert_field

        interp_type = self._select_interpolator(method)
        device = self.device
        if units is None:
            units = self.field_units
        valid_datasets = (
            "field",
            "self_field",
            "applied_field",
            "field_from_other_films",
        )
        if dataset not in valid_datasets:
            raise ValueError(
                f"Invalid dataset: {dataset!r}. Expected one of {valid_datasets!r}"
            )
        mesh = device.meshes[film]
        if dataset == "field":
            field = self.film_solutions[film].total_field
        elif dataset == "self_field":
            field = self.film_solutions[film].self_field
        elif dataset == "applied_field":
            field = self.film_solutions[film].applied_field
        else:
            field = self.film_solutions[film].field_from_other_films
            if field is None:
                field = np.zeros(len(mesh.sites))
        positions = np.atleast_2d(positions)
        Hz_interp = interp_type(mesh.triangulation, field)
        return convert_field(
            Hz_interp(positions[:, 0], positions[:, 1]).data,
            units,
            old_units=self.field_units,
            ureg=device.ureg,
            with_units=with_units,
        )

    def polygon_flux(
        self,
        name: str,
        units: Optional[str] = None,
        with_units: bool = True,
    ) -> Union[float, Quantity]:
        """Flux of the total field through a named polygon.

        Args:
            name: The polygon name.
            units: Flux units (default ``field_units * length_units**2``).
            with_units: Return a Quantity.
        """
        from .solver.utils import convert_field

        device = self.device
        ureg = device.ureg
        polygons = {p.name: p for p in device.get_polygons(include_terminals=False)}
        if name not in polygons:
            raise ValueError(f"Unknown polygon: {name!r}.")
        new_units = units or f"{self.field_units} * {device.length_units}**2"
        polygon = polygons[name]
        if name in device.films:
            mesh = device.meshes[name]
            film_name = name
        else:
            for film in device.films.values():
                if (
                    film.layer == polygon.layer
                    and film.contains_points(polygon.points).all()
                ):
                    break
            mesh = device.meshes[film.name]
            film_name = film.name
        points = mesh.sites
        total_field = self.film_solutions[film_name].total_field
        ix = polygon.contains_points(points, index=True)
        # Convert field to B = mu0 * H before integrating (flux units).
        field_mT = convert_field(
            total_field[ix],
            "mT",
            old_units=self.field_units,
            ureg=ureg,
            with_units=False,
        )
        flux_val = np.sum(field_mT * mesh.vertex_areas[ix])
        flux = Quantity(flux_val, f"mT * {device.length_units}**2").to(new_units)
        if with_units:
            return flux
        return flux.magnitude

    def polygon_fluxoid(
        self,
        polygon_coords: Union[np.ndarray, Polygon],
        *,
        film: str,
        interp_method: InterpolatorType = "linear",
        units: Optional[str] = "Phi_0",
        with_units: bool = True,
    ) -> Fluxoid:
        """The :class:`Fluxoid` (flux + supercurrent parts) for a polygonal
        region inside a film.

        Args:
            polygon_coords: ``(n, 2)`` polygon vertices (or a Polygon).
            film: The film in which to evaluate fields/currents.
            interp_method: "linear" or "cubic".
            units: Desired flux units (default ``Phi_0``).
            with_units: Return Quantities.
        """
        from .solver.utils import convert_field

        device = self.device
        ureg = device.ureg
        if units is None:
            units = f"{self.field_units} * {device.length_units} ** 2"
        if isinstance(polygon_coords, Polygon):
            polygon = polygon_coords
        else:
            polygon = Polygon(points=polygon_coords)
        points = polygon.points
        if not device.films[film].contains_points(points).all():
            raise ValueError(
                f"The polygon is not contained within the film ({film!r})."
            )
        mesh = device.meshes[film]
        ix = polygon.contains_points(mesh.sites)
        # Flux part: convert to B and integrate.
        field_T = convert_field(
            self.film_solutions[film].total_field[ix],
            "mT",
            old_units=self.field_units,
            ureg=ureg,
            with_units=False,
        )
        flux_val = np.sum(field_T * mesh.vertex_areas[ix])
        flux_part = Quantity(flux_val, f"mT * {device.length_units}**2").to(units)
        # Supercurrent part.
        J_units = f"{self.current_units} / {device.length_units}"
        J_poly = self.interp_current_density(
            points, film=film, method=interp_method, units=J_units, with_units=False
        )
        Lambda = device.layers[device.films[film].layer].Lambda
        if not callable(Lambda):
            Lambda = Constant(Lambda)
        Lambda_poly = np.atleast_1d(Lambda(points[:, 0], points[:, 1]))
        if Lambda_poly.shape[0] != len(points):
            Lambda_poly = np.full(len(points), Lambda_poly.item())
        dl = np.diff(points, axis=0)
        int_J = np.trapezoid(Lambda_poly[:-1] * np.sum(J_poly[:-1] * dl, axis=1))
        int_J = Quantity(int_J, J_units) * Quantity(1.0, device.length_units) ** 2
        supercurrent_part = (ureg("mu_0") * int_J).to(units)
        if not with_units:
            flux_part = flux_part.magnitude
            supercurrent_part = supercurrent_part.magnitude
        return Fluxoid(flux_part, supercurrent_part)

    def hole_fluxoid(
        self,
        hole_name: str,
        points: Optional[np.ndarray] = None,
        interp_method: InterpolatorType = "linear",
        units: Optional[str] = "Phi_0",
        with_units: bool = True,
    ) -> Fluxoid:
        """The fluxoid of a polygon enclosing the given hole.

        Args:
            hole_name: The hole name.
            points: Polygon vertices enclosing the hole (auto-generated if
                omitted).
            interp_method: "linear" or "cubic".
            units: Desired flux units.
            with_units: Return Quantities.
        """
        if points is None:
            from .fluxoid import make_fluxoid_polygons

            points = make_fluxoid_polygons(self.device, holes=hole_name)[hole_name]
        device = self.device
        hole = device.holes[hole_name]
        if not in_polygon(points, hole.points).all():
            raise ValueError(
                f"Hole {hole.name} is not completely enclosed by the given polygon."
            )
        for film_name, holes in device.holes_by_film().items():
            if hole.name in [h.name for h in holes]:
                break
        return self.polygon_fluxoid(
            points,
            film=film_name,
            interp_method=interp_method,
            units=units,
            with_units=with_units,
        )

    def screening_field_at_position(
        self,
        positions: np.ndarray,
        *,
        zs: Union[float, np.ndarray, None] = None,
        vector: bool = False,
        interp_method: InterpolatorType = "linear",
        units: Optional[str] = None,
        with_units: bool = True,
        return_sum: bool = True,
    ):
        """Field from device screening currents at any point(s) in space
        (excluding the applied field).

        Args:
            positions: ``(m, 2)`` or ``(m, 3)`` coordinates.
            zs: z-coordinates (scalar or ``(m,)``) if positions is (m, 2).
            vector: Return the full vector field.
            interp_method: "linear" or "cubic".
            units: Desired units (default ``field_units``).
            with_units: Return Quantities.
            return_sum: Sum over films instead of returning a dict.
        """
        from .solver.utils import convert_field

        device = self.device
        dtype = device.solve_dtype
        ureg = device.ureg
        layers = device.layers
        meshes = device.meshes
        units = units or self.field_units
        positions, zs = _split_positions_zs(positions, zs, dtype)
        fields = {}
        for name, film in device.films.items():
            layer = layers[film.layer]
            if vector:
                field_from_film = np.zeros((len(positions), 3), dtype=dtype)
            else:
                field_from_film = np.zeros(len(positions), dtype=dtype)
            in_film = np.zeros(len(positions), dtype=bool)
            if np.all(zs == layer.z0):
                in_film[film.contains_points(positions)] = True
                field_in_film = self.interp_field(
                    positions[in_film],
                    film=film.name,
                    dataset="self_field",
                    method=interp_method,
                    units="tesla",
                    with_units=False,
                )
                if vector:
                    zeros = np.zeros_like(field_in_film)
                    field_in_film = np.array([zeros, zeros, field_in_film]).T
                field_from_film[in_film] = field_in_film
            not_in_film = ~in_film
            if not_in_film.any():
                field_from_film[not_in_film] = biot_savart_2d(
                    positions[not_in_film, 0],
                    positions[not_in_film, 1],
                    zs[not_in_film],
                    positions=meshes[name].sites,
                    areas=meshes[name].vertex_areas,
                    current_densities=self.film_solutions[name].current_density,
                    z0=layer.z0,
                    length_units=device.length_units,
                    current_units=self.current_units,
                    vector=vector,
                )
            fields[name] = convert_field(
                field_from_film,
                units,
                old_units="tesla",
                ureg=ureg,
                with_units=with_units,
            )
        if return_sum:
            return sum(fields.values())
        return fields

    def field_at_position(
        self,
        positions: np.ndarray,
        *,
        zs: Union[float, np.ndarray, None] = None,
        interp_method: InterpolatorType = "linear",
        units: Optional[str] = None,
        with_units: bool = True,
        return_sum: bool = True,
    ):
        """Total z-field (screening + applied) at any point(s) in space.

        Args:
            positions: ``(m, 2)`` or ``(m, 3)`` coordinates.
            zs: z-coordinates if positions is ``(m, 2)``.
            interp_method: "linear" or "cubic".
            units: Desired units (default ``field_units``).
            with_units: Return Quantities.
            return_sum: Sum over sources instead of returning a dict.
        """
        from .solver.utils import convert_field

        device = self.device
        dtype = device.solve_dtype
        units = units or self.field_units
        positions, zs = _split_positions_zs(positions, zs, dtype)
        fields = self.screening_field_at_position(
            positions,
            zs=zs,
            vector=False,
            interp_method=interp_method,
            units=self.field_units,
            with_units=False,
            return_sum=False,
        )
        films_by_layer = device.polygons_by_layer("film")
        Hz_applied = np.zeros(len(positions), dtype=dtype)
        in_film = np.zeros(len(positions), dtype=bool)
        for name, layer in device.layers.items():
            if np.all(zs == layer.z0):
                for film in films_by_layer[name]:
                    ix = film.contains_points(positions)
                    in_film[ix] = True
                    Hz_applied[ix] = self.interp_field(
                        positions[ix],
                        film=film.name,
                        dataset="applied_field",
                        method=interp_method,
                        units=self.field_units,
                        with_units=False,
                    )
                    Hz_applied[ix] += self.interp_field(
                        positions[ix],
                        film=film.name,
                        dataset="field_from_other_films",
                        method=interp_method,
                        units=self.field_units,
                        with_units=False,
                    )
                break
        mask = ~in_film
        if mask.any():
            Hz_applied[mask] = np.atleast_1d(
                np.squeeze(
                    self.applied_field_func(
                        positions[mask, 0], positions[mask, 1], zs[mask]
                    )
                )
            )
        fields["applied_field"] = np.atleast_1d(Hz_applied).squeeze()
        for key, field in fields.items():
            fields[key] = convert_field(
                field,
                units,
                old_units=self.field_units,
                ureg=device.ureg,
                with_units=with_units,
            )
        if return_sum:
            return sum(fields.values())
        return fields

    def vector_potential_at_position(
        self,
        positions: np.ndarray,
        *,
        zs: Union[float, np.ndarray, None] = None,
        units: Optional[str] = None,
        with_units: bool = True,
        return_sum: bool = True,
    ):
        """Vector potential from device currents at any point(s) in space:
        ``A(r) = mu_0/(4 pi) int J(r') / |r - r'| d^2r'``.

        Args:
            positions: ``(m, 2)`` or ``(m, 3)`` coordinates.
            zs: z-coordinates if positions is ``(m, 2)``.
            units: Desired units (default ``field_units * length_units``).
            with_units: Return Quantities.
            return_sum: Sum over films instead of returning a dict.
        """
        device = self.device
        layers = device.layers
        meshes = device.meshes
        dtype = device.solve_dtype
        ureg = device.ureg
        units = units or f"{self.field_units} * {device.length_units}"
        positions, zs = _split_positions_zs(positions, zs, dtype)
        zs2d = zs[:, np.newaxis] if zs.ndim == 1 else zs
        from .ops.kernels import vector_potential_2d

        vector_potentials = {}
        for name, film in device.films.items():
            dz = zs2d - layers[film.layer].z0
            if np.all(dz == 0) and film.contains_points(positions).all():
                raise ValueError(
                    f"Cannot evaluate vector potential inside the film ({name!r})."
                )
            mesh = meshes[name]
            areas = mesh.vertex_areas
            J = self.film_solutions[name].current_density
            # Blocked device kernel (the reference materializes the dense
            # (m, n) distance matrix on the host).
            Axy = 4 * np.pi * np.asarray(
                vector_potential_2d(
                    positions,
                    zs2d[:, 0] if zs2d.ndim == 2 else zs2d,
                    mesh.sites,
                    layers[film.layer].z0,
                    areas,
                    J,
                )
            )
            A = np.concatenate([Axy, np.zeros_like(Axy[:, :1])], axis=1)
            A = Quantity(A, self.current_units)
            A = (ureg("mu_0") / (4 * np.pi) * A).to(units)
            if not with_units:
                A = A.magnitude
            vector_potentials[name] = A
        if return_sum:
            return sum(vector_potentials.values())
        return vector_potentials

    # -- serialization -------------------------------------------------------

    def to_hdf5(
        self,
        path_or_group: Union[os.PathLike, h5py.Group],
        device_path: Optional[str] = None,
        compress: bool = True,
    ) -> None:
        """Saves the Solution to an HDF5 file or group.

        Args:
            path_or_group: HDF5 path or open group.
            device_path: In-file path to an already-saved Device (soft-linked
                instead of re-saving).
            compress: Save the mesh compressed.
        """
        if isinstance(path_or_group, h5py.Group):
            save_context = nullcontext(path_or_group)
        else:
            save_context = h5py.File(path_or_group, "x")
        with save_context as h5group:
            h5group.attrs["time_created"] = self.time_created.isoformat()
            h5group.attrs["field_units"] = self.field_units
            h5group.attrs["current_units"] = self.current_units
            h5group.attrs["solver"] = self.solver
            version_grp = h5group.create_group("version_info")
            version_grp.attrs.update(self.version_info)
            if device_path is None:
                self.device.to_hdf5(
                    h5group.create_group("device"), save_mesh=True, compress=compress
                )
            else:
                h5group["device"] = h5py.SoftLink(device_path)
            grp = h5group.create_group("film_solutions")
            for name, film_solution in self.film_solutions.items():
                film_solution.to_hdf5(grp.create_group(name))
            vortices_grp = h5group.create_group("vortices")
            for i, vortex in enumerate(self.vortices):
                vortex.to_hdf5(vortices_grp.create_group(str(i)))
            serialize_obj(h5group, self.applied_field_func, "applied_field_func")
            circ_grp = h5group.create_group("circulating_currents")
            circ_grp.attrs.update(self.circulating_currents)
            term_grp = h5group.create_group("terminal_currents")
            for film_name, current_dict in self.terminal_currents.items():
                grp = term_grp.create_group(film_name)
                grp.attrs.update(current_dict)

    @staticmethod
    def from_hdf5(path_or_group: Union[os.PathLike, h5py.Group]) -> "Solution":
        """Loads a Solution from an HDF5 file or group."""
        if isinstance(path_or_group, h5py.Group):
            read_context = nullcontext(path_or_group)
        else:
            read_context = h5py.File(path_or_group, "r")
        with read_context as h5group:
            device = Device.from_hdf5(h5group["device"])
            film_solutions = {}
            for name, grp in h5group["film_solutions"].items():
                film_solutions[name] = FilmSolution.from_hdf5(grp)
            applied_field_func = deserialize_obj(h5group, "applied_field_func")
            vortices = []
            for i in sorted(h5group["vortices"], key=int):
                vortices.append(Vortex.from_hdf5(h5group[f"vortices/{i}"]))
            time_created = dt.datetime.fromisoformat(h5group.attrs["time_created"])
            version_info = dict(h5group["version_info"].attrs)
            terminal_currents = {}
            for film_name, grp in h5group["terminal_currents"].items():
                terminal_currents[film_name] = dict(grp.attrs)
            solution = Solution(
                device=device,
                film_solutions=film_solutions,
                applied_field_func=applied_field_func,
                vortices=vortices,
                circulating_currents=dict(h5group["circulating_currents"].attrs),
                terminal_currents=terminal_currents,
                current_units=h5group.attrs["current_units"],
                field_units=h5group.attrs["field_units"],
                solver=h5group.attrs["solver"],
            )
            solution._time_created = time_created
            solution._version_info = version_info
        return solution

    @staticmethod
    def save_solutions(
        solutions: Sequence["Solution"],
        path_or_group: Union[os.PathLike, h5py.Group],
        compress: bool = True,
    ) -> None:
        """Saves a series of Solutions (sharing one Device) to HDF5."""
        if not solutions:
            return
        device = solutions[0].device
        if isinstance(path_or_group, h5py.Group):
            save_context = nullcontext(path_or_group)
        else:
            save_context = h5py.File(path_or_group, "x")
        with save_context as h5group:
            device_grp = h5group.create_group("device")
            device.to_hdf5(device_grp)
            for i, solution in enumerate(solutions):
                device_path = None
                if solution.device == device:
                    device_path = device_grp.name
                solution.to_hdf5(
                    h5group.create_group(str(i)),
                    device_path=device_path,
                    compress=compress,
                )

    @staticmethod
    def load_solutions(
        path_or_group: Union[os.PathLike, h5py.Group],
    ) -> List["Solution"]:
        """Loads a series of Solutions from HDF5."""
        if isinstance(path_or_group, h5py.Group):
            read_context = nullcontext(path_or_group)
        else:
            read_context = h5py.File(path_or_group, "r")
        solutions = []
        with read_context as h5group:
            groups = sorted((key for key in h5group if key.isdigit()), key=int)
            for group in groups:
                solutions.append(Solution.from_hdf5(h5group[group]))
        return solutions

    def equals(self, other: Any, require_same_timestamp: bool = False) -> bool:
        """Whether two solutions are equal (optionally including the
        creation timestamp)."""
        if other is self:
            return True
        if not isinstance(other, Solution):
            return False
        if not (
            (self.device == other.device)
            and (self.field_units == other.field_units)
            and (self.current_units == other.current_units)
            and (self.circulating_currents == other.circulating_currents)
            and (
                getattr(self, "terminal_currents", None)
                == getattr(other, "terminal_currents", None)
            )
            and (self.applied_field_func == other.applied_field_func)
            and (self.vortices == other.vortices)
        ):
            return False
        if require_same_timestamp and (self.time_created != other.time_created):
            return False
        return self.film_solutions == other.film_solutions

    def __eq__(self, other) -> bool:
        return self.equals(other, require_same_timestamp=True)

    # -- plot aliases ----------------------------------------------------------

    def plot_streams(self, **kwargs):
        """Alias for :func:`superscreen_tpu.visualization.plot_streams`."""
        from .visualization import plot_streams

        return plot_streams(self, **kwargs)

    def plot_currents(self, **kwargs):
        """Alias for :func:`superscreen_tpu.visualization.plot_currents`."""
        from .visualization import plot_currents

        return plot_currents(self, **kwargs)

    def plot_fields(self, **kwargs):
        """Alias for :func:`superscreen_tpu.visualization.plot_fields`."""
        from .visualization import plot_fields

        return plot_fields(self, **kwargs)

    def plot_field_at_positions(self, points: np.ndarray, **kwargs):
        """Alias for
        :func:`superscreen_tpu.visualization.plot_field_at_positions`."""
        from .visualization import plot_field_at_positions

        return plot_field_at_positions(self, points, **kwargs)


def _split_positions_zs(positions, zs, dtype):
    """Normalizes positions/zs into ``(m, 2)`` coordinates and ``(m,)`` z."""
    positions = np.atleast_2d(positions)
    if positions.shape[1] == 3:
        if zs is not None:
            raise ValueError(
                "If positions has shape (m, 3) then zs cannot be specified."
            )
        zs = positions[:, 2]
        positions = positions[:, :2]
    else:
        zs = np.squeeze(np.asarray(zs))
        if zs.ndim == 0:
            zs = zs.item() * np.ones(positions.shape[0], dtype=dtype)
    if not isinstance(zs, np.ndarray):
        raise ValueError(f"Expected zs to be an ndarray, but got {type(zs)}.")
    return positions, zs
