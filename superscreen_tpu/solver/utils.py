"""Solver support: film metadata, unit conversion, terminal streams.

API parity with the reference ``superscreen/solver/utils.py``.  FilmInfo
gathers everything the (jitted) per-film solve needs: dense operator casts in
the solve dtype, index sets for holes/boundary/interior, and the evaluated
penetration depth.
"""

import logging
import numbers
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import h5py
import numpy as np

#: Films with more mesh sites than this use the low-memory (matrix-free
#: kernel) factorization: the dense Brandt kernel Q and dense Laplacian are
#: never materialized at full size; the film system's q-block is assembled
#: from the gathered interior sites and self-field matvecs compute q tiles
#: on the fly.  Override with SUPERSCREEN_TPU_MAX_DENSE_N.
MAX_DENSE_KERNEL_SIZE = int(os.environ.get("SUPERSCREEN_TPU_MAX_DENSE_N", "25000"))

from ..device import Device, Polygon
from ..geometry import path_vectors
from ..parameter import Constant
from ..solution import Vortex
from ..units import DimensionalityError, Quantity, ureg as default_ureg

logger = logging.getLogger("solve")

__all__ = [
    "LambdaInfo",
    "FilmInfo",
    "make_film_info",
    "get_holes_and_vortices_by_film",
    "current_to_float",
    "currents_to_floats",
    "convert_field",
    "field_conversion_factor",
    "stream_from_current_density",
    "stream_from_terminal_current",
]


def _coo_to_group(h5group: h5py.Group, op) -> None:
    """Stores a :class:`superscreen_tpu.ops.fem.COO` operator as three
    triplet datasets plus a shape attribute."""
    for part in ("rows", "cols", "vals"):
        h5group[part] = getattr(op, part)
    h5group.attrs["shape"] = op.shape


def _coo_from_group(h5group: h5py.Group):
    from ..ops.fem import COO

    rows, cols, vals = (np.array(h5group[p]) for p in ("rows", "cols", "vals"))
    return COO(rows=rows, cols=cols, vals=vals, shape=tuple(h5group.attrs["shape"]))


@dataclass(kw_only=True, eq=False)
class LambdaInfo:
    """The effective penetration depth for a film, evaluated at mesh sites.

    Args:
        film: The film name.
        Lambda: Effective penetration depth at each mesh site, shape (n, 1).
        london_lambda: London penetration depth at each site (optional).
        thickness: The film thickness (optional).
    """

    film: str
    Lambda: np.ndarray
    london_lambda: Optional[np.ndarray] = None
    thickness: Optional[float] = None
    inhomogeneous: bool = field(init=False)

    lambda_str = "λ"
    Lambda_str = "Λ"

    def __post_init__(self):
        lam = np.asarray(self.Lambda)
        if (lam < 0).any():
            raise ValueError(f"Negative Lambda in film {self.film!r}.")
        floor = max(float(np.min(np.abs(lam))), float(np.finfo(float).eps))
        self.inhomogeneous = bool(float(np.ptp(lam)) > 1e-6 * floor)
        if self.inhomogeneous:
            logger.info(
                f"Inhomogeneous {LambdaInfo.Lambda_str} in film {self.film!r}, "
                f"which violates the assumptions of the London model. "
                f"Results may not be reliable."
            )
        if self.london_lambda is not None:
            assert self.thickness is not None
            assert np.allclose(lam, self.london_lambda**2 / self.thickness)

    def to_hdf5(self, h5group: h5py.Group) -> None:
        h5group.attrs["film"] = self.film
        h5group["Lambda"] = self.Lambda
        if self.thickness is not None:
            h5group.attrs["thickness"] = self.thickness
        if self.london_lambda is not None:
            h5group["london_lambda"] = self.london_lambda

    @staticmethod
    def from_hdf5(h5group: h5py.Group) -> "LambdaInfo":
        return LambdaInfo(
            film=h5group.attrs["film"],
            Lambda=np.array(h5group["Lambda"]),
            london_lambda=(
                np.array(h5group["london_lambda"])
                if "london_lambda" in h5group
                else None
            ),
            thickness=h5group.attrs.get("thickness", None),
        )


#: FilmInfo arrays always written as plain datasets.
_INFO_REQUIRED_ARRAYS = ("interior_indices", "boundary_indices", "in_hole", "weights")
#: FilmInfo arrays written only when present (dense-mode operator blocks and
#: the site coordinates used by the matrix-free kernel).
_INFO_OPTIONAL_ARRAYS = ("kernel", "gradient", "sites")


@dataclass
class FilmInfo:
    """Everything the solver needs to know about one film.

    Args:
        name: Film name.
        layer: Name of the layer containing the film.
        lambda_info: The :class:`LambdaInfo` for the film.
        vortices: Vortices pinned in the film.
        interior_indices: Mesh indices inside the film (excluding holes and,
            for terminal films, the boundary).
        boundary_indices: Boundary vertex indices (CCW-ordered for terminal
            films).
        hole_indices: ``{hole_name: indices}`` mesh indices in each hole.
        in_hole: Boolean mask of sites inside any hole.
        circulating_currents: ``{hole_name: current}``.
        weights: Mesh vertex areas in the solve dtype.
        kernel: Dense Brandt kernel ``Q`` in the solve dtype, or None in
            low-memory mode (films larger than ``MAX_DENSE_KERNEL_SIZE``).
        laplacian: Dense Laplace-Beltrami operator in the solve dtype, or
            the sparse COO operator in low-memory mode.
        gradient: Dense stacked (gx, gy) operators (only for inhomogeneous
            Lambda).
        terminal_currents: ``{terminal_name: current}`` for terminal films.
        sites: Mesh site coordinates in the solve dtype (used by the
            low-memory matrix-free kernel applications).
    """

    name: str
    layer: str
    lambda_info: LambdaInfo
    vortices: Tuple[Vortex, ...]
    interior_indices: np.ndarray
    boundary_indices: np.ndarray
    hole_indices: Dict[str, np.ndarray]
    in_hole: np.ndarray
    circulating_currents: Dict[str, float]
    weights: np.ndarray
    kernel: Optional[np.ndarray]
    laplacian: "np.ndarray | object"
    gradient: Optional[np.ndarray] = None
    gradient_coo: Optional[Tuple] = None  # (gx, gy) COO pair in low-memory mode
    terminal_currents: Optional[Dict[str, float]] = None
    sites: Optional[np.ndarray] = None

    @property
    def dense_kernel(self) -> bool:
        return self.kernel is not None

    def to_hdf5(self, h5group: h5py.Group) -> None:
        from ..ops.fem import COO

        h5group.attrs.update(name=self.name, layer=self.layer)
        self.lambda_info.to_hdf5(h5group.create_group("lambda_info"))
        vortex_grp = h5group.create_group("vortices")
        for i, vortex in enumerate(self.vortices):
            vortex.to_hdf5(vortex_grp.create_group(str(i)))
        for key in _INFO_REQUIRED_ARRAYS:
            h5group[key] = np.asarray(getattr(self, key))
        for key in _INFO_OPTIONAL_ARRAYS:
            value = getattr(self, key)
            if value is not None:
                h5group[key] = np.asarray(value)
        holes = h5group.create_group("hole_indices")
        for hole, indices in self.hole_indices.items():
            holes[hole] = indices
        circ = h5group.create_group("circulating_currents")
        circ.attrs.update(self.circulating_currents)
        if self.terminal_currents is not None:
            term = h5group.create_group("terminal_currents")
            term.attrs.update(self.terminal_currents)
        if isinstance(self.laplacian, COO):
            _coo_to_group(h5group.create_group("laplacian_coo"), self.laplacian)
        else:
            h5group["laplacian"] = np.asarray(self.laplacian)
        if self.gradient_coo is not None:
            for axis, op in zip("xy", self.gradient_coo):
                _coo_to_group(h5group.create_group(f"gradient_coo_{axis}"), op)

    @staticmethod
    def from_hdf5(h5group: h5py.Group) -> "FilmInfo":
        fields = {key: np.array(h5group[key]) for key in _INFO_REQUIRED_ARRAYS}
        for key in _INFO_OPTIONAL_ARRAYS:
            fields[key] = np.array(h5group[key]) if key in h5group else None
        if "laplacian_coo" in h5group:
            fields["laplacian"] = _coo_from_group(h5group["laplacian_coo"])
        else:
            fields["laplacian"] = np.array(h5group["laplacian"])
        if "gradient_coo_x" in h5group:
            fields["gradient_coo"] = tuple(
                _coo_from_group(h5group[f"gradient_coo_{axis}"]) for axis in "xy"
            )
        if "terminal_currents" in h5group:
            fields["terminal_currents"] = dict(h5group["terminal_currents"].attrs)
        vortex_grp = h5group["vortices"]
        return FilmInfo(
            name=h5group.attrs["name"],
            layer=h5group.attrs["layer"],
            lambda_info=LambdaInfo.from_hdf5(h5group["lambda_info"]),
            vortices=tuple(
                Vortex.from_hdf5(vortex_grp[i]) for i in sorted(vortex_grp, key=int)
            ),
            hole_indices={
                hole: np.array(ix) for hole, ix in h5group["hole_indices"].items()
            },
            circulating_currents=dict(h5group["circulating_currents"].attrs),
            **fields,
        )


def get_holes_and_vortices_by_film(
    device: Device, vortices: List[Vortex]
) -> Tuple[Dict[str, List[Polygon]], Dict[str, List[Vortex]]]:
    """Assigns holes and vortices to films, validating vortex placement."""
    holes_by_film = device.holes_by_film()
    vortices_by_film = {film_name: [] for film_name in device.films}
    for vortex in vortices:
        if not isinstance(vortex, Vortex):
            raise TypeError(f"Expected a Vortex, but got {type(vortex)}.")
        where = (vortex.x, vortex.y)
        if not device.films[vortex.film].contains_points(where).all():
            raise ValueError(
                f"Vortex {vortex!r} is not located in film {vortex.film!r}."
            )
        for hole in holes_by_film[vortex.film]:
            if hole.contains_points(where).all():
                raise ValueError(
                    f"Vortex {vortex} is located in hole {hole.name!r}."
                )
        vortices_by_film[vortex.film].append(vortex)
    return holes_by_film, vortices_by_film


def _sample_depth(value, sites: np.ndarray, dtype) -> np.ndarray:
    """Evaluates a penetration-depth spec (number or Parameter) at the mesh
    sites, returning a column vector of shape ``(n, 1)``."""
    if isinstance(value, numbers.Real):
        value = Constant(value)
    profile = np.atleast_1d(
        np.asarray(value(sites[:, 0], sites[:, 1]), dtype=dtype)
    )
    if profile.shape[0] != len(sites):
        profile = np.full(len(sites), profile.item(), dtype=dtype)
    return profile[:, np.newaxis]


def _depth_info(layer, film_name: str, sites: np.ndarray, dtype, device) -> LambdaInfo:
    """Builds the :class:`LambdaInfo` for one film, logging if the thin-film
    assumption (d << london_lambda) is violated."""
    london_lambda = layer.london_lambda
    if isinstance(london_lambda, numbers.Real) and london_lambda <= layer.thickness:
        logger.info(
            f"Layer {film_name!r}: The film thickness d = {layer.thickness:.4f} "
            f"{device.length_units} is greater than or equal to the "
            f"London penetration depth; the thin-film assumption that "
            f"the current density is constant over the thickness may "
            f"not be valid."
        )
    if london_lambda is not None:
        london_lambda = _sample_depth(london_lambda, sites, dtype)
    return LambdaInfo(
        film=film_name,
        Lambda=_sample_depth(layer.Lambda, sites, dtype),
        london_lambda=london_lambda,
        thickness=layer.thickness,
    )


def _hole_index_sets(
    mesh_sites: np.ndarray, holes: List[Polygon]
) -> Tuple[Dict[str, np.ndarray], np.ndarray]:
    """Per-hole mesh-index sets plus the combined in-any-hole mask."""
    hole_indices = {
        hole.name: hole.contains_points(mesh_sites, index=True) for hole in holes
    }
    in_hole = np.zeros(len(mesh_sites), dtype=bool)
    for indices in hole_indices.values():
        in_hole[indices] = True
    return hole_indices, in_hole


def _operator_blocks(mesh, dtype, dense_kernel: bool, inhomogeneous: bool):
    """Materializes the per-film operator blocks in the solve dtype.

    Dense mode keeps the Brandt kernel Q and Laplacian device-resident
    end-to-end (assembly -> system build -> factorization); on the CPU
    backend plain numpy assembly beats eager jnp dispatch, so dense blocks
    come back as numpy there.  Low-memory mode returns ``Q=None`` and the
    sparse COO operators for matrix-free application.
    """
    ops = mesh.operators
    if not dense_kernel:
        gradient_coo = (
            (ops.gradient_x, ops.gradient_y) if inhomogeneous else None
        )
        return None, ops.laplacian, None, gradient_coo
    import jax

    like = "jax" if jax.default_backend() != "cpu" else "numpy"
    Q = ops.Q_dense(dtype)
    if like == "numpy":
        Q = np.asarray(Q)
    laplacian = ops.laplacian.to_dense(dtype=dtype, like=like)
    gradient = None
    if inhomogeneous:
        import jax.numpy as jnp

        gradient = jnp.stack(
            [
                ops.gradient_x.to_dense(dtype=dtype, like="jax"),
                ops.gradient_y.to_dense(dtype=dtype, like="jax"),
            ]
        )
    return Q, laplacian, gradient, None


def make_film_info(
    *,
    device: Device,
    vortices: List[Vortex],
    circulating_currents: Dict[str, float],
    terminal_currents: Dict[str, Dict[str, float]],
) -> Dict[str, FilmInfo]:
    """Builds a :class:`FilmInfo` for every film in the device.

    Reference: ``superscreen/solver/utils.py:234-324``.
    """
    if not device.meshes:
        raise ValueError(
            "The device does not have a mesh. Call device.make_mesh() to "
            "generate it."
        )
    dtype = device.solve_dtype
    holes_by_film, vortices_by_film = get_holes_and_vortices_by_film(device, vortices)
    film_info = {}
    for name, film in device.films.items():
        mesh = device.meshes[name]
        layer = device.layers[film.layer]
        lambda_info = _depth_info(layer, name, mesh.sites, dtype, device)
        hole_indices, in_hole = _hole_index_sets(mesh.sites, holes_by_film[name])
        is_terminal = name in device.terminals
        # Terminal films keep a dense kernel regardless of size (the
        # boundary correction needs explicit kernel columns).
        dense_kernel = is_terminal or len(mesh.sites) <= MAX_DENSE_KERNEL_SIZE
        Q, laplacian, gradient, gradient_coo = _operator_blocks(
            mesh, dtype, dense_kernel, lambda_info.inhomogeneous
        )
        if is_terminal:
            boundary_indices = device.boundary_vertices(name)
        else:
            boundary_indices = mesh.boundary_indices
        film_info[name] = FilmInfo(
            name=name,
            layer=layer.name,
            lambda_info=lambda_info,
            vortices=tuple(vortices_by_film[name]),
            interior_indices=np.setdiff1d(
                film.contains_points(mesh.sites, index=True), boundary_indices
            ),
            boundary_indices=boundary_indices,
            hole_indices=hole_indices,
            in_hole=in_hole,
            circulating_currents={
                hole: current
                for hole, current in circulating_currents.items()
                if hole in hole_indices
            },
            terminal_currents=terminal_currents.get(name, None),
            weights=mesh.operators.weights.astype(dtype, copy=False),
            kernel=Q,
            gradient=gradient,
            gradient_coo=gradient_coo,
            laplacian=laplacian,
            sites=mesh.sites.astype(dtype, copy=False),
        )
    return film_info


def current_to_float(value, ureg, current_units: str) -> float:
    """Converts a current (float, string, or Quantity) to a float in
    ``current_units``."""
    if isinstance(value, str):
        value = ureg(value)
    if isinstance(value, Quantity):
        value = value.to(current_units).magnitude
    return value


def currents_to_floats(currents: Dict, ureg, current_units: str) -> Dict[str, float]:
    """Converts a dict of currents to floats in ``current_units``."""
    return {
        key: current_to_float(value, ureg, current_units)
        for key, value in currents.items()
    }


def convert_field(
    value,
    new_units,
    old_units=None,
    ureg=None,
    with_units: bool = True,
):
    """Converts between magnetic field H [current/length] and flux density
    B = mu0*H units, inserting the factor of mu0 when the dimensionalities
    differ (reference: ``superscreen/solver/utils.py:350-404``).

    Args:
        value: Array/float (with ``old_units``), unit string, or Quantity.
        new_units: Target units.
        old_units: Units of ``value`` if it is a bare number/array.
        ureg: The unit registry to use.
        with_units: Return a Quantity instead of a bare magnitude.
    """
    ureg = ureg or default_ureg
    if isinstance(value, str):
        value = ureg(value)
    if isinstance(value, Quantity):
        old_units = value.units
    elif old_units is None:
        raise ValueError(
            "Old units must be specified if value is not a string or Quantity."
        )
    else:
        if isinstance(old_units, str):
            old_units = ureg(old_units).units
        value = Quantity(value, old_units)
    if isinstance(new_units, str):
        new_units = ureg(new_units).units
    try:
        out = value.to(new_units)
    except DimensionalityError:
        # Bridge H <-> B with one factor of mu0.  H carries a [length] in
        # its dimensionality ([current]/[length]); B does not.
        if "[length]" in dict(old_units.dimensionality):
            out = (value * ureg("mu_0")).to(new_units)
        else:
            out = (value / ureg("mu_0")).to(new_units)
    return out if with_units else out.magnitude


def field_conversion_factor(
    field_units: str,
    current_units: str,
    length_units: str = "m",
    ureg=None,
) -> Quantity:
    """Conversion factor from ``field_units`` to
    ``current_units / length_units`` (reference:
    ``superscreen/solver/utils.py:407-437``)."""
    ureg = ureg or default_ureg
    one_field_unit = ureg(field_units)
    solver_units = f"{current_units} / {length_units}"
    try:
        factor = one_field_unit.to(solver_units)
    except DimensionalityError:
        # field_units is a flux density B = mu0 * H.
        factor = (one_field_unit / ureg("mu_0")).to(solver_units)
    return factor / one_field_unit


def stream_from_current_density(points: np.ndarray, J: np.ndarray) -> np.ndarray:
    """Scalar stream function along a path from a current density:
    ``g(r) = g(r0) + int (z x J) . dl`` (reference:
    ``superscreen/solver/utils.py:440-463``).

    ``J`` is sampled per path edge (shape ``(n - 1, 2)`` for ``n`` points);
    the returned stream has one value per edge, starting at zero.
    """
    tangents = np.diff(np.asarray(points), axis=0)
    # (z x J) . dl == Jx dy - Jy dx
    rate = J[:, 0] * tangents[:, 1] - J[:, 1] * tangents[:, 0]
    # Cumulative trapezoid with g[0] = 0.
    g = np.zeros(rate.shape[0], dtype=rate.dtype)
    np.cumsum(0.5 * (rate[1:] + rate[:-1]), out=g[1:])
    return g


def stream_from_terminal_current(points: np.ndarray, current: float) -> np.ndarray:
    """Stream function along a terminal carrying a uniformly distributed
    current perpendicular to the terminal (reference:
    ``superscreen/solver/utils.py:466-488``)."""
    edge_lengths, unit_normals = path_vectors(points)
    if current == 0:
        # Zero drive -> identically zero stream (the normalization below
        # would be 0/0).  Reached for every undriven terminal, e.g. by the
        # per-terminal unit basis of solve_many(terminal_currents=...).
        # Length matches stream_from_current_density (one per edge).
        return np.zeros(len(points) - 1)
    J = current * unit_normals / np.sum(edge_lengths)
    g = stream_from_current_density(points, J)
    return g * current / g[-1]
