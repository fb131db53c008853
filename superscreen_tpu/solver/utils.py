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


class LambdaInfo:
    """The effective penetration depth for a film, evaluated at mesh sites.

    Args:
        film: The film name.
        Lambda: Effective penetration depth at each mesh site, shape (n, 1).
        london_lambda: London penetration depth at each site (optional).
        thickness: The film thickness (optional).
    """

    lambda_str = "λ"
    Lambda_str = "Λ"

    def __init__(
        self,
        *,
        film: str,
        Lambda: np.ndarray,
        london_lambda: Optional[np.ndarray] = None,
        thickness: Optional[float] = None,
    ):
        self.film = film
        self.Lambda = Lambda
        self.london_lambda = london_lambda
        self.thickness = thickness
        self.inhomogeneous = (
            np.ptp(self.Lambda)
            / max(np.min(np.abs(self.Lambda)), np.finfo(float).eps)
            > 1e-6
        )
        if self.inhomogeneous:
            logger.info(
                f"Inhomogeneous {LambdaInfo.Lambda_str} in film {self.film!r}, "
                f"which violates the assumptions of the London model. "
                f"Results may not be reliable."
            )
        if self.london_lambda is not None:
            assert self.thickness is not None
            assert np.allclose(self.Lambda, self.london_lambda**2 / self.thickness)
        if np.any(self.Lambda < 0):
            raise ValueError(f"Negative Lambda in film {film!r}.")

    def to_hdf5(self, h5group: h5py.Group) -> None:
        h5group.attrs["film"] = self.film
        if self.london_lambda is not None:
            h5group["london_lambda"] = self.london_lambda
        if self.thickness is not None:
            h5group.attrs["thickness"] = self.thickness
        h5group["Lambda"] = self.Lambda

    @staticmethod
    def from_hdf5(h5group: h5py.Group) -> "LambdaInfo":
        london_lambda = None
        if "london_lambda" in h5group:
            london_lambda = np.array(h5group["london_lambda"])
        return LambdaInfo(
            film=h5group.attrs["film"],
            Lambda=np.array(h5group["Lambda"]),
            london_lambda=london_lambda,
            thickness=h5group.attrs.get("thickness", None),
        )


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
        h5group.attrs["name"] = self.name
        h5group.attrs["layer"] = self.layer
        self.lambda_info.to_hdf5(h5group.create_group("lambda_info"))
        vortices_grp = h5group.create_group("vortices")
        for i, vortex in enumerate(self.vortices):
            vortex.to_hdf5(vortices_grp.create_group(str(i)))
        h5group["interior_indices"] = self.interior_indices
        h5group["boundary_indices"] = self.boundary_indices
        hole_indices_grp = h5group.create_group("hole_indices")
        for hole, indices in self.hole_indices.items():
            hole_indices_grp[hole] = indices
        h5group["in_hole"] = self.in_hole
        circ_grp = h5group.create_group("circulating_currents")
        for hole, current in self.circulating_currents.items():
            circ_grp.attrs[hole] = current
        h5group["weights"] = np.asarray(self.weights)
        if self.kernel is not None:
            h5group["kernel"] = np.asarray(self.kernel)
        from ..ops.fem import COO

        if isinstance(self.laplacian, COO):
            lap = h5group.create_group("laplacian_coo")
            lap["rows"] = self.laplacian.rows
            lap["cols"] = self.laplacian.cols
            lap["vals"] = self.laplacian.vals
            lap.attrs["shape"] = self.laplacian.shape
        else:
            h5group["laplacian"] = np.asarray(self.laplacian)
        if self.sites is not None:
            h5group["sites"] = np.asarray(self.sites)
        if self.gradient is not None:
            h5group["gradient"] = np.asarray(self.gradient)
        if self.gradient_coo is not None:
            for axis, op in zip("xy", self.gradient_coo):
                grp = h5group.create_group(f"gradient_coo_{axis}")
                grp["rows"] = op.rows
                grp["cols"] = op.cols
                grp["vals"] = op.vals
                grp.attrs["shape"] = op.shape
        if self.terminal_currents is not None:
            term_grp = h5group.create_group("terminal_currents")
            for name, current in self.terminal_currents.items():
                term_grp.attrs[name] = current

    @staticmethod
    def from_hdf5(h5group: h5py.Group) -> "FilmInfo":
        name = h5group.attrs["name"]
        layer = h5group.attrs["layer"]
        lambda_info = LambdaInfo.from_hdf5(h5group["lambda_info"])
        vortices = []
        for i in sorted(h5group["vortices"], key=int):
            vortices.append(Vortex.from_hdf5(h5group[f"vortices/{i}"]))
        hole_indices = {
            hole: np.array(indices)
            for hole, indices in h5group["hole_indices"].items()
        }
        gradient = gradient_coo = terminal_currents = None
        if "gradient" in h5group:
            gradient = np.array(h5group["gradient"])
        if "gradient_coo_x" in h5group:
            from ..ops.fem import COO

            gradient_coo = tuple(
                COO(
                    rows=np.array(h5group[f"gradient_coo_{axis}"]["rows"]),
                    cols=np.array(h5group[f"gradient_coo_{axis}"]["cols"]),
                    vals=np.array(h5group[f"gradient_coo_{axis}"]["vals"]),
                    shape=tuple(h5group[f"gradient_coo_{axis}"].attrs["shape"]),
                )
                for axis in "xy"
            )
        if "terminal_currents" in h5group:
            terminal_currents = dict(h5group["terminal_currents"].attrs)
        kernel = None
        if "kernel" in h5group:
            kernel = np.array(h5group["kernel"])
        if "laplacian_coo" in h5group:
            from ..ops.fem import COO

            lap = h5group["laplacian_coo"]
            laplacian = COO(
                rows=np.array(lap["rows"]),
                cols=np.array(lap["cols"]),
                vals=np.array(lap["vals"]),
                shape=tuple(lap.attrs["shape"]),
            )
        else:
            laplacian = np.array(h5group["laplacian"])
        sites = None
        if "sites" in h5group:
            sites = np.array(h5group["sites"])
        return FilmInfo(
            name=name,
            layer=layer,
            lambda_info=lambda_info,
            vortices=tuple(vortices),
            interior_indices=np.array(h5group["interior_indices"]),
            boundary_indices=np.array(h5group["boundary_indices"]),
            hole_indices=hole_indices,
            in_hole=np.array(h5group["in_hole"]),
            circulating_currents=dict(h5group["circulating_currents"].attrs),
            weights=np.array(h5group["weights"]),
            kernel=kernel,
            laplacian=laplacian,
            gradient=gradient,
            gradient_coo=gradient_coo,
            terminal_currents=terminal_currents,
            sites=sites,
        )


def get_holes_and_vortices_by_film(
    device: Device, vortices: List[Vortex]
) -> Tuple[Dict[str, List[Polygon]], Dict[str, List[Vortex]]]:
    """Assigns holes and vortices to films, validating vortex placement."""
    vortices_by_film = {film_name: [] for film_name in device.films}
    holes_by_film = device.holes_by_film()
    for vortex in vortices:
        if not isinstance(vortex, Vortex):
            raise TypeError(f"Expected a Vortex, but got {type(vortex)}.")
        if not device.films[vortex.film].contains_points((vortex.x, vortex.y)).all():
            raise ValueError(
                f"Vortex {vortex!r} is not located in film {vortex.film!r}."
            )
        for hole in holes_by_film[vortex.film]:
            if hole.contains_points((vortex.x, vortex.y)).all():
                raise ValueError(
                    f"Vortex {vortex} is located in hole {hole.name!r}."
                )
        vortices_by_film[vortex.film].append(vortex)
    return holes_by_film, vortices_by_film


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
        london_lambda = layer.london_lambda
        d = layer.thickness
        Lambda = layer.Lambda
        if isinstance(london_lambda, numbers.Real) and london_lambda <= d:
            logger.info(
                f"Layer {name!r}: The film thickness d = {d:.4f} "
                f"{device.length_units} is greater than or equal to the "
                f"London penetration depth; the thin-film assumption that "
                f"the current density is constant over the thickness may "
                f"not be valid."
            )
        if isinstance(Lambda, numbers.Real):
            Lambda = Constant(Lambda)
        Lambda = np.asarray(
            Lambda(mesh.sites[:, 0], mesh.sites[:, 1]), dtype=dtype
        )
        Lambda = np.atleast_1d(Lambda)
        if Lambda.shape[0] != len(mesh.sites):
            Lambda = np.full(len(mesh.sites), Lambda.item(), dtype=dtype)
        Lambda = Lambda[:, np.newaxis]
        if london_lambda is not None:
            if isinstance(london_lambda, numbers.Real):
                london_lambda = Constant(london_lambda)
            london_lambda = np.asarray(
                london_lambda(mesh.sites[:, 0], mesh.sites[:, 1]), dtype=dtype
            )
            london_lambda = np.atleast_1d(london_lambda)
            if london_lambda.shape[0] != len(mesh.sites):
                london_lambda = np.full(
                    len(mesh.sites), london_lambda.item(), dtype=dtype
                )
            london_lambda = london_lambda[:, np.newaxis]

        hole_indices = {
            hole.name: hole.contains_points(mesh.sites, index=True)
            for hole in holes_by_film[name]
        }
        in_hole = np.zeros((len(mesh.sites)), dtype=bool)
        if hole_indices:
            in_hole[np.concatenate(list(hole_indices.values()))] = True
        circ_currents = {
            hole_name: current
            for hole_name, current in circulating_currents.items()
            if hole_name in hole_indices
        }
        lambda_info = LambdaInfo(
            film=name,
            Lambda=Lambda,
            london_lambda=london_lambda,
            thickness=layer.thickness,
        )
        weights = mesh.operators.weights.astype(dtype, copy=False)
        dense_kernel = (
            len(mesh.sites) <= MAX_DENSE_KERNEL_SIZE
            or name in device.terminals
        )
        # Device-resident dense operators: the Brandt kernel and Laplacian
        # stay on device end-to-end (assembly -> system build -> LU).  Above
        # MAX_DENSE_KERNEL_SIZE the kernel is matrix-free instead.
        if dense_kernel:
            import jax

            # On the CPU backend, plain numpy assembly is faster than
            # eager jnp dispatch; on TPU, stay device-resident.
            like = "jax" if jax.default_backend() != "cpu" else "numpy"
            Q = mesh.operators.Q_dense(dtype)
            if like == "numpy":
                Q = np.asarray(Q)
            laplacian = mesh.operators.laplacian.to_dense(
                dtype=dtype, like=like
            )
        else:
            Q = None
            laplacian = mesh.operators.laplacian
        grad = grad_coo = None
        if lambda_info.inhomogeneous:
            if dense_kernel:
                import jax.numpy as jnp

                grad_x = mesh.operators.gradient_x.to_dense(dtype=dtype, like="jax")
                grad_y = mesh.operators.gradient_y.to_dense(dtype=dtype, like="jax")
                grad = jnp.stack([grad_x, grad_y])
            else:
                # Low-memory mode keeps the vertex-gradient operators sparse;
                # the (grad Lambda . grad) term enters the system as extra
                # scatter/segment-sum triplets.
                grad_coo = (mesh.operators.gradient_x, mesh.operators.gradient_y)
        if name in device.terminals:
            boundary_indices = device.boundary_vertices(name)
        else:
            boundary_indices = mesh.boundary_indices
        interior_indices = np.setdiff1d(
            film.contains_points(mesh.sites, index=True), boundary_indices
        )
        term_currents = None
        if name in terminal_currents:
            term_currents = terminal_currents[name]
        film_info[name] = FilmInfo(
            name=name,
            layer=layer.name,
            lambda_info=lambda_info,
            vortices=tuple(vortices_by_film[name]),
            interior_indices=interior_indices,
            boundary_indices=boundary_indices,
            hole_indices=hole_indices,
            in_hole=in_hole,
            circulating_currents=circ_currents,
            terminal_currents=term_currents,
            weights=weights,
            kernel=Q,
            gradient=grad,
            gradient_coo=grad_coo,
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
    if ureg is None:
        ureg = default_ureg
    if isinstance(value, str):
        value = ureg(value)
    if isinstance(value, Quantity):
        old_units = value.units
    if old_units is None:
        raise ValueError(
            "Old units must be specified if value is not a string or Quantity."
        )
    if isinstance(old_units, str):
        old_units = ureg(old_units).units
    if isinstance(new_units, str):
        new_units = ureg(new_units).units
    if not isinstance(value, Quantity):
        value = Quantity(value, old_units)
    try:
        value = value.to(new_units)
    except DimensionalityError:
        if "[length]" in dict(old_units.dimensionality):
            # H [current/length] -> B = mu0 * H
            value = (value * ureg("mu_0")).to(new_units)
        else:
            # B -> H = B / mu0
            value = (value / ureg("mu_0")).to(new_units)
    if not with_units:
        value = value.magnitude
    return value


def field_conversion_factor(
    field_units: str,
    current_units: str,
    length_units: str = "m",
    ureg=None,
) -> Quantity:
    """Conversion factor from ``field_units`` to
    ``current_units / length_units`` (reference:
    ``superscreen/solver/utils.py:407-437``)."""
    if ureg is None:
        ureg = default_ureg
    field = ureg(field_units)
    target_units = f"{current_units} / {length_units}"
    try:
        field = field.to(target_units)
    except DimensionalityError:
        # field_units is a flux density B = mu0 * H.
        field = (field / ureg("mu_0")).to(target_units)
    return field / ureg(field_units)


def stream_from_current_density(points: np.ndarray, J: np.ndarray) -> np.ndarray:
    """Scalar stream function along a path from a current density:
    ``g(r) = g(r0) + int (z x J) . dl`` (reference:
    ``superscreen/solver/utils.py:440-463``).

    ``J`` is sampled per path edge (shape ``(n - 1, 2)`` for ``n`` points);
    the returned stream has one value per edge, starting at zero.
    """
    from scipy.integrate import cumulative_trapezoid

    # (0, 0, 1) x (Jx, Jy, 0) == (-Jy, Jx, 0)
    zhat_cross_J = np.array(J[:, [1, 0]])
    zhat_cross_J[:, 0] *= -1
    dl = np.diff(points, axis=0)
    integrand = np.sum(zhat_cross_J * dl, axis=1)
    return cumulative_trapezoid(integrand, initial=0)


def stream_from_terminal_current(points: np.ndarray, current: float) -> np.ndarray:
    """Stream function along a terminal carrying a uniformly distributed
    current perpendicular to the terminal (reference:
    ``superscreen/solver/utils.py:466-488``)."""
    edge_lengths, unit_normals = path_vectors(points)
    J = current * unit_normals / np.sum(edge_lengths)
    g = stream_from_current_density(points, J)
    return g * current / g[-1]
