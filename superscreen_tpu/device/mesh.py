"""Mesh and MeshOperators.

API parity with the reference ``superscreen/device/mesh.py``, re-architected
for TPU:

* ``MeshOperators`` keeps the sparse FEM operators (Laplacian, triangle and
  vertex gradients) as COO triplets on the host.  Dense casts are produced
  on demand in the solve dtype, and the dense Brandt kernel ``Q`` is
  assembled **on device** with the blocked JAX kernel in
  :mod:`superscreen_tpu.ops.kernels` rather than a numba loop.
* Sparse operators are applied inside jit as segment-sum matvecs.
* All per-mesh arrays live in one field table (like :class:`EdgeMesh`), so
  construction, HDF5 round-trip, and copying share one code path.
"""

from copy import deepcopy
from typing import Dict, Optional, Sequence, Tuple, Union

import h5py
import numpy as np

from ..ops import fem
from ..ops import kernels
from . import mesh_generation as mgen
from .edge_mesh import EdgeMesh

__all__ = ["Mesh", "MeshOperators"]

# Mesh array fields: name -> dtype forced on ingest (None = leave as float).
_MESH_FIELDS = {
    "sites": None,
    "elements": np.int64,
    "triangle_centroids": None,
    "boundary_indices": np.int64,
    "vertex_areas": None,
    "triangle_areas": None,
}

# Operators held by MeshOperators, in from_mesh build order.
_OPERATOR_NAMES = (
    "gradient_x",
    "gradient_y",
    "gradient_tri_x",
    "gradient_tri_y",
    "laplacian",
)


class Mesh:
    """A triangular mesh of a simply- or multiply-connected polygon.

    Use :meth:`Mesh.from_triangulation` to create a mesh from vertex
    coordinates and triangle indices.

    Args:
        sites: ``(n, 2)`` vertex coordinates.
        elements: ``(m, 3)`` triangle vertex indices.
        triangle_centroids: ``(m, 2)`` triangle centroids.
        boundary_indices: Indices of boundary vertices.
        vertex_areas: ``(n,)`` effective vertex areas.
        triangle_areas: ``(m,)`` triangle areas.
        edge_mesh: The :class:`EdgeMesh`.
        build_operators: Whether to build the :class:`MeshOperators`.
    """

    def __init__(
        self,
        sites: Sequence[Tuple[float, float]],
        elements: Sequence[Tuple[int, int, int]],
        triangle_centroids: Sequence[Tuple[float, float]],
        boundary_indices: Sequence[int],
        vertex_areas: Sequence[float],
        triangle_areas: Sequence[float],
        edge_mesh: EdgeMesh,
        build_operators: bool = True,
    ):
        given = dict(
            sites=np.asarray(sites).squeeze(),
            elements=elements,
            triangle_centroids=triangle_centroids,
            boundary_indices=boundary_indices,
            vertex_areas=vertex_areas,
            triangle_areas=triangle_areas,
        )
        for name, dtype in _MESH_FIELDS.items():
            setattr(self, name, np.asarray(given[name], dtype=dtype))
        self.edge_mesh = edge_mesh
        self.operators: Optional[MeshOperators] = None
        self._triangulation = None
        self._spatial_index = None
        if build_operators:
            self.operators = MeshOperators.from_mesh(self)

    def _arrays(self) -> Dict[str, np.ndarray]:
        return {name: getattr(self, name) for name in _MESH_FIELDS}

    @staticmethod
    def from_triangulation(
        sites: Sequence[Tuple[float, float]],
        elements: Sequence[Tuple[int, int, int]],
        build_operators: bool = True,
    ) -> "Mesh":
        """Creates a :class:`Mesh` from a triangulation, deriving all
        per-vertex/per-triangle geometry."""
        sites = np.asarray(sites).squeeze()
        elements = np.asarray(elements).squeeze()
        for arr, cols, what in (
            (sites, 2, "site coordinates"),
            (elements, 3, "elements"),
        ):
            if arr.ndim != 2 or arr.shape[1] != cols:
                raise ValueError(
                    f"The {what} must have shape (n, {cols}), "
                    f"got {arr.shape!r}."
                )
        tri_areas = mgen.triangle_areas(sites, elements)
        return Mesh(
            sites=sites,
            elements=elements,
            triangle_centroids=sites[elements].mean(axis=1),
            boundary_indices=Mesh.find_boundary_indices(elements),
            vertex_areas=mgen.vertex_areas(
                sites, elements, tri_areas=tri_areas
            ),
            triangle_areas=tri_areas,
            edge_mesh=EdgeMesh.from_mesh(sites, elements),
            build_operators=build_operators,
        )

    @staticmethod
    def find_boundary_indices(elements: np.ndarray) -> np.ndarray:
        """Indices of vertices on any mesh boundary (unordered)."""
        edges, is_boundary = mgen.get_edges(elements)
        return np.unique(edges[is_boundary])

    @property
    def triangulation(self):
        """Matplotlib triangulation of the mesh (for interpolation/plots)."""
        if self._triangulation is None:
            from matplotlib.tri import Triangulation

            x, y = self.sites.T
            self._triangulation = Triangulation(x, y, self.elements)
        return self._triangulation

    @property
    def spatial_index(self):
        """Uniform-grid triangle index for device-resident interpolation
        (built lazily, cached)."""
        if self._spatial_index is None:
            from ..ops import interp

            self._spatial_index = interp.build_triangle_index(
                self.sites, self.elements
            )
        return self._spatial_index

    def vertex_gradient(self, values: np.ndarray) -> np.ndarray:
        """Per-vertex gradient ``(n, 2)`` of per-vertex scalar ``values``
        via the AGS vertex-gradient operators."""
        ops = self.operators
        if ops is None:
            raise RuntimeError("Mesh was built without operators.")
        columns = (ops.gradient_x.matvec(values), ops.gradient_y.matvec(values))
        return np.stack(columns, axis=-1)

    def stats(self) -> Dict[str, Union[int, float]]:
        """A dictionary of information about the mesh."""

        def span(arr):
            return (None, None) if arr is None else (arr.min(), arr.max())

        lo_edge, hi_edge = span(self.edge_mesh.edge_lengths)
        lo_area, hi_area = span(self.vertex_areas)
        return dict(
            num_sites=len(self.sites),
            num_elements=len(self.elements),
            min_edge_length=lo_edge,
            max_edge_length=hi_edge,
            min_vertex_area=lo_area,
            max_vertex_area=hi_area,
        )

    def closest_site(self, xy: Tuple[float, float]) -> int:
        """Index of the mesh site closest to ``(x, y)``."""
        offsets = self.sites - np.atleast_2d(xy)
        return int(np.einsum("ij,ij->i", offsets, offsets).argmin())

    def smooth(self, iterations: int, build_operators: bool = True) -> "Mesh":
        """Laplacian smoothing of the interior vertices."""
        if not iterations:
            return self
        sites, elements = mgen.smooth_mesh(self.sites, self.elements, iterations)
        return Mesh.from_triangulation(
            sites, elements, build_operators=build_operators
        )

    def plot(
        self,
        ax=None,
        show_sites: bool = False,
        show_edges: bool = True,
        site_color=None,
        edge_color="k",
        linewidth: float = 0.75,
        linestyle: str = "-",
        marker: str = ".",
    ):
        """Plots the mesh."""
        import matplotlib.pyplot as plt

        if ax is None:
            _, ax = plt.subplots()
        ax.set_aspect("equal")
        x, y = self.sites.T
        if show_edges:
            ax.triplot(x, y, self.elements, color=edge_color, ls=linestyle, lw=linewidth)
        if show_sites:
            ax.plot(x, y, marker=marker, ls="", color=site_color)
        return ax

    # -- persistence -----------------------------------------------------

    def to_hdf5(self, h5group: h5py.Group, compress: bool = True) -> None:
        """Saves the mesh to an :class:`h5py.Group`.  With ``compress=True``
        only sites and elements are stored; the rest is rebuilt on load."""
        stored = self._arrays()
        if compress:
            stored = {k: stored[k] for k in ("sites", "elements")}
        for name, value in stored.items():
            h5group[name] = value
        if not compress:
            self.edge_mesh.to_hdf5(h5group.create_group("edge_mesh"))

    @staticmethod
    def is_restorable(h5group: h5py.Group) -> bool:
        """True if the group has all data needed to restore without
        recomputation."""
        needed = tuple(_MESH_FIELDS) + ("edge_mesh",)
        return all(key in h5group for key in needed)

    @staticmethod
    def from_hdf5(h5group: h5py.Group) -> "Mesh":
        """Loads a mesh from an :class:`h5py.Group`."""
        if not ("sites" in h5group and "elements" in h5group):
            raise IOError("Could not load mesh due to missing data.")
        if not Mesh.is_restorable(h5group):
            # Compressed save: re-derive everything from the triangulation.
            return Mesh.from_triangulation(
                sites=np.array(h5group["sites"]).squeeze(),
                elements=np.array(h5group["elements"]),
            )
        arrays = {
            name: np.array(h5group[name], dtype=dtype)
            for name, dtype in _MESH_FIELDS.items()
        }
        return Mesh(edge_mesh=EdgeMesh.from_hdf5(h5group["edge_mesh"]), **arrays)

    def copy(self) -> "Mesh":
        clone = Mesh(
            edge_mesh=self.edge_mesh.copy(),
            build_operators=False,
            **{k: v.copy() for k, v in self._arrays().items()},
        )
        if self.operators is not None:
            clone.operators = self.operators.copy()
        return clone


class MeshOperators:
    """Finite-element operators for a :class:`Mesh`.

    Args:
        weights: Effective vertex areas, shape ``(n,)``.
        sites: Mesh vertex coordinates (kept to build ``Q`` on demand).
        gradient_x, gradient_y: Vertex gradient operators (COO, ``(n, n)``).
        gradient_tri_x, gradient_tri_y: Triangle gradient operators
            (COO, ``(m, n)``).
        laplacian: Laplace-Beltrami operator (COO, ``(n, n)``).
    """

    def __init__(
        self,
        *,
        weights: np.ndarray,
        sites: np.ndarray,
        gradient_x: fem.COO,
        gradient_y: fem.COO,
        gradient_tri_x: fem.COO,
        gradient_tri_y: fem.COO,
        laplacian: fem.COO,
    ):
        self.weights = weights
        self.sites = sites
        operators = (
            gradient_x,
            gradient_y,
            gradient_tri_x,
            gradient_tri_y,
            laplacian,
        )
        for name, op in zip(_OPERATOR_NAMES, operators):
            setattr(self, name, op)
        self._Q_cache: Dict[str, np.ndarray] = {}

    @staticmethod
    def from_mesh(mesh: Mesh) -> "MeshOperators":
        """Builds all operators for a mesh."""
        sites, elements = mesh.sites, mesh.elements
        tri_areas = mesh.triangle_areas
        grad_v = fem.gradient_vertices_coo(sites, elements, areas=tri_areas)
        grad_t = fem.gradient_triangles_coo(sites, elements, areas=tri_areas)
        return MeshOperators(
            weights=mesh.vertex_areas,
            sites=sites,
            gradient_x=grad_v[0],
            gradient_y=grad_v[1],
            gradient_tri_x=grad_t[0],
            gradient_tri_y=grad_t[1],
            laplacian=fem.build_laplacian_coo(
                sites, elements, masses=mesh.vertex_areas
            ),
        )

    @property
    def Q(self):
        """The dense Brandt kernel ``Q`` in float64 (cached, device array)."""
        return self.Q_dense("float64")

    def Q_dense(self, dtype):
        """Dense Brandt kernel ``Q`` in the given dtype, assembled **and
        kept** on device (cached per dtype).  Call ``np.asarray`` on the
        result only when a host copy is genuinely needed -- device-to-host
        transfers are the expensive direction."""
        key = str(np.dtype(dtype))
        if key not in self._Q_cache:
            self._Q_cache[key] = kernels.Q_matrix(
                np.asarray(self.sites, dtype=dtype),
                np.asarray(self.weights, dtype=dtype),
            )
        return self._Q_cache[key]

    # Backwards-compatible aliases used by the solver.
    @staticmethod
    def C_vector(points: np.ndarray) -> np.ndarray:
        return np.asarray(kernels.C_vector(points))

    @staticmethod
    def Q_matrix(points: np.ndarray, weights: np.ndarray) -> np.ndarray:
        return np.asarray(kernels.Q_matrix(points, weights))

    def copy(self) -> "MeshOperators":
        return deepcopy(self)
