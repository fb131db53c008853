"""Mesh and MeshOperators.

API parity with the reference ``superscreen/device/mesh.py``, re-architected
for TPU:

* ``MeshOperators`` keeps the sparse FEM operators (Laplacian, triangle and
  vertex gradients) as COO triplets on the host.  Dense casts are produced
  on demand in the solve dtype, and the dense Brandt kernel ``Q`` is
  assembled **on device** with the blocked JAX kernel in
  :mod:`superscreen_tpu.ops.kernels` rather than a numba loop.
* Sparse operators are applied inside jit as segment-sum matvecs.
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
        self.sites = np.asarray(sites).squeeze()
        self.elements = np.asarray(elements, dtype=np.int64)
        self.triangle_centroids = np.asarray(triangle_centroids)
        self.boundary_indices = np.asarray(boundary_indices, dtype=np.int64)
        self.vertex_areas = np.asarray(vertex_areas)
        self.triangle_areas = np.asarray(triangle_areas)
        self.edge_mesh = edge_mesh
        self.operators: Optional[MeshOperators] = None
        self._triangulation = None
        self._spatial_index = None
        if build_operators:
            self.operators = MeshOperators.from_mesh(self)

    @property
    def triangulation(self):
        """Matplotlib triangulation of the mesh (for interpolation/plots)."""
        if self._triangulation is None:
            from matplotlib.tri import Triangulation

            self._triangulation = Triangulation(
                self.sites[:, 0], self.sites[:, 1], self.elements
            )
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
        return np.stack(
            [ops.gradient_x.matvec(values), ops.gradient_y.matvec(values)], axis=-1
        )

    def stats(self) -> Dict[str, Union[int, float]]:
        """A dictionary of information about the mesh."""
        edge_lengths = self.edge_mesh.edge_lengths
        vertex_areas = self.vertex_areas
        return dict(
            num_sites=len(self.sites),
            num_elements=len(self.elements),
            min_edge_length=edge_lengths.min() if edge_lengths is not None else None,
            max_edge_length=edge_lengths.max() if edge_lengths is not None else None,
            min_vertex_area=vertex_areas.min() if vertex_areas is not None else None,
            max_vertex_area=vertex_areas.max() if vertex_areas is not None else None,
        )

    def closest_site(self, xy: Tuple[float, float]) -> int:
        """Index of the mesh site closest to ``(x, y)``."""
        return int(
            np.argmin(np.linalg.norm(self.sites - np.atleast_2d(xy), axis=1))
        )

    @staticmethod
    def from_triangulation(
        sites: Sequence[Tuple[float, float]],
        elements: Sequence[Tuple[int, int, int]],
        build_operators: bool = True,
    ) -> "Mesh":
        """Creates a :class:`Mesh` from a triangulation."""
        sites = np.asarray(sites).squeeze()
        elements = np.asarray(elements).squeeze()
        if sites.ndim != 2 or sites.shape[1] != 2:
            raise ValueError(
                f"The site coordinates must have shape (n, 2), got {sites.shape!r}"
            )
        if elements.ndim != 2 or elements.shape[1] != 3:
            raise ValueError(
                f"The elements must have shape (m, 3), got {elements.shape!r}."
            )
        boundary_indices = Mesh.find_boundary_indices(elements)
        edge_mesh = EdgeMesh.from_mesh(sites, elements)
        triangle_areas = mgen.triangle_areas(sites, elements)
        centroids = sites[elements].mean(axis=1)
        vertex_areas = mgen.vertex_areas(sites, elements, tri_areas=triangle_areas)
        return Mesh(
            sites=sites,
            elements=elements,
            triangle_centroids=centroids,
            boundary_indices=boundary_indices,
            edge_mesh=edge_mesh,
            vertex_areas=vertex_areas,
            triangle_areas=triangle_areas,
            build_operators=build_operators,
        )

    @staticmethod
    def find_boundary_indices(elements: np.ndarray) -> np.ndarray:
        """Indices of vertices on any mesh boundary (unordered)."""
        edges, is_boundary = mgen.get_edges(elements)
        boundary_edges = edges[is_boundary]
        return np.unique(boundary_edges.ravel())

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

    def to_hdf5(self, h5group: h5py.Group, compress: bool = True) -> None:
        """Saves the mesh to an :class:`h5py.Group` (compressed = sites and
        elements only; everything else is rebuilt on load)."""
        h5group["sites"] = self.sites
        h5group["elements"] = self.elements
        if not compress:
            h5group["triangle_centroids"] = self.triangle_centroids
            h5group["boundary_indices"] = self.boundary_indices
            h5group["vertex_areas"] = self.vertex_areas
            h5group["triangle_areas"] = self.triangle_areas
            self.edge_mesh.to_hdf5(h5group.create_group("edge_mesh"))

    @staticmethod
    def from_hdf5(h5group: h5py.Group) -> "Mesh":
        """Loads a mesh from an :class:`h5py.Group`."""
        if not ("sites" in h5group and "elements" in h5group):
            raise IOError("Could not load mesh due to missing data.")
        if Mesh.is_restorable(h5group):
            return Mesh(
                sites=np.array(h5group["sites"]),
                elements=np.array(h5group["elements"], dtype=np.int64),
                triangle_centroids=np.array(h5group["triangle_centroids"]),
                boundary_indices=np.array(
                    h5group["boundary_indices"], dtype=np.int64
                ),
                vertex_areas=np.array(h5group["vertex_areas"]),
                triangle_areas=np.array(h5group["triangle_areas"]),
                edge_mesh=EdgeMesh.from_hdf5(h5group["edge_mesh"]),
            )
        return Mesh.from_triangulation(
            sites=np.array(h5group["sites"]).squeeze(),
            elements=np.array(h5group["elements"]),
        )

    @staticmethod
    def is_restorable(h5group: h5py.Group) -> bool:
        """True if the group has all data needed to restore without
        recomputation."""
        return all(
            key in h5group
            for key in (
                "sites",
                "elements",
                "triangle_centroids",
                "boundary_indices",
                "vertex_areas",
                "triangle_areas",
                "edge_mesh",
            )
        )

    def copy(self) -> "Mesh":
        mesh = Mesh(
            sites=self.sites.copy(),
            elements=self.elements.copy(),
            triangle_centroids=self.triangle_centroids.copy(),
            boundary_indices=self.boundary_indices.copy(),
            vertex_areas=self.vertex_areas.copy(),
            triangle_areas=self.triangle_areas.copy(),
            edge_mesh=self.edge_mesh.copy(),
            build_operators=False,
        )
        if self.operators is not None:
            mesh.operators = self.operators.copy()
        return mesh


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
        self.gradient_x = gradient_x
        self.gradient_y = gradient_y
        self.gradient_tri_x = gradient_tri_x
        self.gradient_tri_y = gradient_tri_y
        self.laplacian = laplacian
        self._Q_cache: Dict[str, np.ndarray] = {}

    @staticmethod
    def from_mesh(mesh: Mesh) -> "MeshOperators":
        """Builds all operators for a mesh."""
        sites = mesh.sites
        elements = mesh.elements
        weights = mesh.vertex_areas
        gradient_tri_x, gradient_tri_y = fem.gradient_triangles_coo(
            sites, elements, areas=mesh.triangle_areas
        )
        gradient_x, gradient_y = fem.gradient_vertices_coo(
            sites, elements, areas=mesh.triangle_areas
        )
        laplacian = fem.build_laplacian_coo(sites, elements, masses=weights)
        return MeshOperators(
            weights=weights,
            sites=sites,
            gradient_x=gradient_x,
            gradient_y=gradient_y,
            gradient_tri_x=gradient_tri_x,
            gradient_tri_y=gradient_tri_y,
            laplacian=laplacian,
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
