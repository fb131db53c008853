"""EdgeMesh: the edges of a triangular mesh.

API parity with the reference ``superscreen/device/edge_mesh.py``.
"""

from typing import Sequence, Tuple

import h5py
import numpy as np

from .mesh_generation import get_edges

__all__ = ["EdgeMesh"]


class EdgeMesh:
    """A mesh composed of the edges of a triangular mesh.

    Args:
        centers: ``(x, y)`` coordinates of the edge centers.
        edges: Vertex index pairs for each edge.
        boundary_edge_indices: Indices of edges on the boundary.
        directions: Edge direction vectors.
        edge_lengths: Edge lengths.
    """

    def __init__(
        self,
        centers: Sequence[Tuple[float, float]],
        edges: Sequence[Tuple[int, int]],
        boundary_edge_indices: Sequence[int],
        directions: Sequence[Tuple[float, float]],
        edge_lengths: Sequence[float],
    ):
        self.centers = np.asarray(centers)
        self.edges = np.asarray(edges)
        self.boundary_edge_indices = np.asarray(boundary_edge_indices, dtype=np.int64)
        self.directions = np.asarray(directions)
        self.edge_lengths = np.asarray(edge_lengths)

    @staticmethod
    def from_mesh(sites: np.ndarray, elements: np.ndarray) -> "EdgeMesh":
        """Builds the edge mesh for a triangulation."""
        edges, is_boundary = get_edges(elements)
        boundary_edge_indices = np.where(is_boundary)[0]
        edge_coords = sites[edges]
        edge_centers = edge_coords.mean(axis=1)
        directions = np.diff(edge_coords, axis=1).squeeze(axis=1)
        edge_lengths = np.linalg.norm(directions, axis=1)
        return EdgeMesh(
            edge_centers, edges, boundary_edge_indices, directions, edge_lengths
        )

    def to_hdf5(self, h5group: h5py.Group) -> None:
        h5group["centers"] = self.centers
        h5group["edges"] = self.edges
        h5group["boundary_edge_indices"] = self.boundary_edge_indices
        h5group["directions"] = self.directions
        h5group["edge_lengths"] = self.edge_lengths

    @classmethod
    def from_hdf5(cls, h5group: h5py.Group) -> "EdgeMesh":
        required = (
            "centers",
            "edges",
            "boundary_edge_indices",
            "directions",
            "edge_lengths",
        )
        if not all(key in h5group for key in required):
            raise IOError("Could not load edge mesh due to missing data.")
        return EdgeMesh(
            centers=np.array(h5group["centers"]),
            edges=np.array(h5group["edges"], dtype=np.int64),
            boundary_edge_indices=np.array(
                h5group["boundary_edge_indices"], dtype=np.int64
            ),
            directions=np.array(h5group["directions"]),
            edge_lengths=np.array(h5group["edge_lengths"]),
        )

    def copy(self) -> "EdgeMesh":
        return EdgeMesh(
            centers=self.centers.copy(),
            edges=self.edges.copy(),
            boundary_edge_indices=self.boundary_edge_indices.copy(),
            directions=self.directions.copy(),
            edge_lengths=self.edge_lengths.copy(),
        )
