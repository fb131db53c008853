"""Polygon: a simply-connected region bound to a layer.

API parity with the reference ``superscreen/device/polygon.py``, with the
GEOS/shapely dependency replaced by the pure-NumPy kernel in
:mod:`superscreen_tpu.polygon_ops`.
"""

import logging
from copy import deepcopy
from typing import Iterable, Optional, Tuple, Union

import h5py
import numpy as np
from matplotlib import path

from .. import polygon_ops as ops
from ..geometry import close_curve
from ..geometry import rotate as rotate_coords

logger = logging.getLogger("device")

__all__ = ["Polygon"]

PolygonType = Union["Polygon", np.ndarray]


def _resolve_origin(points: np.ndarray, origin) -> np.ndarray:
    if isinstance(origin, str):
        if origin == "center":
            mins = points.min(axis=0)
            maxs = points.max(axis=0)
            return (mins + maxs) / 2
        if origin == "centroid":
            return ops.centroid(points)
        raise ValueError(f"Invalid origin: {origin!r}.")
    return np.asarray(origin, dtype=float)


class Polygon:
    """A simply-connected polygon located in a Layer.

    Args:
        name: Name of the polygon.
        layer: Name of the layer in which the polygon is located.
        points: Shape ``(n, 2)`` array of polygon vertices (or another
            :class:`Polygon`).
    """

    __slots__ = ("name", "layer", "_points")

    def __init__(
        self,
        name: Optional[str] = None,
        *,
        layer: Optional[str] = None,
        points: PolygonType,
    ):
        self.name = name
        self.layer = layer
        self.points = points

    @property
    def points(self) -> np.ndarray:
        """Shape ``(n, 2)`` array of CCW-oriented polygon vertices (closed)."""
        return self._points

    @points.setter
    def points(self, points) -> None:
        if isinstance(points, Polygon):
            points = points.points
        points = np.asarray(points, dtype=float)
        if points.ndim != 2 or points.shape[-1] != 2:
            raise ValueError(f"Expected shape (n, 2), but got {points.shape}.")
        ring = ops.orient_ccw(points)
        if len(ring) < 3 or not ops.is_simple_polygon(ring):
            raise ValueError(
                "The given points do not define a valid simply-connected "
                "polygon (the boundary may be self-intersecting or "
                "degenerate)."
            )
        self._points = close_curve(ring)

    @property
    def is_valid(self) -> bool:
        """True if the polygon has a name, a layer, and valid geometry."""
        return (
            self.name is not None
            and self.layer is not None
            and ops.is_simple_polygon(self._points)
        )

    @property
    def area(self) -> float:
        """The area of the polygon."""
        return ops.polygon_area(self._points)

    @property
    def extents(self) -> Tuple[float, float]:
        """Total (x, y) extent of the polygon, ``(Delta_x, Delta_y)``."""
        p = self._points
        return float(np.ptp(p[:, 0])), float(np.ptp(p[:, 1]))

    @property
    def polygon(self) -> np.ndarray:
        """The closed polygon vertices (alias kept for API parity)."""
        return self._points

    @property
    def path(self) -> path.Path:
        """A :class:`matplotlib.path.Path` for the polygon boundary."""
        return path.Path(self._points, closed=True)

    def set_name(self, name: Union[str, None]) -> "Polygon":
        """Sets the polygon's name and returns ``self``."""
        self.name = name
        return self

    def set_layer(self, layer: Union[str, None]) -> "Polygon":
        """Sets the polygon's layer and returns ``self``."""
        self.layer = layer
        return self

    def contains_points(
        self,
        points: np.ndarray,
        index: bool = False,
        radius: float = 0,
    ) -> Union[bool, np.ndarray]:
        """Whether ``points`` lie within the polygon.

        Args:
            points: Shape ``(n, 2)`` coordinates.
            index: Return indices of contained points instead of a mask.
            radius: Margin added to the boundary (positive expands).
        """
        bool_array = self.path.contains_points(np.atleast_2d(points), radius=radius)
        if index:
            return np.where(bool_array)[0]
        return bool_array

    def on_boundary(
        self, points: np.ndarray, radius: float = 1e-3, index: bool = False
    ):
        """Whether ``points`` lie within ``radius`` of the boundary."""
        points = np.atleast_2d(points)
        p = self.path
        in_outer = p.contains_points(points, radius=radius)
        in_inner = p.contains_points(points, radius=-radius)
        boundary = np.logical_and(in_outer, ~in_inner)
        if index:
            return np.where(boundary)[0]
        return boundary

    def make_mesh(
        self,
        min_points: Optional[int] = None,
        max_edge_length: Optional[float] = None,
        convex_hull: bool = False,
        smooth: int = 0,
        build_operators: bool = False,
        **mesh_kwargs,
    ):
        """Creates a :class:`superscreen_tpu.Mesh` for the polygon.

        Args:
            min_points: Minimum number of mesh vertices.
            max_edge_length: Maximum edge length in the mesh.
            convex_hull: Mesh the entire convex hull of the polygon.
            smooth: Number of Laplacian smoothing steps.
            build_operators: Whether to build the
                :class:`superscreen_tpu.device.MeshOperators`.
        """
        from .mesh import Mesh
        from .mesh_generation import generate_mesh

        points, triangles = generate_mesh(
            self.points,
            min_points=min_points,
            max_edge_length=max_edge_length,
            convex_hull=convex_hull,
            **mesh_kwargs,
        )
        return Mesh.from_triangulation(
            points, triangles, build_operators=build_operators
        ).smooth(smooth, build_operators=build_operators)

    # -- affine transforms ---------------------------------------------------

    def rotate(
        self,
        degrees: float,
        origin: Union[str, Tuple[float, float]] = (0.0, 0.0),
        inplace: bool = False,
    ) -> "Polygon":
        """Rotates the polygon counterclockwise by ``degrees`` about
        ``origin`` ((x, y), "center", or "centroid")."""
        polygon = self if inplace else self.copy()
        o = _resolve_origin(self._points, origin)
        polygon.points = rotate_coords(self._points - o, degrees) + o
        return polygon

    def translate(
        self, dx: float = 0.0, dy: float = 0.0, inplace: bool = False
    ) -> "Polygon":
        """Translates the polygon by ``(dx, dy)``."""
        polygon = self if inplace else self.copy()
        polygon.points = self._points + np.array([[dx, dy]])
        return polygon

    def scale(
        self,
        xfact: float = 1.0,
        yfact: float = 1.0,
        origin: Union[str, Tuple[float, float]] = (0, 0),
        inplace: bool = False,
    ) -> "Polygon":
        """Scales the polygon by ``(xfact, yfact)`` about ``origin``.
        Negative factors reflect about the origin."""
        polygon = self if inplace else self.copy()
        o = _resolve_origin(self._points, origin)
        pts = (self._points - o) * np.array([[xfact, yfact]]) + o
        polygon.points = pts
        return polygon

    # -- boolean operations ----------------------------------------------------

    def _join_via(self, other: PolygonType, operation: str) -> np.ndarray:
        valid_operations = (
            "union",
            "intersection",
            "difference",
            "symmetric_difference",
        )
        if operation not in valid_operations:
            raise ValueError(
                f"Unknown operation: {operation}. "
                f"Valid operations are {valid_operations}."
            )
        if isinstance(other, Polygon):
            other_points = other.points
            if (
                self.layer is not None
                and other.layer is not None
                and self.layer != other.layer
            ):
                logger.warning(
                    f"Taking the {operation} of {self} and {other} even "
                    f"though they are assigned to different layers."
                )
        else:
            other_points = np.asarray(other, dtype=float)
            if other_points.ndim != 2 or other_points.shape[-1] != 2:
                raise TypeError(
                    f"Expected a Polygon or shape (n, 2) array, got {other!r}."
                )
        try:
            return ops.boolean_op(self.points, other_points, operation)
        except ops.PolygonOpError as err:
            raise ValueError(
                f"The {operation} of the two polygons is not a valid polygon "
                f"for the following reason: {err}."
            ) from err

    def union(self, *others: PolygonType, name: Optional[str] = None) -> "Polygon":
        """Returns the union of this polygon and zero or more others."""
        if not others:
            return self.copy()
        first, *rest = others
        return Polygon(
            name=name or self.name,
            layer=self.layer,
            points=self._join_via(first, "union"),
        ).union(*rest, name=name)

    def intersection(
        self, *others: PolygonType, name: Optional[str] = None
    ) -> "Polygon":
        """Returns the intersection of this polygon and zero or more others."""
        if not others:
            return self.copy()
        first, *rest = others
        return Polygon(
            name=name or self.name,
            layer=self.layer,
            points=self._join_via(first, "intersection"),
        ).intersection(*rest, name=name)

    def difference(
        self,
        *others: PolygonType,
        symmetric: bool = False,
        name: Optional[str] = None,
    ) -> "Polygon":
        """Returns the difference of this polygon and zero or more others."""
        operation = "symmetric_difference" if symmetric else "difference"
        if not others:
            return self.copy()
        first, *rest = others
        return Polygon(
            name=name or self.name,
            layer=self.layer,
            points=self._join_via(first, operation),
        ).difference(*rest, symmetric=symmetric, name=name)

    def buffer(
        self,
        distance: float,
        join_style: Union[str, int] = "mitre",
        mitre_limit: float = 5.0,
        single_sided: bool = False,
        as_polygon: bool = True,
    ) -> Union[np.ndarray, "Polygon"]:
        """Returns a polygon with vertices offset by ``distance``
        (positive inflates, negative shrinks)."""
        pts = ops.buffer_polygon(
            self.points,
            distance,
            join_style=join_style,
            mitre_limit=mitre_limit,
        )
        polygon = Polygon(name=f"{self.name}", layer=self.layer, points=pts)
        npts = max(polygon.points.shape[0], self.points.shape[0])
        polygon = polygon.resample(npts)
        if as_polygon:
            return polygon
        return polygon.points

    def resample(self, num_points: Optional[int] = None) -> "Polygon":
        """Resamples the boundary to approximately uniformly distributed
        vertices."""
        if num_points is None:
            num_points = len(self.points)
        if not num_points:
            return self.copy()
        # self.points is stored closed (first == last); resample_polygon
        # works on open rings, and the constructor re-closes the curve.
        new_points = ops.resample_polygon(self.points, num_points - 1)
        return Polygon(name=self.name, layer=self.layer, points=new_points)

    def plot(self, ax=None, **kwargs):
        """Plots the polygon's vertices."""
        import matplotlib.pyplot as plt

        if ax is None:
            _, ax = plt.subplots()
        kwargs = kwargs.copy()
        kwargs["label"] = self.name
        ax.plot(*self.points.T, **kwargs)
        ax.set_aspect("equal")
        return ax

    @classmethod
    def from_union(
        cls,
        items: Iterable[PolygonType],
        *,
        name: Optional[str] = None,
        layer: Optional[str] = None,
    ) -> "Polygon":
        """Creates a new polygon from the union of a sequence of polygons."""
        first, *rest = items
        polygon = cls(name=name, layer=layer, points=first)
        return polygon.union(*rest)

    @classmethod
    def from_intersection(
        cls,
        items: Iterable[PolygonType],
        *,
        name: Optional[str] = None,
        layer: Optional[str] = None,
    ) -> "Polygon":
        """Creates a new polygon from the intersection of a sequence of
        polygons."""
        first, *rest = items
        polygon = cls(name=name, layer=layer, points=first)
        return polygon.intersection(*rest)

    @classmethod
    def from_difference(
        cls,
        items: Iterable[PolygonType],
        *,
        name: Optional[str] = None,
        layer: Optional[str] = None,
        symmetric: bool = False,
    ) -> "Polygon":
        """Creates a new polygon from the difference of a sequence of
        polygons."""
        first, *rest = items
        polygon = cls(name=name, layer=layer, points=first)
        return polygon.difference(*rest, symmetric=symmetric)

    def __repr__(self) -> str:
        name = f"{self.name!r}" if self.name is not None else None
        layer = f"{self.layer!r}" if self.layer is not None else None
        return (
            f"{self.__class__.__name__}(name={name}, layer={layer}, "
            f"points=<ndarray: shape={self.points.shape}>)"
        )

    def __eq__(self, other) -> bool:
        if other is self:
            return True
        if not isinstance(other, Polygon):
            return False
        return (
            self.name == other.name
            and self.layer == other.layer
            and self.points.shape == other.points.shape
            and np.allclose(self.points, other.points)
        )

    def copy(self) -> "Polygon":
        return deepcopy(self)

    def to_hdf5(self, h5group: h5py.Group) -> None:
        if self.name:
            h5group.attrs["name"] = self.name
        if self.layer:
            h5group.attrs["layer"] = self.layer
        h5group["points"] = self.points

    @staticmethod
    def from_hdf5(h5group: h5py.Group) -> "Polygon":
        return Polygon(
            name=h5group.attrs.get("name", None),
            layer=h5group.attrs.get("layer", None),
            points=np.asarray(h5group["points"]),
        )
