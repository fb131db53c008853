"""Planar polygon primitive.

Mirrors the public surface of the reference ``superscreen/device/polygon.py``
(shapely-backed) on top of this package's own boolean/offset kernel,
:mod:`superscreen_tpu.polygon_ops`.  All geometry is eager NumPy on host --
polygons exist to *define* meshes, they never appear on the TPU.
"""

import logging
from copy import deepcopy
from typing import Iterable, Optional, Tuple, Union

import h5py
import numpy as np
from matplotlib import path as mpl_path

from .. import polygon_ops as ops
from ..geometry import close_curve
from ..geometry import rotate as rotate_coords

logger = logging.getLogger("device")

__all__ = ["Polygon"]

PolygonType = Union["Polygon", np.ndarray]

#: Boolean operations understood by :meth:`Polygon._fold`.
_BOOLEAN_OPS = frozenset(
    {"union", "intersection", "difference", "symmetric_difference"}
)


def _coerce_ring(points) -> np.ndarray:
    """Normalize any accepted vertex input to a closed CCW ``(n, 2)`` ring,
    raising ``ValueError`` for non-simple or degenerate boundaries."""
    if isinstance(points, Polygon):
        points = points.points
    ring = np.asarray(points, dtype=float)
    if ring.ndim != 2 or ring.shape[-1] != 2:
        raise ValueError(f"Expected shape (n, 2), but got {ring.shape}.")
    ring = ops.orient_ccw(ring)
    if len(ring) < 3 or not ops.is_simple_polygon(ring):
        raise ValueError(
            "The given points do not define a valid simply-connected "
            "polygon (the boundary may be self-intersecting or degenerate)."
        )
    return close_curve(ring)


def _anchor_point(ring: np.ndarray, origin) -> np.ndarray:
    """Resolve a transform origin: literal (x, y), bounding-box "center",
    or mass "centroid"."""
    if not isinstance(origin, str):
        return np.asarray(origin, dtype=float)
    if origin == "center":
        return 0.5 * (ring.min(axis=0) + ring.max(axis=0))
    if origin == "centroid":
        return ops.centroid(ring)
    raise ValueError(f"Invalid origin: {origin!r}.")


class Polygon:
    """A simply-connected region assigned to a :class:`Layer`.

    Args:
        name: Name of the polygon.
        layer: Name of the layer in which the polygon is located.
        points: ``(n, 2)`` vertex array or another :class:`Polygon`.
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

    # -- vertices --------------------------------------------------------

    @property
    def points(self) -> np.ndarray:
        """Closed, CCW-oriented ``(n, 2)`` vertex array."""
        return self._points

    @points.setter
    def points(self, points) -> None:
        self._points = _coerce_ring(points)

    @property
    def polygon(self) -> np.ndarray:
        """Alias of :attr:`points` (the reference returns a shapely object
        here; this package has no such type)."""
        return self._points

    @property
    def path(self) -> mpl_path.Path:
        """The boundary as a :class:`matplotlib.path.Path`."""
        return mpl_path.Path(self._points, closed=True)

    @property
    def is_valid(self) -> bool:
        """Whether the polygon is fully specified (named, on a layer, and
        geometrically simple)."""
        if self.name is None or self.layer is None:
            return False
        return ops.is_simple_polygon(self._points)

    @property
    def area(self) -> float:
        """Enclosed area."""
        return ops.polygon_area(self._points)

    @property
    def extents(self) -> Tuple[float, float]:
        """Bounding-box side lengths ``(Delta_x, Delta_y)``."""
        span = self._points.max(axis=0) - self._points.min(axis=0)
        return float(span[0]), float(span[1])

    def set_name(self, name: Union[str, None]) -> "Polygon":
        """Renames the polygon; returns ``self`` for chaining."""
        self.name = name
        return self

    def set_layer(self, layer: Union[str, None]) -> "Polygon":
        """Re-assigns the polygon's layer; returns ``self`` for chaining."""
        self.layer = layer
        return self

    # -- point queries ---------------------------------------------------

    def _hit_mask(self, points: np.ndarray, radius: float) -> np.ndarray:
        # matplotlib's radius semantics (a signed margin on the path) are
        # part of the reference API contract, so route through Path here
        # rather than ops.points_in_polygon.
        return self.path.contains_points(np.atleast_2d(points), radius=radius)

    def contains_points(
        self,
        points: np.ndarray,
        index: bool = False,
        radius: float = 0,
    ) -> Union[bool, np.ndarray]:
        """Tests which of ``points`` fall inside the polygon.

        Args:
            points: ``(n, 2)`` query coordinates.
            index: Return the indices of the hits instead of a boolean mask.
            radius: Signed margin added around the boundary.
        """
        mask = self._hit_mask(points, radius)
        return np.flatnonzero(mask) if index else mask

    def on_boundary(
        self, points: np.ndarray, radius: float = 1e-3, index: bool = False
    ):
        """Tests which of ``points`` lie within ``radius`` of the boundary
        (inside the inflated outline but outside the deflated one)."""
        mask = self._hit_mask(points, radius) & ~self._hit_mask(points, -radius)
        return np.flatnonzero(mask) if index else mask

    # -- meshing ---------------------------------------------------------

    def make_mesh(
        self,
        min_points: Optional[int] = None,
        max_edge_length: Optional[float] = None,
        convex_hull: bool = False,
        smooth: int = 0,
        build_operators: bool = False,
        **mesh_kwargs,
    ):
        """Triangulates the polygon into a :class:`superscreen_tpu.Mesh`.

        Args:
            min_points: Minimum number of mesh vertices.
            max_edge_length: Maximum edge length in the mesh.
            convex_hull: Mesh the full convex hull instead of the interior.
            smooth: Number of Laplacian smoothing passes.
            build_operators: Also build the
                :class:`superscreen_tpu.device.MeshOperators`.
        """
        from .mesh import Mesh
        from .mesh_generation import generate_mesh

        sites, elements = generate_mesh(
            self._points,
            min_points=min_points,
            max_edge_length=max_edge_length,
            convex_hull=convex_hull,
            **mesh_kwargs,
        )
        mesh = Mesh.from_triangulation(
            sites, elements, build_operators=build_operators
        )
        return mesh.smooth(smooth, build_operators=build_operators)

    # -- affine transforms -----------------------------------------------

    def _remapped(self, fn, inplace: bool) -> "Polygon":
        """Applies ``fn(vertices) -> vertices`` to ``self`` or a copy."""
        target = self if inplace else self.copy()
        target.points = fn(self._points)
        return target

    def rotate(
        self,
        degrees: float,
        origin: Union[str, Tuple[float, float]] = (0.0, 0.0),
        inplace: bool = False,
    ) -> "Polygon":
        """Rotates CCW by ``degrees`` about ``origin`` ((x, y), "center",
        or "centroid")."""
        pivot = _anchor_point(self._points, origin)
        return self._remapped(
            lambda p: rotate_coords(p - pivot, degrees) + pivot, inplace
        )

    def translate(
        self, dx: float = 0.0, dy: float = 0.0, inplace: bool = False
    ) -> "Polygon":
        """Shifts the polygon by ``(dx, dy)``."""
        shift = np.array([dx, dy], dtype=float)
        return self._remapped(lambda p: p + shift, inplace)

    def scale(
        self,
        xfact: float = 1.0,
        yfact: float = 1.0,
        origin: Union[str, Tuple[float, float]] = (0, 0),
        inplace: bool = False,
    ) -> "Polygon":
        """Scales by ``(xfact, yfact)`` about ``origin``; negative factors
        mirror the polygon."""
        pivot = _anchor_point(self._points, origin)
        gain = np.array([xfact, yfact], dtype=float)
        return self._remapped(lambda p: (p - pivot) * gain + pivot, inplace)

    # -- boolean algebra -------------------------------------------------

    def _join_via(self, other: PolygonType, operation: str) -> np.ndarray:
        """One boolean step against a single other polygon-like object."""
        if operation not in _BOOLEAN_OPS:
            raise ValueError(
                f"Unknown operation: {operation}. "
                f"Valid operations are {tuple(sorted(_BOOLEAN_OPS))}."
            )
        if isinstance(other, Polygon):
            if None not in (self.layer, other.layer) and self.layer != other.layer:
                logger.warning(
                    f"Taking the {operation} of {self} and {other} even "
                    f"though they are assigned to different layers."
                )
            clip = other.points
        else:
            clip = np.asarray(other, dtype=float)
            if clip.ndim != 2 or clip.shape[-1] != 2:
                raise TypeError(
                    f"Expected a Polygon or shape (n, 2) array, got {other!r}."
                )
        try:
            return ops.boolean_op(self._points, clip, operation)
        except ops.PolygonOpError as err:
            raise ValueError(
                f"The {operation} of the two polygons is not a valid polygon "
                f"for the following reason: {err}."
            ) from err

    def _fold(self, operation: str, others, name: Optional[str]) -> "Polygon":
        """Left-folds ``operation`` over ``others``, threading name/layer."""
        acc = self.copy()
        for other in others:
            acc = Polygon(
                name=name or self.name,
                layer=self.layer,
                points=acc._join_via(other, operation),
            )
        return acc

    def union(self, *others: PolygonType, name: Optional[str] = None) -> "Polygon":
        """The union of this polygon with zero or more others."""
        return self._fold("union", others, name)

    def intersection(
        self, *others: PolygonType, name: Optional[str] = None
    ) -> "Polygon":
        """The intersection of this polygon with zero or more others."""
        return self._fold("intersection", others, name)

    def difference(
        self,
        *others: PolygonType,
        symmetric: bool = False,
        name: Optional[str] = None,
    ) -> "Polygon":
        """The (symmetric) difference of this polygon and zero or more
        others."""
        op = "symmetric_difference" if symmetric else "difference"
        return self._fold(op, others, name)

    @classmethod
    def from_union(
        cls,
        items: Iterable[PolygonType],
        *,
        name: Optional[str] = None,
        layer: Optional[str] = None,
    ) -> "Polygon":
        """Builds one polygon as the union of ``items``."""
        return cls._from_fold("union", items, name, layer)

    @classmethod
    def from_intersection(
        cls,
        items: Iterable[PolygonType],
        *,
        name: Optional[str] = None,
        layer: Optional[str] = None,
    ) -> "Polygon":
        """Builds one polygon as the intersection of ``items``."""
        return cls._from_fold("intersection", items, name, layer)

    @classmethod
    def from_difference(
        cls,
        items: Iterable[PolygonType],
        *,
        name: Optional[str] = None,
        layer: Optional[str] = None,
        symmetric: bool = False,
    ) -> "Polygon":
        """Builds one polygon as the (symmetric) difference of ``items``."""
        op = "symmetric_difference" if symmetric else "difference"
        return cls._from_fold(op, items, name, layer)

    @classmethod
    def _from_fold(cls, operation, items, name, layer) -> "Polygon":
        head, *tail = items
        seed = cls(name=name, layer=layer, points=head)
        return seed._fold(operation, tail, name)

    # -- offsetting / resampling -----------------------------------------

    def buffer(
        self,
        distance: float,
        join_style: Union[str, int] = "mitre",
        mitre_limit: float = 5.0,
        single_sided: bool = False,
        as_polygon: bool = True,
    ) -> Union[np.ndarray, "Polygon"]:
        """Offsets the boundary outward by ``distance`` (inward if
        negative), then resamples to at least the original vertex count."""
        offset_ring = ops.buffer_polygon(
            self._points,
            distance,
            join_style=join_style,
            mitre_limit=mitre_limit,
        )
        out = Polygon(
            name=f"{self.name}", layer=self.layer, points=offset_ring
        ).resample(max(len(offset_ring), len(self._points)))
        return out if as_polygon else out.points

    def resample(self, num_points: Optional[int] = None) -> "Polygon":
        """Redistributes vertices ~uniformly along the boundary.

        ``num_points=None`` keeps the current count; a falsy count returns
        an unmodified copy.
        """
        if num_points is None:
            num_points = len(self._points)
        if not num_points:
            return self.copy()
        # Stored rings are closed; the resampler wants an open ring and the
        # constructor re-closes it, hence the off-by-one.
        ring = ops.resample_polygon(self._points, num_points - 1)
        return Polygon(name=self.name, layer=self.layer, points=ring)

    # -- misc ------------------------------------------------------------

    def plot(self, ax=None, **kwargs):
        """Draws the boundary on a matplotlib Axes (created if needed)."""
        import matplotlib.pyplot as plt

        if ax is None:
            _, ax = plt.subplots()
        ax.plot(*self._points.T, **dict(kwargs, label=self.name))
        ax.set_aspect("equal")
        return ax

    def copy(self) -> "Polygon":
        return deepcopy(self)

    def __repr__(self) -> str:
        name = None if self.name is None else f"{self.name!r}"
        layer = None if self.layer is None else f"{self.layer!r}"
        return (
            f"{type(self).__name__}(name={name}, layer={layer}, "
            f"points=<ndarray: shape={self._points.shape}>)"
        )

    def __eq__(self, other) -> bool:
        if other is self:
            return True
        if not isinstance(other, Polygon):
            return False
        if (self.name, self.layer) != (other.name, other.layer):
            return False
        return self._points.shape == other._points.shape and np.allclose(
            self._points, other._points
        )

    def to_hdf5(self, h5group: h5py.Group) -> None:
        for attr in ("name", "layer"):
            value = getattr(self, attr)
            if value:
                h5group.attrs[attr] = value
        h5group["points"] = self._points

    @staticmethod
    def from_hdf5(h5group: h5py.Group) -> "Polygon":
        return Polygon(
            name=h5group.attrs.get("name", None),
            layer=h5group.attrs.get("layer", None),
            points=np.asarray(h5group["points"]),
        )
