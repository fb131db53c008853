"""Differentiable (adjoint) solves for inverse design.

This module has no analog in the reference package: it exposes the Brandt
stream-function solve as a **pure JAX function of the physical parameters**,
so reverse-mode AD delivers gradients of any observable with respect to

* the penetration-depth profile ``Lambda(x, y)`` (per mesh site),
* the applied field at the mesh sites,
* circulating (hole) currents, and
* vortex fluxoid counts ``nPhi0``,

at the cost of O(1) extra linear solves (the gradient of ``jnp.linalg.solve``
is implicit — a transposed solve against the same factorization — not
differentiation through an iterative loop).  Typical uses: fitting a
position-dependent ``Lambda`` to a measured scanning-SQUID map, optimizing
circulating currents for a target fluxoid state, or sensitivity analysis of
mutual inductances.

The forward model follows the same equations as the main solver:

* system assembly ``A = Q w^T - Lambda nabla^2 - (grad Lambda) . grad``
  (reference ``superscreen/solver/solve_film.py:151-305``),
* hole boundary conditions, the interior solve, and per-vortex rank-1
  responses (reference ``superscreen/solver/solve_film.py:440-574``),
* self-consistent inter-film Biot-Savart coupling
  (reference ``superscreen/solver/solve.py:28-73, 491-536``).

Unlike the main solver the full chain here stays inside one ``jax.jit`` —
there is no factorization cache, no iterative refinement, and no host
round-trip — because autodiff needs the whole computation as one traced
program.  Use it for moderate mesh sizes (the dense system is rebuilt on
every call); production forward-only sweeps should keep using
:func:`superscreen_tpu.solve` / :func:`superscreen_tpu.solve_many`.

Transport terminals ARE supported: the terminal boundary streams are
linear in the terminal currents, so per-terminal unit streams are
precomputed at build time (geometry only) and the three-step transport
bootstrap (reference ``superscreen/solver/solve_film.py:308-390``) is
replayed inside the trace against the Lambda-dependent system matrix.
Gradients therefore flow to terminal currents as well.
"""

from dataclasses import dataclass, field
from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .device import Device
from .geometry import close_curve, path_vectors
from .ops import kernels
from .solver.utils import (
    field_conversion_factor,
    make_film_info,
)
from .solution import Vortex

__all__ = ["AdjointModel", "FilmAdjointData", "build_adjoint_model"]


def _coo_matvec(rows, cols, vals, x, n):
    """Differentiable COO matvec: ``out[i] = sum_k vals[k] x[cols[k]]``
    for ``rows[k] == i`` (segment-sum; transpose under AD is a gather)."""
    return jax.ops.segment_sum(vals * x[cols], rows, num_segments=n)


@dataclass
class FilmAdjointData:
    """Static per-film arrays for the differentiable forward model.

    Everything here is parameter-independent: the Brandt kernel ``Q``,
    the COO Laplacian and vertex-gradient operators, vertex areas, and the
    solver index sets.  ``Lambda`` enters later, inside the traced forward,
    so the system matrix is a differentiable function of it.
    """

    name: str
    n: int
    hole_names: Tuple[str, ...]
    vortex_rows: Tuple[int, ...]  # positions within `interior` (static)
    vortex_sites: Tuple[int, ...]  # global mesh indices (static)
    sites: jnp.ndarray  # (n, 2)
    weights: jnp.ndarray  # (n,) vertex areas
    Q: jnp.ndarray  # (n, n) dense Brandt kernel
    lap_rows: jnp.ndarray
    lap_cols: jnp.ndarray
    lap_vals: jnp.ndarray
    gx_rows: jnp.ndarray
    gx_cols: jnp.ndarray
    gx_vals: jnp.ndarray
    gy_rows: jnp.ndarray
    gy_cols: jnp.ndarray
    gy_vals: jnp.ndarray
    interior: np.ndarray  # (ni,) static solve index set (host array)
    hole_masks: jnp.ndarray  # (n_holes, n) 1.0 where site is in the hole
    z0: float
    default_Lambda: jnp.ndarray  # (n,) from the device's layers
    # --- transport terminals (empty/None for films without terminals) ---
    terminal_names: Tuple[str, ...] = ()
    boundary_ix: Optional[np.ndarray] = None  # (nb,) CCW boundary (static)
    fwb: Optional[np.ndarray] = None  # film-without-boundary set (static)
    term_unit_streams: Optional[jnp.ndarray] = None  # (nt, n) unit-current
    boundary_centers: Optional[jnp.ndarray] = None  # (nb, 2) edge midpoints
    boundary_lengths: Optional[jnp.ndarray] = None  # (nb,)
    boundary_normals: Optional[jnp.ndarray] = None  # (nb, 2)
    tri_centroids: Optional[jnp.ndarray] = None  # (m, 2)
    tri_areas: Optional[jnp.ndarray] = None  # (m,)
    gtx_rows: Optional[jnp.ndarray] = None  # triangle-gradient COO (x)
    gtx_cols: Optional[jnp.ndarray] = None
    gtx_vals: Optional[jnp.ndarray] = None
    gty_rows: Optional[jnp.ndarray] = None  # triangle-gradient COO (y)
    gty_cols: Optional[jnp.ndarray] = None
    gty_vals: Optional[jnp.ndarray] = None


_FAD_ARRAYS = (
    "sites", "weights", "Q", "lap_rows", "lap_cols", "lap_vals",
    "gx_rows", "gx_cols", "gx_vals", "gy_rows", "gy_cols", "gy_vals",
    "hole_masks", "default_Lambda",
    "term_unit_streams", "boundary_centers", "boundary_lengths",
    "boundary_normals", "tri_centroids", "tri_areas",
    "gtx_rows", "gtx_cols", "gtx_vals", "gty_rows", "gty_cols", "gty_vals",
)
_FAD_STATIC = (
    "name", "n", "hole_names", "vortex_rows", "vortex_sites", "interior", "z0",
    "terminal_names", "boundary_ix", "fwb",
)


def _fad_flatten(d: FilmAdjointData):
    return (
        tuple(getattr(d, f) for f in _FAD_ARRAYS),
        tuple(
            tuple(v.tolist()) if isinstance(v, np.ndarray) else v
            for v in (getattr(d, f) for f in _FAD_STATIC)
        ),
    )


def _fad_unflatten(aux, children):
    kwargs = dict(zip(_FAD_ARRAYS, children))
    kwargs.update(dict(zip(_FAD_STATIC, aux)))
    for key in ("interior", "boundary_ix", "fwb"):
        if kwargs[key] is not None:
            kwargs[key] = np.asarray(kwargs[key], dtype=np.int64)
    return FilmAdjointData(**kwargs)


jax.tree_util.register_pytree_node(FilmAdjointData, _fad_flatten, _fad_unflatten)


def _terminal_stream(data: FilmAdjointData, A, terminal_currents, lu_piv):
    """Differentiable replay of the three-step transport bootstrap
    (``solver.solve_film.solve_for_terminal_current_stream``): boundary
    stream (linear in the terminal currents, via precomputed unit
    streams), solve in the film ignoring holes, set each hole to its
    weighted average, and re-solve without holes.  ``lu_piv`` is the LU of
    the main interior system ``-A[ix, ix]`` (``ix == data.interior``, the
    film-without-boundary-or-holes set), shared with the caller's solve."""
    w = data.weights
    bix = data.boundary_ix
    fwb = data.fwb
    g = terminal_currents @ data.term_unit_streams  # (n,), boundary support
    g = g - jnp.max(g) + (jnp.max(g) - jnp.min(g)) / 2.0
    ha = -(A[:, bix] @ g[bix])
    gf = jnp.linalg.solve(-A[np.ix_(fwb, fwb)], -ha[fwb])
    g = g.at[fwb].set(gf)
    if not data.hole_names:
        return g
    for k in range(len(data.hole_names)):
        m = data.hole_masks[k]
        avg = jnp.sum(w * m * g) / jnp.sum(w * m)
        g = g * (1.0 - m) + avg * m
    hole_support = jnp.sum(data.hole_masks, axis=0)
    ha = -(A @ (g * hole_support)) - (A[:, bix] @ g[bix])
    ix = data.interior  # == film without boundary or holes
    gf = jax.scipy.linalg.lu_solve(lu_piv, -ha[ix])
    return g.at[ix].set(gf)


def _film_forward(data: FilmAdjointData, vortex_flux, Lambda, hz_solver,
                  hole_currents, vortex_nphi0, field_other,
                  terminal_currents=None):
    """One differentiable single-film solve, in solver units.

    Mirrors ``solver.solve_film.solve_film``: assemble ``A(Lambda)``,
    bootstrap the transport stream (terminal films), apply hole BCs, solve
    the interior system, add vortex responses, then derive ``J`` and the
    screening field (triangle-centroid Biot-Savart for terminal films).
    """
    n = data.n
    w = data.weights
    Lambda = jnp.broadcast_to(jnp.asarray(Lambda, w.dtype), (n,))
    # A_ij = Q_ij w_j - Lambda_j L_ij - (gx@Lambda)_i gx_ij - (gy@Lambda)_i gy_ij.
    # The grad-Lambda term is always included: it vanishes identically for
    # uniform Lambda but carries the d(A)/d(Lambda) inhomogeneity gradient.
    A = data.Q * w[None, :]
    A = A.at[data.lap_rows, data.lap_cols].add(
        -data.lap_vals * Lambda[data.lap_cols]
    )
    dLx = _coo_matvec(data.gx_rows, data.gx_cols, data.gx_vals, Lambda, n)
    dLy = _coo_matvec(data.gy_rows, data.gy_cols, data.gy_vals, Lambda, n)
    A = A.at[data.gx_rows, data.gx_cols].add(-dLx[data.gx_rows] * data.gx_vals)
    A = A.at[data.gy_rows, data.gy_cols].add(-dLy[data.gy_rows] * data.gy_vals)

    # Hole boundary conditions: g = I_circ inside each hole; the holes'
    # effective field is -(A @ g0) because g0 is supported on the holes.
    if data.hole_names:
        g0 = hole_currents @ data.hole_masks
    else:
        g0 = jnp.zeros(n, dtype=w.dtype)
    Hz = hz_solver + field_other
    ix = data.interior
    h = Hz[ix] + (A @ g0)[ix]
    # One LU of the interior system, shared by the transport bootstrap's
    # final re-solve, the main solve, and the vortex response columns.
    lu_piv = jax.scipy.linalg.lu_factor(-A[np.ix_(ix, ix)])
    if data.terminal_names:
        g_t = _terminal_stream(data, A, terminal_currents, lu_piv)
        bix = data.boundary_ix
        bs = g_t[bix]
        ha_transport = kernels.boundary_effective_field(
            data.sites,
            data.boundary_centers,
            data.boundary_lengths,
            data.boundary_normals,
            0.5 * (bs + jnp.roll(bs, -1)),
        )
        h = h - ha_transport[ix]
        g0 = g0 + g_t

    rhs = h[:, None]
    if data.vortex_rows:
        unit_cols = jnp.zeros((len(ix), len(data.vortex_rows)), dtype=w.dtype)
        unit_cols = unit_cols.at[np.asarray(data.vortex_rows),
                                 np.arange(len(data.vortex_rows))].set(1.0)
        rhs = jnp.concatenate([rhs, unit_cols], axis=1)
    sol = jax.scipy.linalg.lu_solve(lu_piv, rhs)
    g = g0.at[ix].add(sol[:, 0])
    if data.vortex_rows:
        # Brandt Eq. 28: response columns K = -(-A)^-1 e_j, scaled by
        # vortex_flux * nPhi0 / w_j (reference solve_film.py:541-554).
        scales = vortex_flux * vortex_nphi0 / w[np.asarray(data.vortex_sites)]
        g = g.at[ix].add(-sol[:, 1:] @ scales)

    J = jnp.stack(
        [
            _coo_matvec(data.gy_rows, data.gy_cols, data.gy_vals, g, n),
            -_coo_matvec(data.gx_rows, data.gx_cols, data.gx_vals, g, n),
        ],
        axis=1,
    )
    if data.terminal_names:
        # With a nonzero boundary stream the Q-kernel diagonal
        # regularization is invalid; use the triangle-centroid in-film
        # Biot-Savart instead (reference solve_film.py:558-565).
        m_tri = len(data.tri_areas)
        J_tri = jnp.stack(
            [
                _coo_matvec(data.gty_rows, data.gty_cols, data.gty_vals, g, m_tri),
                -_coo_matvec(data.gtx_rows, data.gtx_cols, data.gtx_vals, g, m_tri),
            ],
            axis=1,
        )
        screening = kernels.biot_savart_within_film(
            data.sites, data.tri_centroids, data.tri_areas, J_tri
        )
    else:
        screening = kernels._dot(data.Q, w * g)
    return g, J, screening


@dataclass
class AdjointModel:
    """A device compiled into a differentiable forward model.

    Build with :func:`build_adjoint_model`; then ``model.forward_fn()``
    returns a pure function of the parameter pytree (suitable for
    ``jax.jit`` / ``jax.grad`` / ``jax.vmap``), and
    ``model.default_params()`` gives a template filled with the device's
    own Lambda profile and zero drives.
    """

    films: Dict[str, FilmAdjointData]
    film_order: Tuple[str, ...]
    hole_to_film: Dict[str, str]
    field_conversion: float
    vortex_flux: float
    field_units: str
    current_units: str
    length_units: str
    dtype: np.dtype = np.dtype("float64")
    vortices: Sequence[Vortex] = field(default_factory=tuple)

    def default_params(self, applied_field=None) -> Dict:
        """Parameter-pytree template.

        Args:
            applied_field: Optional field source (e.g.
                :class:`superscreen_tpu.sources.ConstantField`) sampled at
                each film's sites (in ``field_units``) to fill
                ``params["applied_field"]``; zeros if omitted.

        Returns:
            ``{"Lambda": {film: (n,)}, "applied_field": {film: (n,)},
            "circulating_currents": {hole: ()},
            "vortex_nPhi0": {film: (n_vortices,)},
            "terminal_currents": {film: (n_terminals,)}}`` (the last only
            for films with transport terminals; the entries are ordered
            like ``device.terminals[film]`` and must sum to zero).
        """
        params = {
            "Lambda": {},
            "applied_field": {},
            "circulating_currents": {},
            "vortex_nPhi0": {},
            "terminal_currents": {},
        }
        for name in self.film_order:
            data = self.films[name]
            params["Lambda"][name] = np.asarray(data.default_Lambda)
            if applied_field is None:
                hz = np.zeros(data.n, dtype=self.dtype)
            else:
                sites = np.asarray(data.sites)
                # z as a per-site array: the solver convention every field
                # source is written against (solver/solve.py passes
                # np.full(len(sites), z0)).
                hz = np.broadcast_to(
                    np.asarray(
                        applied_field(
                            sites[:, 0],
                            sites[:, 1],
                            np.full(data.n, data.z0),
                        ),
                        dtype=self.dtype,
                    ),
                    (data.n,),
                ).copy()
            params["applied_field"][name] = hz
            for hole in data.hole_names:
                params["circulating_currents"][hole] = np.zeros(
                    (), dtype=self.dtype
                )
            if data.vortex_rows:
                params["vortex_nPhi0"][name] = np.array(
                    [v.nPhi0 for v in self.vortices if v.film == name],
                    dtype=self.dtype,
                )
            if data.terminal_names:
                # One entry per terminal, ordered like data.terminal_names.
                # They must sum to zero (current conservation).
                params["terminal_currents"][name] = np.zeros(
                    len(data.terminal_names), dtype=self.dtype
                )
        return params

    def forward_fn(self, iterations: int = 0) -> Callable[[Dict], Dict]:
        """A pure function ``params -> {film: fields}``.

        The returned callable runs the initial per-film solve plus
        ``iterations`` rounds of inter-film Biot-Savart coupling, entirely
        traceable (jit/grad/vmap-compatible).  Output fields per film:
        ``stream`` (current units), ``current_density``
        (current/length units), ``self_field`` and
        ``field_from_other_films`` (``field_units``) — matching the
        corresponding :class:`superscreen_tpu.FilmSolution` attributes.
        """
        films = self.films
        order = self.film_order
        conv = self.field_conversion
        vortex_flux = self.vortex_flux
        dtype = self.dtype

        def _round(params, others):
            streams, Js, selfs = {}, {}, {}
            for name in order:
                data = films[name]
                hz = jnp.asarray(params["applied_field"][name], dtype) * conv
                holes = (
                    jnp.stack(
                        [
                            jnp.asarray(
                                params["circulating_currents"][h], dtype
                            )
                            for h in data.hole_names
                        ]
                    )
                    if data.hole_names
                    else jnp.zeros(0, dtype)
                )
                nphi0 = (
                    jnp.asarray(params["vortex_nPhi0"][name], dtype)
                    if data.vortex_rows
                    else jnp.zeros(0, dtype)
                )
                terms = (
                    jnp.asarray(params["terminal_currents"][name], dtype)
                    if data.terminal_names
                    else None
                )
                g, J, screening = _film_forward(
                    data, vortex_flux, params["Lambda"][name], hz,
                    holes, nphi0, others[name], terminal_currents=terms,
                )
                streams[name], Js[name], selfs[name] = g, J, screening
            return streams, Js, selfs

        def forward(params):
            zeros = {
                name: jnp.zeros(films[name].n, dtype) for name in order
            }
            streams, Js, selfs = _round(params, zeros)
            others = zeros
            for _ in range(iterations):
                others = {}
                for target in order:
                    total = jnp.zeros(films[target].n, dtype)
                    for source in order:
                        if source == target:
                            continue
                        src = films[source]
                        dz2 = jnp.asarray(
                            (films[target].z0 - src.z0) ** 2, dtype
                        )
                        total = total + kernels.biot_savart_film_to_film_dz2(
                            src.sites,
                            src.weights,
                            Js[source],
                            films[target].sites,
                            dz2,
                            use_pallas=False,  # keep the AD-friendly jnp path
                        )
                    others[target] = total
                streams, Js, selfs = _round(params, others)
            return {
                name: {
                    "stream": streams[name],
                    "current_density": Js[name],
                    "self_field": selfs[name] / conv,
                    "field_from_other_films": others[name] / conv,
                }
                for name in order
            }

        return forward


def build_adjoint_model(
    device: Device,
    *,
    vortices: Optional[Sequence[Vortex]] = None,
    field_units: str = "mT",
    current_units: str = "mA",
    dtype=None,
) -> AdjointModel:
    """Compiles a meshed :class:`superscreen_tpu.Device` into an
    :class:`AdjointModel` whose forward solve is differentiable.

    Args:
        device: The device (must be meshed).  Films with transport
            terminals get a ``params["terminal_currents"][film]`` vector
            (ordered like ``device.terminals[film]``, must sum to zero).
        vortices: Pinned vortices.  Their positions snap to mesh sites at
            build time (a discrete choice, so positions are not
            differentiable); their ``nPhi0`` values become parameters.
        field_units: Units of ``params["applied_field"]`` and the returned
            fields.
        current_units: Units of circulating currents and streams.
        dtype: Array dtype (defaults to ``device.solve_dtype``; float64
            recommended for gradient work on CPU).

    Returns:
        The :class:`AdjointModel`.
    """
    if not device.meshes:
        raise ValueError(
            "The device does not have a mesh. Call device.make_mesh() to "
            "generate it."
        )
    vortices = tuple(vortices or ())
    dtype = np.dtype(dtype if dtype is not None else device.solve_dtype)
    film_info = make_film_info(
        device=device,
        vortices=list(vortices),
        circulating_currents={},
        terminal_currents={},
    )
    films: Dict[str, FilmAdjointData] = {}
    hole_to_film: Dict[str, str] = {}
    for name, info in film_info.items():
        mesh = device.meshes[name]
        ops = mesh.operators
        n = len(mesh.sites)
        ix = info.interior_indices
        if info.hole_indices:
            ix = np.setdiff1d(
                ix, np.concatenate(list(info.hole_indices.values()))
            )
        hole_names = tuple(info.hole_indices)
        for hole in hole_names:
            hole_to_film[hole] = name
        hole_masks = np.zeros((len(hole_names), n), dtype=dtype)
        for k, hole in enumerate(hole_names):
            hole_masks[k, info.hole_indices[hole]] = 1.0
        # Vortex sites snap to the nearest mesh site (same rule as
        # solve_film); rows index into the interior system.
        vortex_rows, vortex_sites = [], []
        for v in info.vortices:
            sites_ix = mesh.sites[ix]
            row = int(
                np.argmin(np.linalg.norm(sites_ix - (v.x, v.y), axis=1))
            )
            vortex_rows.append(row)
            vortex_sites.append(
                int(np.argmin(np.linalg.norm(mesh.sites - (v.x, v.y), axis=1)))
            )
        # Transport terminals: precompute per-terminal unit boundary
        # streams (the bootstrap is linear in the terminal currents) and
        # the boundary/triangle geometry used inside the trace.
        terminal_kwargs = {}
        if name in device.terminals:
            from .solver.solve_film import boundary_stream_from_indices

            b_ix = np.asarray(info.boundary_indices, dtype=np.int64)
            boundary_points = mesh.sites[b_ix]
            # Per-terminal unit streams through the solver's own boundary
            # walk (single home of the index conventions).
            unit_streams = []
            terminal_names = []
            for terminal in device.terminals[name]:
                unit_streams.append(
                    boundary_stream_from_indices(
                        device, name, b_ix, {terminal.name: 1.0}
                    )
                )
                terminal_names.append(terminal.name)
            centers = 0.5 * (boundary_points + np.roll(boundary_points, -1, axis=0))
            lengths, normals = path_vectors(close_curve(boundary_points))
            gtx, gty = ops.gradient_tri_x, ops.gradient_tri_y
            terminal_kwargs = dict(
                terminal_names=tuple(terminal_names),
                boundary_ix=b_ix,
                fwb=np.asarray(info.interior_indices, dtype=np.int64),
                term_unit_streams=jnp.asarray(np.stack(unit_streams), dtype),
                boundary_centers=jnp.asarray(centers, dtype),
                boundary_lengths=jnp.asarray(lengths, dtype),
                boundary_normals=jnp.asarray(normals, dtype),
                tri_centroids=jnp.asarray(mesh.triangle_centroids, dtype),
                tri_areas=jnp.asarray(mesh.triangle_areas, dtype),
                gtx_rows=jnp.asarray(gtx.rows),
                gtx_cols=jnp.asarray(gtx.cols),
                gtx_vals=jnp.asarray(gtx.vals, dtype),
                gty_rows=jnp.asarray(gty.rows),
                gty_cols=jnp.asarray(gty.cols),
                gty_vals=jnp.asarray(gty.vals, dtype),
            )
        lap = ops.laplacian
        gx, gy = ops.gradient_x, ops.gradient_y
        films[name] = FilmAdjointData(
            name=name,
            n=n,
            hole_names=hole_names,
            vortex_rows=tuple(vortex_rows),
            vortex_sites=tuple(vortex_sites),
            sites=jnp.asarray(mesh.sites, dtype),
            weights=jnp.asarray(ops.weights, dtype),
            Q=jnp.asarray(ops.Q_dense(dtype)),
            lap_rows=jnp.asarray(lap.rows),
            lap_cols=jnp.asarray(lap.cols),
            lap_vals=jnp.asarray(lap.vals, dtype),
            gx_rows=jnp.asarray(gx.rows),
            gx_cols=jnp.asarray(gx.cols),
            gx_vals=jnp.asarray(gx.vals, dtype),
            gy_rows=jnp.asarray(gy.rows),
            gy_cols=jnp.asarray(gy.cols),
            gy_vals=jnp.asarray(gy.vals, dtype),
            interior=np.asarray(ix, dtype=np.int64),
            hole_masks=jnp.asarray(hole_masks),
            z0=float(device.layers[info.layer].z0),
            default_Lambda=jnp.asarray(
                np.asarray(info.lambda_info.Lambda)[:, 0], dtype
            ),
            **terminal_kwargs,
        )
    ureg = device.ureg
    field_conversion = field_conversion_factor(
        field_units,
        current_units,
        length_units=device.length_units,
        ureg=ureg,
    ).magnitude
    vortex_flux = (
        ureg("Phi_0 / mu_0")
        .to(f"{current_units} * {device.length_units}")
        .magnitude
    )
    return AdjointModel(
        films=films,
        film_order=tuple(device.films),
        hole_to_film=hole_to_film,
        field_conversion=float(field_conversion),
        vortex_flux=float(vortex_flux),
        field_units=field_units,
        current_units=current_units,
        length_units=device.length_units,
        dtype=dtype,
        vortices=vortices,
    )
