"""Vortex energetics: pinning / entry-barrier landscapes and vortex forces.

The reference package solves for the fields of *pinned* vortices
(``/root/reference/superscreen/solver/solve_film.py:541-554``) but offers no
energetics.  In the linear London model the magnetic free energy of one probe
vortex carrying ``n`` flux quanta at position :math:`r` decomposes exactly as

.. math::

    E(r) = n^2 E_\\mathrm{self}(r) + n\\, E_\\mathrm{int}(r), \\qquad
    E_\\mathrm{self} = \\tfrac{1}{2} \\Phi_0\\, g_\\mathrm{self}(r),\\qquad
    E_\\mathrm{int} = \\Phi_0\\, g_b(r),

where :math:`g_b` is the stream function of the vortex-free *background*
(screening currents of the applied field, circulating hole currents,
transport currents, and any frozen vortices) and :math:`g_\\mathrm{self}` is
the stream the unit probe induces at its own core -- Brandt's response
column evaluated at its source site.  Both are currents, so
:math:`\\Phi_0 g` is an energy.  The force on the vortex is the Lorentz
force of the local sheet current,

.. math::

    F = J_s \\times (n \\Phi_0 \\hat z) = -\\nabla E(r),

which follows from :math:`J = \\nabla\\times(g\\hat z)`.  The landscape
therefore contains the full physics of vortex trapping: the
(mesh-regularized) self-energy falls toward film edges (image attraction)
while Meissner screening currents push anti-aligned probes out and pull
aligned probes in -- their competition is the Bean-Livingston entry
barrier, and a transport bias tilts it asymmetrically.

TPU-first: :math:`E_\\mathrm{self}` over *all* candidate sites is one
batched identity solve against the film's existing factorization (the
response diagonal) -- not a per-site loop -- and :math:`E_\\mathrm{int}`
is a single background solve, so the whole landscape costs one extra
factorized solve.  With an explicit-inverse factorization (the default for
large films on TPU, ``ops/linalg.factor_system``) the diagonal is read off
directly and the landscape is essentially free.  Films in low-memory
(matrix-free CG/BiCGStab) mode are supported too: the diagonal comes from
chunked one-hot probe solves, or -- for very large films -- the
colored-Hutchinson probing estimator
(:func:`superscreen_tpu.ops.linalg.matrix_free_response_diagonal`), whose
per-site error bound is documented there.

Sign conventions were validated against the solver: a ``+1`` vortex has a
positive core stream (counter-clockwise currents, ``+z`` flux), and a
``+z`` applied field drives a negative (diamagnetic) stream, so an aligned
probe is attracted toward the center of a screened film -- vortex trapping.
"""

from dataclasses import dataclass, field
from typing import Dict, Optional, Sequence, Union

import numpy as np

from .device import Device
from .solution import Solution, Vortex
from .units import ureg as _global_ureg

__all__ = ["VortexLandscape", "vortex_energy_landscape"]


def _response_diagonal(
    film_system,
    weights,
    diag_method: str = "auto",
    diag_options: Optional[Dict] = None,
) -> np.ndarray:
    """Per-site response ``g_self`` of a unit-flux probe, for every site of
    the film system: ``d_j = -[(-A)^{-1}]_{jj}`` scaled by ``1 / w_j``.

    Uses the same solve the vortex path of
    :func:`superscreen_tpu.solver.solve_film.solve_film` uses, so the
    landscape is exactly consistent with ``solve(vortices=[...])``.  With an
    explicit-inverse factorization the diagonal is read on device (only
    ``(n,)`` values cross the host link).  Matrix-free (CG/BiCGStab) films
    route to :func:`superscreen_tpu.ops.linalg.matrix_free_response_diagonal`
    -- exact chunked probe solves or the colored-Hutchinson probing
    estimator, selected by ``diag_method``.  The result is
    drive-independent, so it is cached on the film system: sweeps reusing
    one :class:`FactorizedModel` pay for it once.
    """
    from .ops import linalg

    if film_system.lu_piv is None:
        raise ValueError(
            "Film system has no factorization; factorize the model first."
        )
    cache_key = (diag_method, tuple(sorted((diag_options or {}).items())))
    cached = getattr(film_system, "_response_diag", None)
    if cached is not None and cached[0] == cache_key:
        return cached[1]
    lu_piv = film_system.lu_piv
    n = len(film_system.indices)
    if isinstance(lu_piv[0], str) and lu_piv[0] == "cg":
        # Low-memory film: the (n, n) inverse never exists.  Exact chunked
        # one-hot solves for moderate n, colored probing beyond (see
        # linalg.matrix_free_response_diagonal for the error bound).
        diag = -linalg.matrix_free_response_diagonal(
            lu_piv[1], method=diag_method, **(diag_options or {})
        )
    elif isinstance(lu_piv[0], str) and lu_piv[0] == "inv":
        # x = M @ h solves (-A) x = h; the response column is -x.  Take the
        # diagonal on device -- never materialize the (n, n) inverse on host.
        # NOTE: with the default bf16 FACTOR_PRECISION the explicit inverse
        # carries ~1e-3 relative error that normal solves remove by
        # refinement; refining the full diagonal would cost more than the
        # factorization itself, so landscape self-energies on large TPU
        # films inherit that floor.  Set
        # SUPERSCREEN_TPU_FACTOR_PRECISION=float32 before factorizing for
        # ~1e-6-grade landscapes.
        import jax.numpy as jnp

        diag = -np.asarray(jnp.diagonal(lu_piv[1]))[:n]
    elif film_system.A is not None:
        # One batched refined identity solve (LU or Cholesky).
        diag = np.diagonal(
            -linalg.lu_solve_refined(
                film_system.A,
                lu_piv,
                np.eye(n, dtype=np.asarray(weights).dtype),
            )
        ).copy()
    else:
        diag = np.diagonal(
            -linalg.lu_solve(lu_piv, np.eye(n, dtype=np.asarray(weights).dtype))
        ).copy()
    result = diag / np.asarray(weights)[film_system.indices]
    try:
        film_system._response_diag = (cache_key, result)
    except (AttributeError, TypeError):
        pass
    return result


@dataclass(eq=False)
class VortexLandscape:
    """The free-energy landscape of a probe vortex in one film.

    The energy of a probe carrying ``nPhi0`` flux quanta at candidate site
    ``k`` is ``nPhi0**2 * self_energy[k] + nPhi0 * interaction[k]``
    (:meth:`total`).  ``self_energy`` is mesh-regularized: the true London
    core divergence is cut off at the local mesh scale, so *differences*
    across positions are physical down to that scale (use a reasonably
    uniform mesh for landscape work).

    Args:
        film: The film the landscape lives in.
        indices: ``(m,)`` device-mesh site indices of the candidate sites
            (the film system's interior; vortices cannot sit on boundaries
            or in holes).
        sites: ``(m, 2)`` candidate-site coordinates (device length units).
        self_energy: ``(m,)`` self-energy of a unit (``nPhi0 = 1``) probe,
            in ``units``.
        interaction: ``(m,)`` interaction energy of a unit probe with the
            background currents, in ``units``.
        units: Energy units of the stored arrays.
        background: The vortex-free background :class:`Solution`.
        hole_indices: ``{hole_name: site indices}`` of the film's holes
            (the landscape is undefined there).
    """

    film: str
    indices: np.ndarray
    sites: np.ndarray
    self_energy: np.ndarray
    interaction: np.ndarray
    units: str
    background: Solution
    hole_indices: Dict[str, np.ndarray] = field(default_factory=dict)
    _tri_index: object = field(default=None, repr=False)

    def total(self, nPhi0: float = 1.0) -> np.ndarray:
        """``(m,)`` total probe energy for a given winding number (may be
        negative, e.g. ``-1`` for an antivortex)."""
        return nPhi0**2 * self.self_energy + nPhi0 * self.interaction

    def to_hdf5(self, h5group) -> None:
        """Saves the landscape (including its background Solution)."""
        h5group.attrs["film"] = self.film
        h5group.attrs["units"] = self.units
        h5group["indices"] = np.asarray(self.indices)
        h5group["sites"] = np.asarray(self.sites)
        h5group["self_energy"] = np.asarray(self.self_energy)
        h5group["interaction"] = np.asarray(self.interaction)
        holes = h5group.create_group("hole_indices")
        for name, idx in self.hole_indices.items():
            holes[name] = np.asarray(idx)
        self.background.to_hdf5(h5group.create_group("background"))

    @classmethod
    def from_hdf5(cls, h5group) -> "VortexLandscape":
        return cls(
            film=h5group.attrs["film"],
            indices=np.asarray(h5group["indices"]),
            sites=np.asarray(h5group["sites"]),
            self_energy=np.asarray(h5group["self_energy"]),
            interaction=np.asarray(h5group["interaction"]),
            units=h5group.attrs["units"],
            background=Solution.from_hdf5(h5group["background"]),
            hole_indices={
                name: np.asarray(idx)
                for name, idx in h5group["hole_indices"].items()
            },
        )

    def plot(self, nPhi0: float = 1.0, ax=None, cmap="viridis", **kwargs):
        """Tripcolor plot of the total probe energy over the film.

        Returns ``(fig, ax)`` like the package's other plot helpers.
        """
        import matplotlib.pyplot as plt

        if ax is None:
            fig, ax = plt.subplots(constrained_layout=True)
        else:
            fig = ax.get_figure()
        mesh = self.background.device.meshes[self.film]
        E = self.energy_map(nPhi0)
        tri = np.asarray(mesh.elements)
        # Drop triangles touching hole sites (NaN energies).
        keep = np.isfinite(E)[tri].all(axis=1)
        pc = ax.tripcolor(
            np.asarray(mesh.sites)[:, 0],
            np.asarray(mesh.sites)[:, 1],
            E,
            triangles=tri[keep],
            shading="gouraud",
            cmap=cmap,
            **kwargs,
        )
        cb = fig.colorbar(pc, ax=ax)
        cb.set_label(f"probe vortex energy [{self.units}]")
        ax.set_aspect("equal")
        ax.set_xlabel(f"x [{self.background.device.length_units}]")
        ax.set_ylabel(f"y [{self.background.device.length_units}]")
        return fig, ax

    def energy_map(self, nPhi0: float = 1.0) -> np.ndarray:
        """Total energy on ALL mesh sites of the film: 0 on the film
        boundary (a vortex at the edge has left the film), NaN inside
        holes (no film there), :meth:`total` elsewhere.  Useful for
        plotting and as the input to :meth:`force`."""
        mesh = self.background.device.meshes[self.film]
        E = np.zeros(len(mesh.sites), dtype=float)
        for idx in self.hole_indices.values():
            E[idx] = np.nan
        E[self.indices] = self.total(nPhi0)
        return E

    def force(
        self,
        positions: np.ndarray,
        nPhi0: float = 1.0,
        units: str = "pN",
        with_units: bool = False,
    ) -> np.ndarray:
        """Force ``F = -grad E`` on a probe vortex at ``positions``.

        The gradient runs through the mesh vertex-gradient operators and is
        barycentrically interpolated at the query points, so it is exactly
        the Lorentz force ``J_s x (nPhi0 Phi_0 z)`` of the local background
        sheet current plus the image (self-energy gradient) force.

        Args:
            positions: ``(k, 2)`` positions in device length units.
            nPhi0: Probe winding number.
            units: Force units (default pN).
            with_units: Return a Quantity array.

        Returns:
            ``(k, 2)`` forces; NaN for points outside the film or adjacent
            to holes (where the landscape is undefined).
        """
        from .ops import interp as _interp

        device = self.background.device
        mesh = device.meshes[self.film]
        E = self.energy_map(nPhi0)
        # NaN-safe gradient: zero the hole sites for the matvec, then mask
        # every vertex whose stencil touched a hole.
        bad = ~np.isfinite(E)
        E_safe = np.where(bad, 0.0, E)
        ops = mesh.operators
        dEdx = np.asarray(ops.gradient_x.matvec(E_safe))
        dEdy = np.asarray(ops.gradient_y.matvec(E_safe))
        if bad.any():
            touched = np.asarray(
                ops.gradient_x.matvec(bad.astype(float))
            ) != 0.0
            touched |= np.asarray(
                ops.gradient_y.matvec(bad.astype(float))
            ) != 0.0
            dEdx = np.where(touched | bad, np.nan, dEdx)
            dEdy = np.where(touched | bad, np.nan, dEdy)
        if self._tri_index is None:
            self._tri_index = _interp.build_triangle_index(
                np.asarray(mesh.sites, dtype=float),
                np.asarray(mesh.elements),
            )
        positions = np.atleast_2d(np.asarray(positions, dtype=float))
        Fx = -np.asarray(
            _interp.interp_linear(self._tri_index, dEdx, positions)
        )
        Fy = -np.asarray(
            _interp.interp_linear(self._tri_index, dEdy, positions)
        )
        F = np.stack([Fx, Fy], axis=1)
        scale = _global_ureg(
            f"1 {self.units} / {device.length_units}"
        ).to(units)
        out = F * scale.magnitude
        if with_units:
            return out * _global_ureg(units)
        return out


def vortex_energy_landscape(
    device: Optional[Device] = None,
    *,
    model=None,
    film: Optional[str] = None,
    applied_field=None,
    circulating_currents: Optional[Dict[str, Union[float, str]]] = None,
    terminal_currents: Optional[Dict[str, Dict]] = None,
    vortices: Optional[Sequence[Vortex]] = None,
    field_units: str = "mT",
    current_units: str = "mA",
    iterations: int = 0,
    units: str = "eV",
    diag_method: str = "auto",
    diag_options: Optional[Dict] = None,
) -> VortexLandscape:
    """Computes the free-energy landscape of one probe vortex in a film.

    The background (applied field screening, circulating and transport
    currents, and any *frozen* ``vortices``) is solved once; the probe's
    self-energy over every candidate site comes from the response diagonal
    of the film's existing factorization in one batched solve.  Frozen
    vortices contribute their (screened) stream to the interaction term, so
    vortex-vortex forces fall out of the same landscape; their own constant
    self-energies are not included (the landscape is the energy of the
    PROBE, so differences across positions are unaffected).

    For multi-film devices with ``iterations > 0`` the background includes
    inter-film screening; the probe's own coupling to other films is
    neglected (second order in the probe flux).

    Args:
        device: The device (omit if ``model`` is given).
        model: An existing :class:`FactorizedModel` to reuse.  Its frozen
            vortices / currents become part of the background.
        film: The film to scan (defaults to the only film).
        applied_field: Applied field Parameter/callable (default zero).
        circulating_currents: ``{hole_name: current}`` background drives.
        terminal_currents: ``{film_name: {terminal: current}}`` transport
            drives.
        vortices: Frozen vortices contributing to the background.
        field_units: Units of ``applied_field``.
        current_units: Solver current units.
        iterations: Inter-film coupling rounds for the background solve.
        units: Energy units of the landscape (default eV; ``Phi_0 * mA``
            is ~12.9 eV, the natural scale for um-sized films).
        diag_method: How the response diagonal is computed for films in
            low-memory (matrix-free) mode: ``"exact"`` (chunked one-hot
            probe solves), ``"probing"`` (colored-Hutchinson estimator
            with a documented error bound), or ``"auto"``.  Ignored for
            dense factorizations (the diagonal is read off directly).
        diag_options: Extra keyword arguments for
            :func:`superscreen_tpu.ops.linalg.matrix_free_response_diagonal`
            (``separation``, ``repeats``, ``chunk``, ``seed``).

    Returns:
        A :class:`VortexLandscape`.
    """
    from .solver import factorize_model, solve
    from .sources import ConstantField

    if (device is None) == (model is None):
        raise ValueError("Pass exactly one of device or model.")
    if model is None:
        model = factorize_model(
            device=device,
            current_units=current_units,
            circulating_currents=circulating_currents,
            terminal_currents=terminal_currents,
            vortices=vortices,
        )
    elif (
        circulating_currents is not None
        or terminal_currents is not None
        or vortices is not None
    ):
        raise ValueError(
            "Background drives (circulating_currents, terminal_currents, "
            "vortices) must be baked into the model when model= is given."
        )
    device = model.device
    current_units = model.current_units
    film_names = list(device.films)
    if film is None:
        if len(film_names) > 1:
            raise ValueError(
                f"Multiple films {film_names}; pass film=..."
            )
        film = film_names[0]
    if film not in film_names:
        raise KeyError(f"Film {film!r} not in device {device.name!r}.")
    # Compute (and cache) the response diagonal BEFORE paying for the
    # background solve, so bad diag_method/diag_options fail fast.  For
    # matrix-free films this is the expensive step (batched probe solves).
    _response_diagonal(
        model.film_systems[film],
        model.film_info[film].weights,
        diag_method=diag_method,
        diag_options=diag_options,
    )

    if applied_field is None:
        applied_field = ConstantField(0)
    background = solve(
        model=model,
        applied_field=applied_field,
        field_units=field_units,
        iterations=iterations,
        progress_bar=False,
    )[-1]

    film_system = model.film_systems[film]
    info = model.film_info[film]
    indices = np.asarray(film_system.indices)
    mesh = device.meshes[film]
    sites = np.asarray(mesh.sites, dtype=float)[indices]

    # g of a unit probe at its own core, per candidate site (current units).
    vortex_flux = (
        _global_ureg("Phi_0 / mu_0")
        .to(f"{current_units} * {device.length_units}")
        .magnitude
    )
    g_self = vortex_flux * _response_diagonal(
        film_system,
        info.weights,
        diag_method=diag_method,
        diag_options=diag_options,
    )
    g_b = np.asarray(background.film_solutions[film].stream)[indices]

    # E = Phi_0 * g, with g in current units.
    e_unit = _global_ureg(f"1 Phi_0 * {current_units}").to(units).magnitude
    return VortexLandscape(
        film=film,
        indices=indices,
        sites=sites,
        self_energy=0.5 * e_unit * g_self,
        interaction=e_unit * g_b,
        units=units,
        background=background,
        hole_indices=dict(info.hole_indices),
    )
