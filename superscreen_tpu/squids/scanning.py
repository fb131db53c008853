"""Scanning-susceptometry imaging: a SQUID susceptometer rastered over a
sample, computed as ONE batched device computation per scan.

The measured signal in scanning SQUID susceptometry is the change in
pickup-loop flux per unit field-coil current caused by the sample's
screening response.  This module computes that map in the standard
first-order (no back-action) approximation:

1. The susceptometer is solved once on its own (``superscreen_tpu.solve``
   with the field-coil drive); its full sheet-current distribution --
   field coil AND the screening currents it induces in the SQUID body --
   is frozen.
2. For every scan position, the field those currents apply to the sample
   plane is evaluated with the blocked Biot-Savart kernel (one device
   dispatch for all B positions).
3. The sample's screening response for all B positions is solved as one
   batched sweep sharing a single factorization
   (:func:`superscreen_tpu.solve_many`).
4. The response flux threading the pickup loop is read out through the
   line integral ``Phi = mu_0 \\oint (A/mu_0) . dl`` of the sample
   currents' vector potential around the (shifted) pickup-loop contour,
   batched over scan positions.

What is neglected is the sample field re-screening inside the SQUID
(second order in the coupling); this is the same approximation used in
scanning-SQUID modeling workflows built on the reference package (which
has no batched equivalent of this function -- each pixel there is a
separate ``solve`` plus host-side post-processing).

Conventions: the SQUID device keeps its own coordinate frame; its
``z = 0`` plane is placed ``squid_height`` above the sample's ``z = 0``
plane, and its lateral origin is rastered over ``positions`` (in sample
length units).  Only squared layer separations enter, so the sign of
``squid_height`` is irrelevant.
"""

from typing import Dict, Optional, Sequence, Tuple, Union

import numpy as np

from ..device.device import Device
from ..solution import Solution
from ..solver import FactorizedModel, factorize_model
from ..units import ureg as _global_ureg


def _ccw(points: np.ndarray) -> np.ndarray:
    """Closed CCW copy of a polygonal contour."""
    pts = np.asarray(points, dtype=float)
    if not np.allclose(pts[0], pts[-1]):
        pts = np.concatenate([pts, pts[:1]], axis=0)
    x, y = pts[:, 0], pts[:, 1]
    area2 = np.sum(x[:-1] * y[1:] - x[1:] * y[:-1])
    if area2 < 0:
        pts = pts[::-1]
    return pts


def _length_factor(from_units: str, to_units: str) -> float:
    return float(_global_ureg(f"1 {from_units}").to(to_units).magnitude)


def _contour_flux(dev, Js, eval_pts, eval_z, dtype):
    """Trapezoid-rule ``sum_films`` of ``(A / mu_0) . dl`` around per-batch
    contours: ``eval_pts`` is ``(Bc, k, 2)``; ``Js[film]`` is ``(Bc, n, 2)``
    (currents varying with the batch) or ``(n, 2)`` (one fixed current
    distribution evaluated on every contour); ``eval_z`` is a scalar or
    per-position ``(Bc,)`` heights."""
    import jax

    from ..ops import kernels

    Bc, k = eval_pts.shape[0], eval_pts.shape[1]
    zs = np.broadcast_to(
        np.asarray(eval_z, dtype=dtype).reshape(-1, 1), (Bc, k)
    )
    zs = np.ascontiguousarray(zs)
    dl = np.diff(eval_pts, axis=1)  # (Bc, k-1, 2)
    total = np.zeros(Bc, dtype=float)
    for film_name, mesh in dev.meshes.items():
        z_s = float(dev.layers[dev.films[film_name].layer].z0)
        sites = np.asarray(mesh.sites, dtype=dtype)
        areas = np.asarray(mesh.vertex_areas, dtype=dtype)
        J = np.asarray(Js[film_name], dtype=dtype)
        in_axes = (0, 0, None if J.ndim == 2 else 0)
        A = np.asarray(
            jax.vmap(
                lambda p, z, j: kernels.vector_potential_2d(
                    p, z, sites, z_s, areas, j
                ),
                in_axes=in_axes,
            )(eval_pts, zs, J)
        )  # (Bc, k, 2)
        A_mid = 0.5 * (A[:, :-1, :] + A[:, 1:, :])
        total += np.einsum("bkx,bkx->b", A_mid, dl)
    return total


def _resolve_heights(squid_height, B: int, dtype=float) -> np.ndarray:
    """Validates a scalar-or-``(B,)`` scan-height spec and returns it as an
    array (0-d for a scalar)."""
    heights = np.asarray(squid_height, dtype=dtype)
    if heights.ndim not in (0, 1) or (
        heights.ndim == 1 and heights.shape != (B,)
    ):
        raise ValueError(
            f"squid_height must be a scalar or shape ({B},), got "
            f"{np.shape(squid_height)}."
        )
    return heights


def _pickup_contour(squid, pickup_loop, length_units):
    """Resolve a pickup-loop spec to a closed CCW contour in ``length_units``
    plus the loop's layer height (0 for a bare coordinate array)."""
    lf = _length_factor(squid.length_units, length_units)
    z_loop = 0.0
    if isinstance(pickup_loop, str):
        for group in (squid.holes, squid.films, squid.abstract_regions):
            if pickup_loop in group:
                poly = group[pickup_loop]
                contour = poly.points
                if poly.layer is not None:
                    z_loop = float(squid.layers[poly.layer].z0) * lf
                break
        else:
            raise KeyError(
                f"Polygon {pickup_loop!r} not found in SQUID device "
                f"{squid.name!r}."
            )
    else:
        contour = np.asarray(pickup_loop, dtype=float)
    return _ccw(contour) * lf, z_loop


def _gather_squid_sheets(
    squid_solution: Solution,
    length_units: str,
    current_units: str,
) -> Sequence[Tuple[np.ndarray, np.ndarray, np.ndarray, float]]:
    """Per-film ``(sites, weighted-areas, J, z0)`` of the frozen SQUID
    currents, converted into the scan's length/current units."""
    squid = squid_solution.device
    lf = _length_factor(squid.length_units, length_units)
    # J carries current/length: scale by (current factor) / (length factor).
    cf = float(
        _global_ureg(f"1 {squid_solution.current_units}")
        .to(current_units)
        .magnitude
    )
    sheets = []
    for name, film in squid.films.items():
        mesh = squid.meshes[name]
        layer = squid.layers[film.layer]
        J = np.asarray(squid_solution.film_solutions[name].current_density)
        sheets.append(
            (
                np.asarray(mesh.sites) * lf,
                np.asarray(mesh.vertex_areas) * lf**2,
                J * (cf / lf),
                float(layer.z0) * lf,
            )
        )
    return sheets


def applied_field_maps(
    sample_device: Device,
    squid_solution: Solution,
    positions: np.ndarray,
    *,
    squid_height: Union[float, np.ndarray],
    current_units: str,
) -> Dict[str, "jax.Array"]:
    """``{sample_film: (B, n)}`` H_z applied by the frozen SQUID currents at
    every scan position, in ``current_units / sample length_units``
    (device-resident arrays; ``solve_many`` consumes them without a host
    round-trip -- ``np.asarray`` materializes if needed).

    ``squid_height`` may be a scalar (constant-height raster: one blocked
    device dispatch per (squid film, sample film) pair covers all ``B``
    positions) or a ``(B,)`` array (approach curves / tilted scan planes:
    the dispatch is vmapped over the per-position layer separation).
    """
    import jax

    from ..ops import kernels

    positions = np.atleast_2d(np.asarray(positions, dtype=float))
    B = positions.shape[0]
    dtype = sample_device.solve_dtype
    heights = _resolve_heights(squid_height, B, dtype)
    sheets = _gather_squid_sheets(
        squid_solution, sample_device.length_units, current_units
    )
    import jax.numpy as jnp

    out: Dict[str, "jax.Array"] = {}
    for film_name, mesh in sample_device.meshes.items():
        z_s = float(sample_device.layers[sample_device.films[film_name].layer].z0)
        sites = np.asarray(mesh.sites, dtype=dtype)
        n = sites.shape[0]
        # Shifting the SQUID by +p equals evaluating at sites - p.
        eval_pts = (sites[None, :, :] - positions[:, None, :]).astype(dtype)
        # Accumulated ON DEVICE and returned as a device array:
        # solve_many consumes it directly, so materializing to host here
        # would cost a device->host round-trip per (squid sheet, sample
        # film) pair just to re-upload for the solve.
        H = jnp.zeros((B, n), dtype=dtype)
        for sq_sites, sq_areas, sq_J, sq_z0 in sheets:
            dz2 = ((heights + sq_z0 - z_s) ** 2).astype(dtype)
            args = (
                sq_sites.astype(dtype),
                sq_areas.astype(dtype),
                sq_J.astype(dtype),
            )
            if heights.ndim == 0:
                contrib = kernels.biot_savart_film_to_film_dz2(
                    *args, eval_pts.reshape(B * n, 2), dz2
                ).reshape(B, n)
            else:
                contrib = jax.vmap(
                    lambda p, d2: kernels.biot_savart_film_to_film_dz2(
                        *args, p, d2
                    )
                )(eval_pts, dz2)
            H = H + contrib
        out[film_name] = H
    return out


def susceptibility_scan(
    sample_device: Optional[Device] = None,
    *,
    sample_model: Optional[FactorizedModel] = None,
    squid_solution: Solution,
    positions: np.ndarray,
    squid_height: float,
    pickup_loop: Union[str, np.ndarray],
    I_fc: Union[str, float],
    iterations: int = 0,
    back_action: int = 0,
    coupling: str = "auto",
    current_units: str = "uA",
    units: str = "Phi_0 / A",
    with_units: bool = False,
    batch_size: Optional[int] = None,
    sharding=None,
) -> np.ndarray:
    """The sample-response susceptibility map of a scanning SQUID.

    Args:
        sample_device: The meshed sample (or pass ``sample_model``).
        sample_model: A pre-factorized sample model (reused across scans).
        squid_solution: The susceptometer solved standalone with the
            field-coil drive (terminal or circulating currents); its full
            sheet-current distribution is frozen for the scan (refined
            per position if ``back_action > 0``).
        positions: ``(B, 2)`` lateral positions of the SQUID origin over
            the sample, in sample length units.
        squid_height: Height of the SQUID's ``z = 0`` plane above the
            sample's ``z = 0`` plane (sample length units).  A scalar for
            constant-height rasters, or a ``(B,)`` array for per-position
            heights (approach curves, tilted scan planes).
        pickup_loop: Name of a polygon/hole in the SQUID device, or an
            explicit ``(k, 2)`` CCW contour in SQUID coordinates, through
            which the response flux is evaluated.
        I_fc: The field-coil current used when solving ``squid_solution``
            (normalizes the map): a string with units (e.g. ``"1 mA"``)
            or a plain float **in amperes**.
        iterations: Self-consistent coupling rounds for multi-film samples.
        back_action: Rounds of SQUID <-> sample self-consistency.  ``0``
            (default) is the standard first-order scan: the SQUID current
            distribution is frozen.  Each round re-solves the SQUID (all
            positions in one batched sweep, reusing one factorization of
            the SQUID with its drive) under the sample's response field,
            then re-solves the sample -- converging to the exact coupled
            SQUID+sample linear system per pixel, which no per-pixel
            workflow on the reference package models.  Requires the SQUID
            and sample devices to share length units.
        coupling: Inter-film coupling operator for the sweep
            (see :func:`superscreen_tpu.solve_many`).
        current_units: Working current units for the sample solve.
            Ignored when ``sample_model`` is given -- the model's own
            factorization units are used throughout.
        units: Output units (default ``Phi_0 / A``).
        with_units: Return a Quantity array instead of floats.
        batch_size: Optional chunk size over scan positions to bound
            device memory (default: all positions in one sweep).
        sharding: Optional ``jax.sharding.Sharding`` for the scan batch
            axis, passed through to every batched solve (shard a big
            raster across a device mesh).

    Returns:
        ``(B,)`` response mutual inductance ``Phi_pickup / I_fc`` in
        ``units``: the pickup-loop flux change caused by the sample
        (including, for ``back_action > 0``, the flux change from the
        SQUID's own re-screened currents).  Diamagnetic (superconducting)
        samples give negative values.
    """
    from ..sweep import solve_many

    if (sample_device is None) == (sample_model is None):
        raise ValueError(
            "Provide exactly one of sample_device or sample_model."
        )
    if sample_model is None:
        sample_model = factorize_model(
            device=sample_device, current_units=current_units
        )
    else:
        # solve_many always works in the model's factorization units; keep
        # the flux normalization consistent with them.
        current_units = sample_model.current_units
    device = sample_model.device
    length_units = device.length_units
    dtype = device.solve_dtype
    if batch_size is not None and batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}.")

    positions = np.atleast_2d(np.asarray(positions, dtype=float))
    B = positions.shape[0]

    # Pickup-loop contour in SQUID coordinates -> sample length units; the
    # contour rides at its layer's height (or the SQUID z = 0 plane for a
    # bare coordinate array).
    squid = squid_solution.device
    contour, z_loop = _pickup_contour(squid, pickup_loop, length_units)
    heights = _resolve_heights(squid_height, B)
    z_pl = heights + z_loop  # scalar or (B,)

    field_units = f"{current_units} / {length_units}"
    mu0_flux = _global_ureg(f"1 mu_0 * {current_units} * {length_units}")
    I_amp = (
        _global_ureg(I_fc) if isinstance(I_fc, str) else I_fc * _global_ureg("A")
    ).to("A")
    out = np.zeros(B, dtype=float)

    squid_model = None
    squid_base_J = None
    if back_action > 0:
        if squid.length_units != length_units:
            raise ValueError(
                "back_action > 0 requires the SQUID and sample devices to "
                f"share length units (got {squid.length_units!r} vs "
                f"{length_units!r})."
            )
        squid_model, squid_base_J = _factorize_squid(
            squid_solution, current_units, field_units, coupling, iterations
        )

    for start in range(0, B, batch_size or B):
        chunk = positions[start : start + (batch_size or B)]
        Bc = chunk.shape[0]
        h_chunk = heights if heights.ndim == 0 else heights[start : start + Bc]
        z_chunk = z_pl if np.ndim(z_pl) == 0 else z_pl[start : start + Bc]
        H = applied_field_maps(
            device,
            squid_solution,
            chunk,
            squid_height=h_chunk,
            current_units=current_units,
        )
        result = solve_many(
            model=sample_model,
            applied_field_arrays=H,
            field_units=field_units,
            current_units=current_units,
            iterations=iterations,
            coupling=coupling,
            sharding=sharding,
        )
        squid_J = None
        for _ in range(back_action):
            # Field of the sample's currents at the (shifted) SQUID sites,
            # then a batched re-solve of the driven SQUID under it.
            H_squid = _cross_field_maps(
                src_dev=device,
                src_Js={
                    name: np.asarray(result.current_densities[name])
                    for name in device.meshes
                },
                dst_dev=squid,
                dst_z_offset=h_chunk,
                shifts=chunk,
                dtype=dtype,
            )
            squid_result = solve_many(
                model=squid_model,
                applied_field_arrays=H_squid,
                field_units=field_units,
                current_units=current_units,
                iterations=iterations,
                coupling=coupling,
                sharding=sharding,
            )
            squid_J = {
                name: np.asarray(squid_result.current_densities[name])
                for name in squid.meshes
            }
            # Field of the re-screened SQUID currents back on the sample.
            H_sample = _cross_field_maps(
                src_dev=squid,
                src_Js=squid_J,
                dst_dev=device,
                dst_z_offset=-h_chunk,
                shifts=-chunk,
                dtype=dtype,
            )
            result = solve_many(
                model=sample_model,
                applied_field_arrays=H_sample,
                field_units=field_units,
                current_units=current_units,
                iterations=iterations,
                coupling=coupling,
                sharding=sharding,
            )

        # Sample-current flux through the (shifted) pickup contour.
        pts = (contour[None, :, :] + chunk[:, None, :]).astype(dtype)
        flux = _contour_flux(
            device,
            {n: result.current_densities[n] for n in device.meshes},
            pts,
            z_chunk,
            dtype,
        )
        if squid_J is not None:
            # Flux change from the SQUID's own re-screened currents; the
            # contour rides with the SQUID, so this evaluates in the SQUID
            # frame with a fixed contour.
            dJ = {
                name: squid_J[name] - squid_base_J[name][None]
                for name in squid_J
            }
            pts_sq = np.broadcast_to(
                contour.astype(dtype)[None], (Bc,) + contour.shape
            )
            flux = flux + _contour_flux(
                squid, dJ, np.ascontiguousarray(pts_sq), z_loop, dtype
            )
        # flux is (A/mu_0) . dl in current*length units.
        M = (flux * mu0_flux / I_amp).to(units)
        out[start : start + Bc] = M.magnitude
    if with_units:
        return out * _global_ureg(units)
    return out


def magnetometry_scan(
    sample_solution: Solution,
    *,
    positions: np.ndarray,
    squid_height: Union[float, np.ndarray],
    pickup_loop: Union[str, np.ndarray],
    squid_device: Optional[Device] = None,
    screening: bool = False,
    iterations: int = 0,
    coupling: str = "auto",
    units: str = "Phi_0",
    with_units: bool = False,
    batch_size: Optional[int] = None,
    sharding=None,
) -> np.ndarray:
    """Scanning-SQUID **magnetometry** image of a solved sample.

    Where :func:`susceptibility_scan` images the sample's *response* to the
    field coil, magnetometry images the static field of the sample's own
    sheet currents -- trapped (Pearl) vortices, circulating hole currents,
    transport currents, and the screening currents of whatever applied
    field the sample was solved under.  The readout is the flux threading
    the pickup loop at every scan position, computed as the line integral
    ``Phi = mu_0 \\oint (A / mu_0) . dl`` of the sample currents' vector
    potential around the shifted contour -- ONE batched device dispatch per
    (film, chunk), not a per-pixel loop.

    With ``screening=True`` the superconducting SQUID body is not a passive
    loop: its screening response to the sample's field is solved for every
    position in one batched sweep (reusing a single factorization of the
    undriven SQUID), and the flux of those screening currents through the
    pickup loop is added.  This applies the SQUID's realistic point-spread
    function to the image, which per-pixel workflows on the reference
    package (reference ``docs/notebooks/scanning-squid.ipynb``) must
    rebuild one ``solve`` at a time.

    Args:
        sample_solution: The solved sample whose currents are imaged.
        positions: ``(B, 2)`` lateral positions of the SQUID origin over
            the sample, in sample length units.
        squid_height: Height of the SQUID's ``z = 0`` plane above the
            sample's (sample length units); scalar or ``(B,)``.
        pickup_loop: Polygon/hole name in ``squid_device``, or an explicit
            ``(k, 2)`` contour.  A named loop is resolved in SQUID
            coordinates (converted to sample length units, riding at its
            layer height); an explicit contour with no ``squid_device`` is
            interpreted directly in sample length units at the SQUID's
            ``z = 0`` plane.
        squid_device: The meshed SQUID device.  Required to resolve a
            named ``pickup_loop`` and for ``screening=True``.
        screening: Solve and include the SQUID body's screening response
            (requires ``squid_device`` sharing the sample's length units).
        iterations: Inter-film coupling rounds for the (multi-film) SQUID
            screening solve.
        coupling: Coupling operator for the screening sweep.
        units: Output flux units (default ``Phi_0``).
        with_units: Return a Quantity array instead of floats.
        batch_size: Optional chunk size over scan positions.
        sharding: Optional ``jax.sharding.Sharding`` for the batch axis of
            the screening sweep.

    Returns:
        ``(B,)`` pickup-loop flux in ``units``.
    """
    from ..sweep import solve_many

    device = sample_solution.device
    length_units = device.length_units
    current_units = sample_solution.current_units
    dtype = device.solve_dtype
    if batch_size is not None and batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}.")
    if screening and squid_device is None:
        raise ValueError("screening=True requires squid_device.")
    if isinstance(pickup_loop, str) and squid_device is None:
        raise ValueError(
            "A named pickup_loop requires squid_device; otherwise pass an "
            "explicit (k, 2) contour in sample length units."
        )

    positions = np.atleast_2d(np.asarray(positions, dtype=float))
    B = positions.shape[0]
    if squid_device is not None:
        contour, z_loop = _pickup_contour(
            squid_device, pickup_loop, length_units
        )
    else:
        contour, z_loop = _ccw(np.asarray(pickup_loop, dtype=float)), 0.0
    heights = _resolve_heights(squid_height, B)
    z_pl = heights + z_loop  # scalar or (B,)

    sample_J = {
        name: np.asarray(sample_solution.film_solutions[name].current_density)
        for name in device.meshes
    }
    field_units = f"{current_units} / {length_units}"
    mu0_flux = _global_ureg(f"1 mu_0 * {current_units} * {length_units}")

    squid_model = None
    if screening:
        if squid_device.length_units != length_units:
            raise ValueError(
                "screening=True requires the SQUID and sample devices to "
                f"share length units (got {squid_device.length_units!r} vs "
                f"{length_units!r})."
            )
        squid_model = factorize_model(
            device=squid_device, current_units=current_units
        )

    out = np.zeros(B, dtype=float)
    for start in range(0, B, batch_size or B):
        chunk = positions[start : start + (batch_size or B)]
        Bc = chunk.shape[0]
        h_chunk = heights if heights.ndim == 0 else heights[start : start + Bc]
        z_chunk = z_pl if np.ndim(z_pl) == 0 else z_pl[start : start + Bc]

        # Sample-current flux through the shifted contour.
        pts = (contour[None, :, :] + chunk[:, None, :]).astype(dtype)
        flux = _contour_flux(device, sample_J, pts, z_chunk, dtype)

        if screening:
            # Sample field at the shifted SQUID sites -> one batched
            # screening solve of the undriven SQUID -> its currents' flux
            # through the loop (fixed contour in the SQUID frame).
            H_squid = _cross_field_maps(
                src_dev=device,
                src_Js=sample_J,
                dst_dev=squid_device,
                dst_z_offset=h_chunk,
                shifts=chunk,
                dtype=dtype,
            )
            squid_result = solve_many(
                model=squid_model,
                applied_field_arrays=H_squid,
                field_units=field_units,
                current_units=current_units,
                iterations=iterations,
                coupling=coupling,
                sharding=sharding,
            )
            squid_J = {
                name: np.asarray(squid_result.current_densities[name])
                for name in squid_device.meshes
            }
            pts_sq = np.broadcast_to(
                contour.astype(dtype)[None], (Bc,) + contour.shape
            )
            flux = flux + _contour_flux(
                squid_device, squid_J, np.ascontiguousarray(pts_sq),
                z_loop, dtype,
            )

        Phi = (flux * mu0_flux).to(units)
        out[start : start + Bc] = Phi.magnitude
    if with_units:
        return out * _global_ureg(units)
    return out


def build_scan_forward(
    sample_device: Device,
    squid_solution: Solution,
    positions: np.ndarray,
    *,
    squid_height: Union[float, np.ndarray],
    pickup_loop: Union[str, np.ndarray],
    I_fc: Union[str, float],
    iterations: int = 0,
    current_units: str = "mA",
    units: str = "Phi_0 / A",
    dtype=None,
):
    """A **differentiable** susceptibility-scan forward model.

    Wraps :func:`superscreen_tpu.build_adjoint_model` with the scanning
    geometry: the probe's applied-field maps and the pickup-loop readout
    are precomputed (they are parameter-independent geometry), and the
    returned function maps the adjoint parameter pytree to the ``(B,)``
    susceptibility map in ``units`` -- fully ``jax.jit`` / ``jax.grad`` /
    ``jax.vmap``-compatible.  Gradients flow to the sample's per-site
    ``Lambda``, circulating currents, vortex amplitudes, and terminal
    currents, enabling reconstruction of sample properties directly from
    measured susceptibility *images*.

    The scan is first-order (frozen probe currents), matching
    :func:`susceptibility_scan` with ``back_action=0`` -- the two agree
    to solver precision for the same inputs.

    Args:
        sample_device: The meshed sample.
        squid_solution: The susceptometer solved standalone with its
            field-coil drive.
        positions: ``(B, 2)`` scan positions (sample length units).
        squid_height: Scalar or ``(B,)`` probe heights.
        pickup_loop: Polygon name in the SQUID device or ``(k, 2)``
            contour (SQUID coordinates).
        I_fc: The field-coil drive used for ``squid_solution`` (string
            with units, or a float in amperes).
        iterations: Inter-film coupling rounds for multi-film samples.
        current_units: Working current units of the adjoint model.
        units: Units of the returned map.
        dtype: Adjoint model dtype (default: the device's solve dtype).

    Returns:
        ``(adjoint_model, scan_fn)`` where ``scan_fn(params) -> (B,)``;
        get/edit ``params`` via ``adjoint_model.default_params()`` (its
        ``"applied_field"`` entry is ignored -- the probe's field is part
        of the scan geometry).
    """
    import jax
    import jax.numpy as jnp

    from ..adjoint import build_adjoint_model

    device = sample_device
    length_units = device.length_units
    field_units = f"{current_units} / {length_units}"
    model = build_adjoint_model(
        device, field_units=field_units, current_units=current_units,
        dtype=dtype,
    )
    positions = np.atleast_2d(np.asarray(positions, dtype=float))
    B = positions.shape[0]

    # Probe geometry (parameter-independent): applied maps + readout.
    H_maps = applied_field_maps(
        device,
        squid_solution,
        positions,
        squid_height=squid_height,
        current_units=current_units,
    )
    H_maps = {k: jnp.asarray(v, model.dtype) for k, v in H_maps.items()}

    squid = squid_solution.device
    contour, z_loop = _pickup_contour(squid, pickup_loop, length_units)
    heights = np.broadcast_to(np.asarray(squid_height, dtype=float), (B,))
    z_pl = heights + z_loop

    # Per-vertex trapezoid weights of the closed contour: the flux
    # Phi = sum_k 0.5 (A_k + A_{k+1}) . dl_k equals sum_k A_k . u_k with
    # u_k = 0.5 (dl_{k-1} + dl_k) (cyclic; the duplicated closing vertex
    # is dropped).
    dl = np.diff(contour, axis=0)  # (k, 2)
    u = 0.5 * (dl + np.roll(dl, 1, axis=0))  # (k, 2)
    verts = contour[:-1]  # (k, 2)

    # Readout tensors: Phi_b = sum_i R_b[i] . J_b[i] per film, with
    # R_b[i] = w_i / (4 pi) * sum_k u_k / r(c_bk, site_i).
    R = {}
    for name, mesh in device.meshes.items():
        z_s = float(device.layers[device.films[name].layer].z0)
        sites = np.asarray(mesh.sites)
        w = np.asarray(mesh.vertex_areas)
        pts = verts[None, :, :] + positions[:, None, :]  # (B, k, 2)
        d2 = (
            (pts[:, :, None, 0] - sites[None, None, :, 0]) ** 2
            + (pts[:, :, None, 1] - sites[None, None, :, 1]) ** 2
            + ((z_pl - z_s) ** 2)[:, None, None]
        )  # (B, k, n)
        kern = 1.0 / (4 * np.pi * np.sqrt(d2))
        R[name] = jnp.asarray(
            np.einsum("bkn,kx->bnx", kern, u) * w[None, :, None],
            model.dtype,
        )  # (B, n, 2)

    I_amp = (
        _global_ureg(I_fc) if isinstance(I_fc, str) else I_fc * _global_ureg("A")
    ).to("A")
    factor = float(
        (_global_ureg(f"1 mu_0 * {current_units} * {length_units}") / I_amp)
        .to(units)
        .magnitude
    )
    fwd = model.forward_fn(iterations)
    order = model.film_order

    def scan_fn(params):
        def one(applied_b, R_b):
            out = fwd({**params, "applied_field": applied_b})
            flux = 0.0
            for name in order:
                flux = flux + jnp.sum(R_b[name] * out[name]["current_density"])
            return flux

        return factor * jax.vmap(one)(H_maps, R)

    return model, scan_fn


def _factorize_squid(squid_solution, current_units, field_units, coupling, iterations):
    """Factorize the SQUID with its drive (converted to ``current_units``)
    and solve its zero-applied-field base state through the same batched
    path used in the back-action rounds."""
    from ..sweep import solve_many

    squid = squid_solution.device
    cf = float(
        _global_ureg(f"1 {squid_solution.current_units}")
        .to(current_units)
        .magnitude
    )
    circulating = {
        k: v * cf for k, v in (squid_solution.circulating_currents or {}).items()
    }
    terminal = {
        film: {t: v * cf for t, v in d.items()}
        for film, d in (squid_solution.terminal_currents or {}).items()
    }
    model = factorize_model(
        device=squid,
        current_units=current_units,
        terminal_currents=terminal or None,
        circulating_currents=circulating or None,
        vortices=list(squid_solution.vortices or []) or None,
    )
    zeros = {
        name: np.zeros((1, len(mesh.sites)), dtype=squid.solve_dtype)
        for name, mesh in squid.meshes.items()
    }
    base = solve_many(
        model=model,
        applied_field_arrays=zeros,
        field_units=field_units,
        current_units=current_units,
        iterations=iterations,
        coupling=coupling,
    )
    base_J = {
        name: np.asarray(base.current_densities[name])[0]
        for name in squid.meshes
    }
    return model, base_J


def _cross_field_maps(
    *,
    src_dev,
    src_Js,
    dst_dev,
    dst_z_offset,
    shifts,
    dtype,
):
    """``{dst_film: (B, n_dst)}`` H_z at the destination device's sites from
    the source currents, with the destination laterally shifted by
    ``shifts[b]`` relative to the source frame.

    ``src_Js[film]`` is ``(B, n_src, 2)`` (per-position currents) or
    ``(n_src, 2)`` (one fixed distribution seen from every shift).
    ``dst_z_offset`` is the height of the destination device's ``z = 0``
    plane above the source device's (scalar or per-position ``(B,)``).
    Both devices must share length units.
    """
    import jax

    from ..ops import kernels

    shifts = np.asarray(shifts, dtype=dtype)
    B = shifts.shape[0]
    z_off = np.broadcast_to(np.asarray(dst_z_offset, dtype=dtype), (B,))
    out = {}
    for dst_name, dst_mesh in dst_dev.meshes.items():
        z_dst = z_off + float(
            dst_dev.layers[dst_dev.films[dst_name].layer].z0
        )
        dst_sites = np.asarray(dst_mesh.sites, dtype=dtype)
        eval_pts = (
            dst_sites[None, :, :] + shifts[:, None, :]
        ).astype(dtype)
        H = None
        for src_name, src_mesh in src_dev.meshes.items():
            z_src = float(src_dev.layers[src_dev.films[src_name].layer].z0)
            dz2 = np.ascontiguousarray((z_dst - z_src) ** 2, dtype=dtype)
            sites = np.asarray(src_mesh.sites, dtype=dtype)
            areas = np.asarray(src_mesh.vertex_areas, dtype=dtype)
            J = np.asarray(src_Js[src_name], dtype=dtype)
            contrib = np.asarray(
                jax.vmap(
                    lambda p, j, d2: kernels.biot_savart_film_to_film_dz2(
                        sites, areas, j, p, d2
                    ),
                    in_axes=(0, None if J.ndim == 2 else 0, 0),
                )(eval_pts, J, dz2)
            )
            H = contrib if H is None else H + contrib
        out[dst_name] = H
    return out
