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

import logging
from typing import Dict, Optional, Sequence, Tuple, Union

import numpy as np

from ..device.device import Device
from ..solution import Solution
from ..solver import FactorizedModel, factorize_model
from ..units import ureg as _global_ureg

logger = logging.getLogger("squids.scanning")


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
    squid_height: float,
    current_units: str,
) -> Dict[str, np.ndarray]:
    """``{sample_film: (B, n)}`` H_z applied by the frozen SQUID currents at
    every scan position, in ``current_units / sample length_units``.

    One blocked device dispatch per (squid film, sample film) pair covers
    all ``B`` positions.
    """
    from ..ops import kernels

    positions = np.atleast_2d(np.asarray(positions, dtype=float))
    B = positions.shape[0]
    dtype = sample_device.solve_dtype
    sheets = _gather_squid_sheets(
        squid_solution, sample_device.length_units, current_units
    )
    out: Dict[str, np.ndarray] = {}
    for film_name, mesh in sample_device.meshes.items():
        z_s = float(sample_device.layers[sample_device.films[film_name].layer].z0)
        sites = np.asarray(mesh.sites, dtype=dtype)
        n = sites.shape[0]
        # Shifting the SQUID by +p equals evaluating at sites - p.
        eval_pts = (sites[None, :, :] - positions[:, None, :]).reshape(B * n, 2)
        eval_pts = eval_pts.astype(dtype)
        H = np.zeros((B * n,), dtype=dtype)
        for sq_sites, sq_areas, sq_J, sq_z0 in sheets:
            dz2 = (squid_height + sq_z0 - z_s) ** 2
            H = H + np.asarray(
                kernels.biot_savart_film_to_film_dz2(
                    sq_sites.astype(dtype),
                    sq_areas.astype(dtype),
                    sq_J.astype(dtype),
                    eval_pts,
                    np.asarray(dz2, dtype=dtype),
                )
            )
        out[film_name] = H.reshape(B, n)
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
    coupling: str = "auto",
    current_units: str = "uA",
    units: str = "Phi_0 / A",
    with_units: bool = False,
    batch_size: Optional[int] = None,
) -> np.ndarray:
    """The sample-response susceptibility map of a scanning SQUID.

    Args:
        sample_device: The meshed sample (or pass ``sample_model``).
        sample_model: A pre-factorized sample model (reused across scans).
        squid_solution: The susceptometer solved standalone with the
            field-coil drive (terminal or circulating currents); its full
            sheet-current distribution is frozen for the scan.
        positions: ``(B, 2)`` lateral positions of the SQUID origin over
            the sample, in sample length units.
        squid_height: Height of the SQUID's ``z = 0`` plane above the
            sample's ``z = 0`` plane (sample length units).
        pickup_loop: Name of a polygon/hole in the SQUID device, or an
            explicit ``(k, 2)`` CCW contour in SQUID coordinates, through
            which the response flux is evaluated.
        I_fc: The field-coil current used when solving ``squid_solution``
            (normalizes the map), e.g. ``"1 mA"``.
        iterations: Self-consistent coupling rounds for multi-film samples.
        coupling: Inter-film coupling operator for the sweep
            (see :func:`superscreen_tpu.solve_many`).
        current_units: Working current units for the sample solve.
        units: Output units (default ``Phi_0 / A``).
        with_units: Return a Quantity array instead of floats.
        batch_size: Optional chunk size over scan positions to bound
            device memory (default: all positions in one sweep).

    Returns:
        ``(B,)`` response mutual inductance ``Phi_pickup / I_fc`` in
        ``units``.  Diamagnetic (superconducting) samples give negative
        values.
    """
    from ..ops import kernels
    from ..sweep import solve_many

    if (sample_device is None) == (sample_model is None):
        raise ValueError(
            "Provide exactly one of sample_device or sample_model."
        )
    if sample_model is None:
        sample_model = factorize_model(
            device=sample_device, current_units=current_units
        )
    device = sample_model.device
    length_units = device.length_units
    dtype = device.solve_dtype

    positions = np.atleast_2d(np.asarray(positions, dtype=float))
    B = positions.shape[0]

    # Pickup-loop contour in SQUID coordinates -> sample length units; the
    # contour rides at its layer's height (or the SQUID z = 0 plane for a
    # bare coordinate array).
    squid = squid_solution.device
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
    contour = _ccw(contour) * lf
    z_pl = squid_height + z_loop

    field_units = f"{current_units} / {length_units}"
    mu0_flux = _global_ureg(f"1 mu_0 * {current_units} * {length_units}")
    I_amp = (
        _global_ureg(I_fc) if isinstance(I_fc, str) else I_fc * _global_ureg("A")
    ).to("A")
    out = np.zeros(B, dtype=float)

    for start in range(0, B, batch_size or B):
        chunk = positions[start : start + (batch_size or B)]
        Bc = chunk.shape[0]
        H = applied_field_maps(
            device,
            squid_solution,
            chunk,
            squid_height=squid_height,
            current_units=current_units,
        )
        result = solve_many(
            model=sample_model,
            applied_field_arrays=H,
            field_units=field_units,
            current_units=current_units,
            iterations=iterations,
            coupling=coupling,
        )
        # Response flux: mu_0 * trapezoid of (A / mu_0) . dl around the
        # shifted contour, summed over sample films.  The contour shifts
        # AND the current distribution differs per position, so vmap the
        # blocked vector-potential kernel over the batch.
        import jax

        pts = (contour[None, :, :] + chunk[:, None, :]).astype(dtype)
        k = contour.shape[0]
        zs = np.full(k, z_pl, dtype=dtype)
        flux = np.zeros(Bc, dtype=float)
        for film_name, mesh in device.meshes.items():
            z_s = float(device.layers[device.films[film_name].layer].z0)
            J = np.asarray(result.current_densities[film_name], dtype=dtype)
            A = np.asarray(
                jax.vmap(
                    lambda p, j: kernels.vector_potential_2d(
                        p,
                        zs,
                        np.asarray(mesh.sites, dtype=dtype),
                        z_s,
                        np.asarray(mesh.vertex_areas, dtype=dtype),
                        j,
                    )
                )(pts, J)
            )  # (Bc, k, 2)
            dl = np.diff(contour, axis=0)  # (k-1, 2)
            A_mid = 0.5 * (A[:, :-1, :] + A[:, 1:, :])
            flux += np.einsum("bkx,kx->b", A_mid, dl)
        # flux is (A/mu_0) . dl in current*length units.
        M = (flux * mu0_flux / I_amp).to(units)
        out[start : start + Bc] = M.magnitude
    if with_units:
        return out * _global_ureg(units)
    return out
