"""Dipole field sources (reference: ``superscreen/sources/dipole.py``).

The dipole-distribution sum is vectorized over dipoles (the reference loops
over them in Python, ``sources/dipole.py:400-403``).
"""

from typing import Optional, Tuple, Union

import numpy as np

from ..parameter import Parameter
from ..units import ureg

__all__ = ["dipole_field", "dipole_distribution", "DipoleField"]

_MU_0 = 1.25663706212e-06


def dipole_field(
    eval_coords: np.ndarray,
    r0: Union[np.ndarray, Tuple[float, float, float]] = (0, 0, 0),
    moment: Union[np.ndarray, Tuple[float, float, float]] = (0, 0, 0),
) -> np.ndarray:
    """3D field (tesla) of a single dipole with ``moment`` [A m^2] at ``r0``
    [m], evaluated at ``eval_coords`` [m]."""
    moment, r0 = np.atleast_1d(moment, r0)
    r = np.atleast_2d(eval_coords).reshape((-1, 3))
    r = r - r0
    norm_r = np.sqrt(np.einsum("ij, ij -> i", r, r))[:, np.newaxis]
    m_dot_r = np.einsum("j, ij -> i", moment, r)[:, np.newaxis]
    B = 3 * r * m_dot_r / norm_r**5 - moment / norm_r**3
    return _MU_0 / (4 * np.pi) * B.squeeze()


def dipole_distribution(
    x: Union[float, np.ndarray],
    y: Union[float, np.ndarray],
    z: Union[float, np.ndarray],
    *,
    dipole_positions: np.ndarray,
    dipole_moments: Union[np.ndarray, Tuple[float, float, float]],
    component: Optional[str] = None,
    length_units: str = "um",
    moment_units: str = "mu_B",
) -> np.ndarray:
    """Field (tesla) from a distribution of dipoles, evaluated at
    ``(x, y, z)``.

    Args:
        x, y, z: Evaluation coordinates in ``length_units``.
        dipole_positions: ``(m, 3)`` dipole positions in ``length_units``.
        dipole_moments: ``(m, 3)`` or single ``(3,)`` moment in
            ``moment_units``.
        component: "x", "y", "z", or None for the full vector field.
        length_units: Units of all coordinates.
        moment_units: Units of the moments (e.g. "mu_B").
    """
    index = Ellipsis if component is None else list("xyz").index(component)
    to_meter = ureg(length_units).to("m").magnitude
    dipole_moments = (
        np.asarray(dipole_moments) * ureg(moment_units).to("A * m ** 2").magnitude
    )
    dipole_positions = np.asarray(dipole_positions) * to_meter
    x, y, z = np.atleast_1d(x, y, z)
    x = x * to_meter
    y = y * to_meter
    z = z * to_meter
    if len(z) == 1:
        z = z * np.ones_like(x)
    eval_coords = np.stack([x, y, z], axis=1)
    dipole_positions, dipole_moments = np.atleast_2d(
        dipole_positions, dipole_moments
    )
    m = dipole_positions.shape[0]
    if dipole_moments.shape[0] == 1:
        dipole_moments = np.broadcast_to(dipole_moments, (m, 3))
    elif dipole_moments.shape[0] != m:
        raise ValueError(
            f"The number of dipole moments ({dipole_moments.shape[0]}) must be "
            f"either 1 or equal to the number of dipole positions ({m})."
        )
    # Vectorized over dipoles: r has shape (n_eval, m, 3).
    r = eval_coords[:, None, :] - dipole_positions[None, :, :]
    norm_r = np.sqrt(np.sum(r * r, axis=-1))[..., None]
    m_dot_r = np.sum(dipole_moments[None, :, :] * r, axis=-1)[..., None]
    B = 3 * r * m_dot_r / norm_r**5 - dipole_moments[None, :, :] / norm_r**3
    B = _MU_0 / (4 * np.pi) * np.sum(B, axis=1)
    return np.atleast_2d(B.squeeze())[:, index]


def DipoleField(
    *,
    dipole_positions: Union[np.ndarray, Tuple[float, float, float]],
    dipole_moments: Union[np.ndarray, Tuple[float, float, float]],
    component: Optional[str] = None,
    length_units: str = "um",
    moment_units: str = "mu_B",
) -> Parameter:
    """A Parameter computing the field (tesla) from a distribution of
    dipoles.

    Args:
        dipole_positions: ``(m, 3)`` or ``(3,)`` dipole positions.
        dipole_moments: ``(m, 3)`` or ``(3,)`` dipole moments.
        component: "x", "y", "z", or None for the vector field.
        length_units: Units of positions.
        moment_units: Units of moments.
    """
    if component not in (None, "x", "y", "z"):
        raise ValueError(
            f"Component must be 'x', 'y', 'z', or None (got {component!r})."
        )
    return Parameter(
        dipole_distribution,
        dipole_positions=dipole_positions,
        dipole_moments=dipole_moments,
        component=component,
        length_units=length_units,
        moment_units=moment_units,
    )
