"""Monopole (vortex) and Pearl-vortex field sources.

Reference: ``superscreen/sources/vortex.py``.
"""

from typing import Tuple, Union

import numpy as np

from ..parameter import Parameter

__all__ = [
    "monopole",
    "MonopoleField",
    "VortexField",
    "pearl_vortex",
    "PearlVortexField",
]


def monopole(
    x: Union[float, np.ndarray],
    y: Union[float, np.ndarray],
    z: Union[float, np.ndarray],
    *,
    r0: Tuple[float, float, float] = (0, 0, 0),
    nPhi0: Union[int, float] = 1,
    vector: bool = False,
) -> Union[float, np.ndarray]:
    """Field of a flux monopole, ``mu_0 H = nPhi0/(2 pi) r / |r|^3``, in
    units of ``Phi_0 / length_units**2``.

    Args:
        x, y, z: Evaluation coordinates.
        r0: Monopole position.
        nPhi0: Number of flux quanta in the monopole.
        vector: Return the vector field instead of the z-component.
    """
    x0, y0, z0 = r0
    xp = x - x0
    yp = y - y0
    zp = z - z0
    prefactor = 1 / ((2 * np.pi) * (xp**2 + yp**2 + zp**2) ** (3 / 2))
    Hz0 = zp * prefactor
    if vector:
        Hx0 = xp * prefactor
        Hy0 = yp * prefactor
        Hz = np.stack([Hx0, Hy0, Hz0], axis=1)
    else:
        Hz = Hz0
    return nPhi0 * Hz


def MonopoleField(
    r0: Tuple[float, float, float] = (0, 0, 0),
    nPhi0: Union[int, float] = 1,
    vector: bool = False,
) -> Parameter:
    """A Parameter computing the (z-component of the) field from a flux
    monopole at ``r0`` containing ``nPhi0`` flux quanta, in units of
    ``Phi_0 / length_units**2``."""
    return Parameter(monopole, r0=r0, nPhi0=nPhi0, vector=vector)


VortexField = MonopoleField


def pearl_vortex(
    x: Union[float, np.ndarray],
    y: Union[float, np.ndarray],
    z: Union[float, np.ndarray],
    *,
    xs: np.ndarray,
    ys: np.ndarray,
    Lambda: float = 0,
    r0: Tuple[float, float, float] = (0, 0, 0),
    nPhi0: Union[int, float] = 1,
) -> Union[float, np.ndarray]:
    """The z-component of the field from a Pearl vortex via Fourier
    transform: ``F{mu_0 Hz}(k) = nPhi0 exp(-k z) / (1 + 2 Lambda k)``,
    in units of ``Phi_0 / length_units**2``.

    Args:
        x, y, z: Evaluation coordinates (all ``z`` must be equal).
        xs, ys: Coordinate vectors defining the FFT domain (must contain all
            evaluation points).
        Lambda: Effective penetration depth (half the Pearl length).
        r0: Vortex position.
        nPhi0: Number of flux quanta in the vortex.
    """
    from scipy.interpolate import LinearNDInterpolator

    x0, y0, z0 = r0
    x, y, z = np.atleast_1d(x, y, z)
    if not np.allclose(z, z[0]):
        raise ValueError("All elements of the vector z must be equal.")
    x = x - x0
    y = y - y0
    z = np.abs(z[0] - z0)
    xs = np.sort(xs)
    ys = np.sort(ys)
    if (
        x.min() < xs.min()
        or x.max() > xs.max()
        or y.min() < ys.min()
        or y.max() > ys.max()
    ):
        raise ValueError(
            "The rectangle defined by xs and ys must contain the convex hull "
            "of the region defined by (x - x0) and (y - y0)."
        )
    dx = xs[1] - xs[0]
    dy = ys[1] - ys[0]
    kmaxx = np.pi / dx
    kmaxy = np.pi / dy
    kx = np.linspace(-kmaxx, kmaxx, xs.shape[0], endpoint=False)
    ky = np.linspace(-kmaxy, kmaxy, ys.shape[0], endpoint=False)
    X, Y = np.meshgrid(xs, ys)
    KX, KY = np.meshgrid(kx, ky)
    K = np.sqrt(KX**2 + KY**2)
    Lambda_pearl = 2 * Lambda
    hzk = nPhi0 * np.exp(-K * z) / (1 + K * Lambda_pearl)
    hzk = np.fft.fftshift(hzk)
    hz = np.abs(np.fft.fftshift(np.fft.ifft2(hzk))) / (dx * dy)
    XY = np.array([X.ravel(), Y.ravel()]).T
    interp = LinearNDInterpolator(XY, hz.ravel())
    return interp(np.array([x, y]).T).squeeze()


def PearlVortexField(
    *,
    r0: Tuple[float, float, float] = (0, 0, 0),
    Lambda: float = 0,
    nPhi0: Union[int, float] = 1,
    xs: np.ndarray,
    ys: np.ndarray,
) -> Parameter:
    """A Parameter computing the z-component of the field from a Pearl
    vortex (see :func:`pearl_vortex`)."""
    return Parameter(
        pearl_vortex, xs=xs, ys=ys, Lambda=Lambda, r0=r0, nPhi0=nPhi0
    )
