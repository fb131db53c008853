"""Current imaging: Fourier inversion of out-of-plane field maps.

Scanning magnetometry measures ``B_z(x, y)`` on a plane a height ``z``
above a current-carrying film; the standard analysis (Roth, Sepulveda &
Wikswo, J. Appl. Phys. 65, 361 (1989)) inverts it for the sheet current.
In terms of the stream function ``g`` (``J = curl(g zhat)``, the same
quantity this framework solves for), the forward map is diagonal in
Fourier space:

    Bz_hat(k; z) = (mu_0 |k| / 2) * exp(-|k| z) * g_hat(k)

because a sheet current with stream function ``g`` is identical to a
sheet of out-of-plane magnetization ``m_z = g``.  Inversion multiplies by
``exp(+|k| z)`` and therefore amplifies measurement noise exponentially;
a window (cosine rolloff ending at ``k_cutoff``) regularizes it.

Everything is jnp (`jit`-compatible, TPU FFTs).  The reference package has
no current-imaging tools.

Conventions: uniform grid, ``Bz[i, j]`` at ``(x_j, y_i)`` (row = y), any
self-consistent unit system (pass tesla and meters, or use the unit-aware
wrappers' ``field_units`` / ``length_units``).
"""

from typing import Optional, Tuple, Union

import jax.numpy as jnp
import numpy as np

from .units import ureg as _ureg

MU_0 = 4e-7 * np.pi  # H/m


def _k_grids(ny: int, nx: int, dx: float, dy: float):
    kx = 2 * np.pi * jnp.fft.fftfreq(nx, d=dx)
    ky = 2 * np.pi * jnp.fft.fftfreq(ny, d=dy)
    KX, KY = jnp.meshgrid(kx, ky)
    return KX, KY, jnp.sqrt(KX**2 + KY**2)


def _tukey_lowpass(K, k_cutoff, rolloff_start: float = 0.7):
    """Unity in the passband, cosine rolloff from ``rolloff_start*k_cutoff``
    to ``k_cutoff``, zero beyond (a Tukey window in k)."""
    k0 = rolloff_start * k_cutoff
    t = (K - k0) / (k_cutoff - k0)
    w = 0.5 * (1 + jnp.cos(np.pi * jnp.clip(t, 0.0, 1.0)))
    return jnp.where(K < k_cutoff, w, 0.0)


def stream_to_bz(
    g: jnp.ndarray,
    dx: float,
    dy: float,
    z: float,
) -> jnp.ndarray:
    """Forward map: ``B_z`` (tesla) at height ``z`` (meters) from a gridded
    stream function ``g`` (amperes) sampled with spacings ``dx, dy``
    (meters).  Periodic boundary conditions (pad the grid to taste)."""
    g = jnp.asarray(g)
    _, _, K = _k_grids(*g.shape, dx=dx, dy=dy)
    g_hat = jnp.fft.fft2(g)
    bz_hat = 0.5 * MU_0 * K * jnp.exp(-K * z) * g_hat
    return jnp.real(jnp.fft.ifft2(bz_hat))


def bz_to_stream(
    bz: jnp.ndarray,
    dx: float,
    dy: float,
    z: float,
    *,
    k_cutoff: Optional[float] = None,
    max_amplification: float = 100.0,
) -> jnp.ndarray:
    """Inverse map: the stream function ``g`` (amperes) from a measured
    ``B_z`` map (tesla) at height ``z`` (meters).

    Args:
        bz: ``(ny, nx)`` field map, tesla.
        dx, dy: Grid spacings, meters.
        z: Measurement height above the film plane, meters.
        k_cutoff: Low-pass cutoff wavenumber (rad/m).  Defaults to the
            smaller of the grid Nyquist limit and the wavenumber at which
            the deconvolution gain ``exp(k z)`` reaches
            ``max_amplification`` -- the standard resolution-vs-noise
            tradeoff (features smaller than ~z are unrecoverable).
        max_amplification: Cap on the ``exp(k z)`` gain used for the
            default cutoff.

    Returns:
        ``(ny, nx)`` stream function, amperes.  ``g`` is only defined up
        to a constant; the k=0 component is set to zero (zero mean).
    """
    bz = jnp.asarray(bz)
    ny, nx = bz.shape
    _, _, K = _k_grids(ny, nx, dx=dx, dy=dy)
    nyquist = np.pi * min(1.0 / dx, 1.0 / dy)
    if k_cutoff is None:
        k_noise = np.log(max_amplification) / max(z, 1e-30)
        k_cutoff = min(nyquist, k_noise)
    window = _tukey_lowpass(K, k_cutoff)
    gain = jnp.where(K > 0, 2.0 * jnp.exp(K * z) / (MU_0 * K), 0.0)
    g_hat = jnp.fft.fft2(bz) * gain * window
    return jnp.real(jnp.fft.ifft2(g_hat))


def stream_to_current_density(
    g: jnp.ndarray, dx: float, dy: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``(Jx, Jy)`` (A/m) from a gridded stream function (amperes) via
    spectral differentiation: ``Jx = dg/dy``, ``Jy = -dg/dx``."""
    g = jnp.asarray(g)
    KX, KY, _ = _k_grids(*g.shape, dx=dx, dy=dy)
    g_hat = jnp.fft.fft2(g)
    jx = jnp.real(jnp.fft.ifft2(1j * KY * g_hat))
    jy = jnp.real(jnp.fft.ifft2(-1j * KX * g_hat))
    return jx, jy


def bz_to_current_density(
    bz: jnp.ndarray,
    dx: float,
    dy: float,
    z: float,
    *,
    k_cutoff: Optional[float] = None,
    max_amplification: float = 100.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One-call current imaging: ``(g, Jx, Jy)`` from a ``B_z`` map.

    SI in, SI out (tesla, meters -> amperes, A/m); see
    :func:`invert_field_map` for the unit-aware version.
    """
    g = bz_to_stream(
        bz, dx, dy, z, k_cutoff=k_cutoff, max_amplification=max_amplification
    )
    jx, jy = stream_to_current_density(g, dx, dy)
    return g, jx, jy


def invert_field_map(
    bz: np.ndarray,
    dx: float,
    dy: float,
    z: float,
    *,
    field_units: str = "mT",
    length_units: str = "um",
    current_units: str = "uA",
    k_cutoff: Optional[float] = None,
    max_amplification: float = 100.0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Unit-aware current imaging.

    Args:
        bz: ``(ny, nx)`` out-of-plane field map in ``field_units`` (B- or
            H-type; H is converted via mu_0).
        dx, dy, z: Grid spacings and measurement height in
            ``length_units``.
        field_units, length_units, current_units: Units of the inputs and
            outputs.
        k_cutoff: Optional cutoff in rad/``length_units``.
        max_amplification: See :func:`bz_to_stream`.

    Returns:
        ``(g, Jx, Jy)``: stream function in ``current_units`` and sheet
        current in ``current_units / length_units``.
    """
    from .solver.utils import convert_field

    bz_tesla = np.asarray(
        convert_field(np.asarray(bz), "tesla", old_units=field_units, ureg=_ureg, with_units=False)
    )
    lf = float(_ureg(f"1 {length_units}").to("m").magnitude)
    kc = None if k_cutoff is None else k_cutoff / lf
    g, jx, jy = bz_to_current_density(
        bz_tesla,
        dx * lf,
        dy * lf,
        z * lf,
        k_cutoff=kc,
        max_amplification=max_amplification,
    )
    cf = float(_ureg("1 A").to(current_units).magnitude)
    jf = float(_ureg("1 A/m").to(f"{current_units}/{length_units}").magnitude)
    return np.asarray(g) * cf, np.asarray(jx) * jf, np.asarray(jy) * jf
