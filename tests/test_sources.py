import numpy as np
import pytest

import superscreen_tpu as sc
from superscreen_tpu.sources import (
    ConstantField,
    DipoleField,
    MonopoleField,
    PearlVortexField,
    SheetCurrentField,
    VortexField,
    biot_savart_2d,
    dipole_distribution,
    dipole_field,
    monopole,
    pearl_vortex,
)


def test_constant_field():
    f = ConstantField(2.5)
    x = np.linspace(-1, 1, 10)
    out = f(x, x, np.zeros_like(x))
    assert np.allclose(out, 2.5)


def test_monopole_field():
    x = np.array([1.0, 2.0])
    y = np.zeros(2)
    z = np.ones(2)
    Hz = monopole(x, y, z, nPhi0=1)
    r = np.sqrt(x**2 + y**2 + z**2)
    assert np.allclose(Hz, z / (2 * np.pi * r**3))
    Hvec = monopole(x, y, z, vector=True)
    assert Hvec.shape == (2, 3)
    # Vector field magnitude = 1/(2 pi r^2)
    assert np.allclose(
        np.linalg.norm(Hvec, axis=1), 1 / (2 * np.pi * r**2)
    )
    f = MonopoleField(nPhi0=2)
    assert np.allclose(f(x, y, z), 2 * Hz)
    assert VortexField is MonopoleField


def test_monopole_flux_integral():
    """Integrating Hz of a monopole over a plane above it gives nPhi0:
    the field subtends a 2*pi solid angle with prefactor nPhi0/(2*pi)."""
    xs = np.linspace(-50, 50, 401)
    X, Y = np.meshgrid(xs, xs)
    dA = (xs[1] - xs[0]) ** 2
    Hz = monopole(X.ravel(), Y.ravel(), np.full(X.size, 1.0), nPhi0=1)
    flux = Hz.sum() * dA
    assert np.isclose(flux, 1.0, rtol=5e-2)


def test_dipole_field_analytic():
    # On-axis field of a z-oriented dipole: B = mu0 m / (2 pi z^3)
    m = 1e-20
    z = 2e-6
    B = dipole_field(np.array([[0, 0, z]]), moment=(0, 0, m))
    mu_0 = 1.25663706212e-6
    assert np.isclose(B[2], mu_0 * m / (2 * np.pi * z**3), rtol=1e-10)
    # dipole_distribution sums multiple dipoles (um/mu_B units)
    Bz = dipole_distribution(
        np.array([0.0]),
        np.array([0.0]),
        np.array([2.0]),
        dipole_positions=np.array([[0, 0, 0.0]]),
        dipole_moments=np.array([[0, 0, 1.0]]),
        component="z",
    )
    mu_B = 9.2740100783e-24
    expected = mu_0 * mu_B / (2 * np.pi * (2e-6) ** 3)
    assert np.isclose(np.squeeze(Bz), expected, rtol=1e-8)


def test_dipole_field_parameter():
    f = DipoleField(
        dipole_positions=(0, 0, 0),
        dipole_moments=(0, 0, 1.0),
        component="z",
    )
    x = np.linspace(-1, 1, 5)
    out = f(x, x, np.full_like(x, 1.0))
    assert out.shape == (5,)
    with pytest.raises(ValueError):
        DipoleField(
            dipole_positions=(0, 0, 0), dipole_moments=(0, 0, 1), component="bad"
        )
    # Mismatched moments
    with pytest.raises(ValueError):
        dipole_distribution(
            x,
            x,
            np.ones_like(x),
            dipole_positions=np.zeros((3, 3)),
            dipole_moments=np.zeros((2, 3)),
        )


def test_pearl_vortex():
    xs = np.linspace(-4, 4, 128)
    f = PearlVortexField(Lambda=0.5, xs=xs, ys=xs)
    x = np.linspace(-0.5, 0.5, 11)
    out = f(x, x, np.full_like(x, 0.1))
    assert np.all(np.isfinite(out))
    assert out.max() > 0
    # z must be constant
    with pytest.raises(ValueError):
        pearl_vortex(
            x, x, np.linspace(0, 1, 11), xs=xs, ys=xs, Lambda=0.5
        )
    # Eval points must lie inside the FFT window
    with pytest.raises(ValueError):
        pearl_vortex(
            np.array([10.0]), np.array([0.0]), np.array([0.1]),
            xs=xs, ys=xs, Lambda=0.5,
        )


def test_pearl_vortex_flux():
    """Total flux of a Pearl vortex integrates to ~nPhi0."""
    xs = np.linspace(-30, 30, 256)
    X, Y = np.meshgrid(xs, xs)
    hz = pearl_vortex(
        X.ravel(), Y.ravel(), np.full(X.size, 0.0), xs=xs, ys=xs, Lambda=1.0
    )
    dA = (xs[1] - xs[0]) ** 2
    assert np.isclose(np.sum(hz) * dA, 1.0, rtol=5e-2)


def test_biot_savart_2d_circular_loop():
    """Field at the center of a circular current loop: B = mu0 I / (2 R)."""
    R = 1.0  # um
    I = 1.0  # uA
    n = 2000
    theta = np.linspace(0, 2 * np.pi, n, endpoint=False)
    # A thin annulus carrying total current I: approximate with a ring of
    # sheet current. width w, J = I / w.
    w = 0.05
    positions = np.stack([R * np.cos(theta), R * np.sin(theta)], axis=1)
    J = (I / w) * np.stack([-np.sin(theta), np.cos(theta)], axis=1)
    areas = np.full(n, (2 * np.pi * R / n) * w)
    B = biot_savart_2d(
        np.array([0.0]),
        np.array([0.0]),
        np.array([0.0]),
        positions=positions,
        current_densities=J,
        areas=areas,
        z0=0,
        length_units="um",
        current_units="uA",
        vector=False,
    )
    mu_0 = 1.25663706212e-6
    expected = mu_0 * 1e-6 / (2 * 1e-6)  # tesla
    assert np.isclose(np.squeeze(B), expected, rtol=1e-3)
    Bvec = biot_savart_2d(
        np.array([0.0]),
        np.array([0.0]),
        np.array([0.5]),
        positions=positions,
        current_densities=J,
        areas=areas,
        vector=True,
    )
    assert Bvec.shape == (1, 3)
    # On-axis field has no x-y components.
    assert np.allclose(Bvec[0, :2], 0, atol=1e-12)


def test_sheet_current_field_parameter():
    theta = np.linspace(0, 2 * np.pi, 100, endpoint=False)
    positions = np.stack([np.cos(theta), np.sin(theta)], axis=1)
    J = np.stack([-np.sin(theta), np.cos(theta)], axis=1)
    f = SheetCurrentField(
        sheet_positions=positions, current_densities=J, z0=0
    )
    x = np.array([0.0, 0.5])
    out = f(x, np.zeros_like(x), np.full_like(x, 1.0))
    assert out.shape == (2,)
    assert np.all(np.isfinite(out))
