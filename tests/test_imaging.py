"""Tests for imaging: Fourier current reconstruction from Bz maps."""

import numpy as np
import pytest

import superscreen_tpu as sc
from superscreen_tpu import imaging


def test_round_trip_synthetic():
    """stream -> Bz at height z -> stream/J recovers the input (up to the
    arbitrary constant in g and the regularizing window)."""
    n = 256
    L = 40e-6
    x = np.linspace(-L / 2, L / 2, n, endpoint=False)
    dx = float(x[1] - x[0])
    X, Y = np.meshgrid(x, x)
    g = 1e-3 * np.exp(-((X**2 + Y**2) / (2 * (4e-6) ** 2)))
    z = 1e-6
    bz = np.asarray(imaging.stream_to_bz(g, dx, dx, z))
    g_rec = np.asarray(imaging.bz_to_stream(bz, dx, dx, z))
    # g is defined up to a constant: compare mean-free.
    dg = (g_rec - g_rec.mean()) - (g - g.mean())
    assert np.abs(dg).max() < 2e-3 * np.abs(g).max()
    jx, jy = (np.asarray(a) for a in imaging.stream_to_current_density(g, dx, dx))
    _, jx2, jy2 = (
        np.asarray(a) for a in imaging.bz_to_current_density(bz, dx, dx, z)
    )
    assert np.abs(jx2 - jx).max() < 1e-3 * np.abs(jx).max()
    assert np.abs(jy2 - jy).max() < 1e-3 * np.abs(jy).max()


def test_cutoff_suppresses_noise_amplification():
    """White measurement noise must not blow up through exp(kz)."""
    n = 128
    dx = 0.2e-6
    z = 1e-6
    rng = np.random.default_rng(0)
    noise = 1e-6 * rng.standard_normal((n, n))  # 1 uT white noise
    g = np.asarray(imaging.bz_to_stream(noise, dx, dx, z))
    # Unregularized gain at Nyquist would be exp(pi/dx * z) ~ e^15; with the
    # default cutoff the reconstruction stays within max_amplification x
    # the naive scale 2 |Bz| / (mu_0 k_min).
    k_min = 2 * np.pi / (n * dx)
    naive = 2 * np.abs(noise).max() / (imaging.MU_0 * k_min)
    assert np.abs(g).max() < 100 * naive


def test_physical_solution_inversion():
    """Invert the field of a SOLVED ring and compare to the solver's own
    stream function and current density."""
    device = sc.Device(
        "ring",
        layers=[sc.Layer("base", Lambda=0.5, z0=0)],
        films=[
            sc.Polygon("ring", layer="base", points=sc.geometry.circle(3, points=80))
        ],
        holes=[
            sc.Polygon("hole", layer="base", points=sc.geometry.circle(1.2, points=40))
        ],
        length_units="um",
        solve_dtype="float64",
    )
    device.make_mesh(min_points=2500, smooth=5)
    solution = sc.solve(
        device,
        applied_field=sc.sources.ConstantField(0),
        circulating_currents={"hole": "1 mA"},
        field_units="mT",
        current_units="mA",
        progress_bar=False,
    )[-1]

    # Field map on a padded grid at height z (um units).
    n, L, z = 192, 24.0, 0.8
    xs = np.linspace(-L / 2, L / 2, n, endpoint=False)
    dx = float(xs[1] - xs[0])
    X, Y = np.meshgrid(xs, xs)
    pts = np.column_stack([X.ravel(), Y.ravel()])
    bz = np.asarray(
        solution.field_at_position(pts, zs=z, units="mT", with_units=False)
    ).reshape(n, n)

    g_rec, jx_rec, jy_rec = imaging.invert_field_map(
        bz, dx, dx, z,
        field_units="mT", length_units="um", current_units="mA",
    )

    # Compare against the solver's stream interpolated onto the grid.
    from superscreen_tpu.ops.interp import interp_linear

    mesh = device.meshes["ring"]
    g_true = np.zeros(n * n)
    inside = device.films["ring"].contains_points(pts)
    g_true_vals = np.asarray(
        solution.interp_current_density(pts[inside], film="ring", with_units=False)
    )  # (m, 2) J in mA/um
    g_stream = np.asarray(
        interp_linear(
            mesh.spatial_index,
            np.asarray(solution.film_solutions["ring"].stream),
            pts[inside],
            fill=0.0,
        )
    )
    g_true[inside] = g_stream
    g_true = g_true.reshape(n, n)

    sel = inside.reshape(n, n)
    scale = np.abs(g_true[sel]).max()
    dg = np.abs((g_rec - g_rec[~sel].mean()) - g_true)[sel] / scale
    # Band-limited reconstruction: sub-percent in the bulk, the worst
    # points sit on the current edges (finite height + window + wrap).
    assert np.median(dg) < 0.02
    assert np.percentile(dg, 95) < 0.06
    assert dg.max() < 0.12

    J_rec = np.stack(
        [jx_rec.reshape(-1)[inside], jy_rec.reshape(-1)[inside]], axis=1
    )
    dJ = np.linalg.norm(J_rec - g_true_vals, axis=1) / np.abs(g_true_vals).max()
    assert np.median(dJ) < 0.06
    assert np.percentile(dJ, 95) < 0.35  # derivative overshoot at edges
