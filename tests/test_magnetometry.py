"""Tests for squids.magnetometry_scan: batched scanning-SQUID magnetometry
images of a solved sample (trapped vortices, circulating currents).

Oracles: the unbatched Solution.vector_potential_at_position line integral
for the bare scan, and an independently orchestrated solve() of the SQUID
under a Parameter-wrapped sample field for the screening scan.
"""

import numpy as np
import pytest

import superscreen_tpu as sc
from superscreen_tpu.squids import magnetometry_scan


@pytest.fixture(scope="module")
def vortex_sample_solution():
    sample = sc.Device(
        "sample",
        layers=[sc.Layer("s", Lambda=0.5, z0=0)],
        films=[
            sc.Polygon(
                "disk", layer="s", points=sc.geometry.circle(4.0, points=120)
            )
        ],
        length_units="um",
        solve_dtype="float64",
    )
    sample.make_mesh(min_points=2000, smooth=5)
    return sc.solve(
        sample,
        applied_field=sc.sources.ConstantField(0),
        vortices=[sc.Vortex(x=1.0, y=0.0, film="disk")],
        field_units="mT",
        current_units="mA",
        progress_bar=False,
    )[-1]


@pytest.fixture(scope="module")
def squid_washer():
    squid = sc.Device(
        "washer",
        layers=[sc.Layer("sq", Lambda=0.3, z0=0)],
        films=[
            sc.Polygon(
                "body", layer="sq", points=sc.geometry.circle(1.5, points=80)
            )
        ],
        holes=[
            sc.Polygon(
                "pl_hole", layer="sq", points=sc.geometry.circle(0.6, points=40)
            )
        ],
        abstract_regions=[
            sc.Polygon("pl", layer="sq", points=sc.geometry.circle(0.4, points=48))
        ],
        length_units="um",
        solve_dtype="float64",
    )
    squid.make_mesh(min_points=1200, smooth=5)
    return squid


def test_bare_scan_matches_unbatched_readout(vortex_sample_solution):
    """Explicit-contour scan (no SQUID device) vs the per-position
    Solution.vector_potential_at_position path."""
    h = 0.8
    positions = np.array([[0.0, 0.0], [1.0, 0.0], [2.5, 1.0]])
    contour = sc.geometry.close_curve(sc.geometry.circle(0.4, points=48))
    Phi = magnetometry_scan(
        vortex_sample_solution,
        positions=positions,
        squid_height=h,
        pickup_loop=contour,
    )
    assert Phi.shape == (3,)
    for i, p in enumerate(positions):
        pts = contour + p
        A = np.asarray(
            vortex_sample_solution.vector_potential_at_position(
                pts, zs=h, units="Phi_0/um", with_units=False
            )
        )
        dl = np.diff(pts, axis=0)
        flux = float(np.einsum("kx,kx->", 0.5 * (A[:-1, :2] + A[1:, :2]), dl))
        # The two paths accumulate the n-site sum in different orders
        # (batched vmap vs per-position), so agreement is ~1e-7, not ulp.
        assert Phi[i] == pytest.approx(flux, rel=1e-6)


def test_vortex_image_physics(vortex_sample_solution):
    """The vortex image: positive flux, peaked at the vortex position,
    decaying laterally and with height; a large high-up loop captures an
    O(Phi_0 / 2) fraction of the quantum."""
    xs = np.linspace(-2.0, 4.0, 13)
    positions = np.column_stack([xs, np.zeros_like(xs)])
    contour = sc.geometry.close_curve(sc.geometry.circle(0.4, points=48))
    Phi = magnetometry_scan(
        vortex_sample_solution,
        positions=positions,
        squid_height=0.8,
        pickup_loop=contour,
    )
    # Peak at the scan point nearest the vortex at (1, 0).
    assert xs[np.argmax(Phi)] == pytest.approx(1.0)
    assert Phi.max() > 0
    # Decays away from the vortex.
    assert Phi.max() > 3 * Phi[0]
    # Higher scan -> weaker, broader signal.
    Phi_hi = magnetometry_scan(
        vortex_sample_solution,
        positions=positions[6:7],
        squid_height=2.5,
        pickup_loop=contour,
    )
    assert 0 < Phi_hi[0] < Phi.max()
    # Per-position heights equal scalar-height calls.
    hs = np.array([0.8, 2.5])
    Phi_vec = magnetometry_scan(
        vortex_sample_solution,
        positions=np.array([[1.0, 0.0], [1.0, 0.0]]),
        squid_height=hs,
        pickup_loop=contour,
    )
    assert Phi_vec[0] == pytest.approx(Phi.max(), rel=1e-10)
    assert Phi_vec[1] == pytest.approx(Phi_hi[0], rel=1e-10)
    # Chunking is exact; units plumbing works.
    Phi_chunked = magnetometry_scan(
        vortex_sample_solution,
        positions=positions,
        squid_height=0.8,
        pickup_loop=contour,
        batch_size=4,
    )
    np.testing.assert_allclose(Phi_chunked, Phi, rtol=1e-10)
    Phi_mPhi0 = magnetometry_scan(
        vortex_sample_solution,
        positions=positions[6:7],
        squid_height=0.8,
        pickup_loop=contour,
        units="mPhi_0",
        with_units=True,
    )
    assert Phi_mPhi0.to("Phi_0").magnitude[0] == pytest.approx(
        Phi[6], rel=1e-10
    )


def test_named_loop_and_validation(vortex_sample_solution, squid_washer):
    p = np.array([[1.0, 0.0]])
    by_name = magnetometry_scan(
        vortex_sample_solution,
        positions=p,
        squid_height=0.8,
        pickup_loop="pl",
        squid_device=squid_washer,
    )
    contour = sc.geometry.close_curve(sc.geometry.circle(0.4, points=48))
    by_coords = magnetometry_scan(
        vortex_sample_solution,
        positions=p,
        squid_height=0.8,
        pickup_loop=contour,
    )
    assert by_name[0] == pytest.approx(by_coords[0], rel=1e-9)
    with pytest.raises(ValueError, match="named pickup_loop"):
        magnetometry_scan(
            vortex_sample_solution,
            positions=p,
            squid_height=0.8,
            pickup_loop="pl",
        )
    with pytest.raises(ValueError, match="screening"):
        magnetometry_scan(
            vortex_sample_solution,
            positions=p,
            squid_height=0.8,
            pickup_loop=contour,
            screening=True,
        )
    with pytest.raises(ValueError, match="batch_size"):
        magnetometry_scan(
            vortex_sample_solution,
            positions=p,
            squid_height=0.8,
            pickup_loop=contour,
            batch_size=0,
        )
    with pytest.raises(ValueError, match="squid_height"):
        magnetometry_scan(
            vortex_sample_solution,
            positions=p,
            squid_height=np.ones((1, 1)),
            pickup_loop=contour,
        )


def test_screening_matches_independent_solve(
    vortex_sample_solution, squid_washer
):
    """screening=True vs an independently orchestrated sc.solve() of the
    undriven SQUID under a Parameter wrapping the sample's field, plus the
    hand-computed two-part pickup flux."""
    from superscreen_tpu.ops import kernels

    h = 0.8
    p = np.array([1.0, 0.0])
    Phi = magnetometry_scan(
        vortex_sample_solution,
        positions=p[None],
        squid_height=h,
        pickup_loop="pl",
        squid_device=squid_washer,
        screening=True,
    )

    def sample_Hz(x, y, z, *, solution, px, py, dz):
        x = np.atleast_1d(np.asarray(x, dtype=float))
        y = np.atleast_1d(np.asarray(y, dtype=float))
        z = np.broadcast_to(np.asarray(z, dtype=float), x.shape)
        pts = np.column_stack([x + px, y + py])
        return np.asarray(
            solution.field_at_position(
                pts, zs=z + dz, units="mT", with_units=False
            )
        ).reshape(x.shape)

    applied = sc.Parameter(
        sample_Hz,
        solution=vortex_sample_solution,
        px=float(p[0]),
        py=float(p[1]),
        dz=h,
    )
    squid_sol = sc.solve(
        squid_washer,
        applied_field=applied,
        field_units="mT",
        current_units="mA",
        progress_bar=False,
    )[-1]

    contour = sc.geometry.close_curve(sc.geometry.circle(0.4, points=48))

    def loop_flux(solution, dev, pts, z_eval):
        total = 0.0
        for name, mesh in dev.meshes.items():
            z_s = float(dev.layers[dev.films[name].layer].z0)
            J = np.asarray(solution.film_solutions[name].current_density)
            A = np.asarray(
                kernels.vector_potential_2d(
                    pts,
                    np.full(len(pts), float(z_eval)),
                    np.asarray(mesh.sites),
                    z_s,
                    np.asarray(mesh.vertex_areas),
                    J,
                )
            )
            dl = np.diff(pts, axis=0)
            total += float(np.einsum("kx,kx->", 0.5 * (A[:-1] + A[1:]), dl))
        return total

    # Sample currents (mA) through the shifted loop at height h, plus the
    # SQUID's screening currents (mA) through the fixed loop in its frame.
    flux = loop_flux(
        vortex_sample_solution, vortex_sample_solution.device, contour + p, h
    ) + loop_flux(squid_sol, squid_washer, contour, 0.0)
    Phi_truth = (flux * sc.ureg("mu_0 * mA * um")).to("Phi_0").magnitude
    assert Phi[0] == pytest.approx(Phi_truth, rel=1e-6)
    # The washer's flux-focusing / screening correction is real (nonzero).
    Phi_bare = magnetometry_scan(
        vortex_sample_solution,
        positions=p[None],
        squid_height=h,
        pickup_loop="pl",
        squid_device=squid_washer,
    )
    assert abs(Phi[0] - Phi_bare[0]) > 1e-4 * abs(Phi_bare[0])
