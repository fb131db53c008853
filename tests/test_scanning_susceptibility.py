"""Tests for squids.scanning: batched sample-response susceptibility maps.

Physics checks (diamagnetic sign, center-peaked, decay off the sample,
mirror symmetry) plus an exact cross-check of the batched readout against
the unbatched Solution.vector_potential_at_position path.
"""

import numpy as np
import pytest

import superscreen_tpu as sc
from superscreen_tpu.squids import applied_field_maps, susceptibility_scan
from superscreen_tpu.sweep import solve_many


@pytest.fixture(scope="module")
def mini_squid_solution():
    squid = sc.Device(
        "mini_squid",
        layers=[sc.Layer("sq", Lambda=0.3, z0=0)],
        films=[
            sc.Polygon(
                "fc_ring", layer="sq", points=sc.geometry.circle(1.5, points=80)
            )
        ],
        holes=[
            sc.Polygon(
                "fc_hole", layer="sq", points=sc.geometry.circle(0.9, points=50)
            )
        ],
        abstract_regions=[
            sc.Polygon("pl", layer="sq", points=sc.geometry.circle(0.4, points=48))
        ],
        length_units="um",
        solve_dtype="float64",
    )
    squid.make_mesh(min_points=1000, smooth=5)
    return sc.solve(
        squid,
        applied_field=sc.sources.ConstantField(0),
        circulating_currents={"fc_hole": "1 mA"},
        field_units="mT",
        current_units="mA",
        progress_bar=False,
    )[-1]


@pytest.fixture(scope="module")
def sample_disk():
    sample = sc.Device(
        "sample",
        layers=[sc.Layer("s", Lambda=0.1, z0=0)],
        films=[
            sc.Polygon(
                "disk", layer="s", points=sc.geometry.circle(4.0, points=120)
            )
        ],
        length_units="um",
        solve_dtype="float64",
    )
    sample.make_mesh(min_points=2000, smooth=5)
    return sample


def test_susceptibility_scan_physics(mini_squid_solution, sample_disk):
    xs = np.array([-6.0, -3.0, 0.0, 3.0, 6.0])
    positions = np.column_stack([xs, np.zeros_like(xs)])
    M = susceptibility_scan(
        sample_disk,
        squid_solution=mini_squid_solution,
        positions=positions,
        squid_height=1.0,
        pickup_loop="pl",
        I_fc="1 mA",
    )
    assert M.shape == (5,)
    # Diamagnetic response everywhere over/near the film.
    assert np.all(M < 0)
    # Strongest signal with the SQUID centered on the disk.
    assert M[2] == M.min()
    # Off the 4-um disk (|x| = 6) the response is tiny.
    assert abs(M[0]) < 0.05 * abs(M[2])
    assert abs(M[4]) < 0.05 * abs(M[2])
    # Mirror symmetry up to mesh asymmetry.
    assert abs(M[1] - M[3]) < 0.05 * abs(M[2])
    # Batch chunking is exact.
    M_chunked = susceptibility_scan(
        sample_disk,
        squid_solution=mini_squid_solution,
        positions=positions,
        squid_height=1.0,
        pickup_loop="pl",
        I_fc="1 mA",
        batch_size=2,
    )
    np.testing.assert_allclose(M_chunked, M, rtol=1e-10)
    # Units plumbing.
    Mq = susceptibility_scan(
        sample_disk,
        squid_solution=mini_squid_solution,
        positions=positions[2:3],
        squid_height=1.0,
        pickup_loop="pl",
        I_fc="1 mA",
        units="Phi_0 / mA",
        with_units=True,
    )
    assert np.isclose(Mq.to("Phi_0 / A").magnitude[0], M[2], rtol=1e-10)


def test_scan_matches_unbatched_readout(mini_squid_solution, sample_disk):
    p = np.array([[3.0, 0.0]])
    M = susceptibility_scan(
        sample_disk,
        squid_solution=mini_squid_solution,
        positions=p,
        squid_height=1.0,
        pickup_loop="pl",
        I_fc="1 mA",
    )
    H = applied_field_maps(
        sample_disk,
        mini_squid_solution,
        p,
        squid_height=1.0,
        current_units="uA",
    )
    result = solve_many(
        device=sample_disk,
        applied_field_arrays={"disk": H["disk"]},
        field_units="uA/um",
        current_units="uA",
    )
    solution = result.solution(0)
    contour = sc.geometry.close_curve(sc.geometry.circle(0.4, points=48)) + p[0]
    A = np.asarray(
        solution.vector_potential_at_position(
            contour, zs=1.0, units="Phi_0/um", with_units=False
        )
    )
    dl = np.diff(contour, axis=0)
    A_mid = 0.5 * (A[:-1] + A[1:])
    flux_phi0 = float(np.einsum("kx,kx->", A_mid[:, :2], dl))
    M_direct = flux_phi0 / 1e-3  # the 1 mA drive, in amperes
    assert M[0] == pytest.approx(M_direct, rel=1e-8)


def test_back_action_matches_coupled_device(mini_squid_solution, sample_disk):
    """back_action rounds converge to the exact coupled SQUID+sample
    system: ground truth is ONE combined Device (SQUID films at z = h,
    sample at z = 0, SQUID shifted to the scan position) solved with the
    standard multi-film iteration, minus the no-sample SQUID flux."""
    from superscreen_tpu.ops import kernels

    h = 1.0
    p = np.array([1.0, 0.5])
    M = {}
    for ba in (0, 1, 2):
        M[ba] = susceptibility_scan(
            sample_disk,
            squid_solution=mini_squid_solution,
            positions=p[None],
            squid_height=h,
            pickup_loop="pl",
            I_fc="1 mA",
            back_action=ba,
        )[0]

    def shifted_squid_polys():
        return (
            sc.Polygon(
                "fc_ring",
                layer="sq",
                points=sc.geometry.circle(1.5, points=80) + p,
            ),
            sc.Polygon(
                "fc_hole",
                layer="sq",
                points=sc.geometry.circle(0.9, points=50) + p,
            ),
        )

    ring, hole = shifted_squid_polys()
    combined = sc.Device(
        "combined",
        layers=[sc.Layer("sq", Lambda=0.3, z0=h), sc.Layer("s", Lambda=0.1, z0=0)],
        films=[
            ring,
            sc.Polygon("disk", layer="s", points=sc.geometry.circle(4.0, points=120)),
        ],
        holes=[hole],
        length_units="um",
        solve_dtype="float64",
    )
    combined.make_mesh(min_points={"fc_ring": 1000, "disk": 2000}, smooth=5)
    sol_with = sc.solve(
        combined,
        applied_field=sc.sources.ConstantField(0),
        circulating_currents={"fc_hole": "1 mA"},
        field_units="mT",
        current_units="uA",
        iterations=8,
        progress_bar=False,
    )[-1]
    ring_ns, hole_ns = shifted_squid_polys()
    squid_only = sc.Device(
        "squid_only",
        layers=[sc.Layer("sq", Lambda=0.3, z0=h)],
        films=[ring_ns],
        holes=[hole_ns],
        length_units="um",
        solve_dtype="float64",
    )
    squid_only.make_mesh(min_points=1000, smooth=5)
    sol_ns = sc.solve(
        squid_only,
        applied_field=sc.sources.ConstantField(0),
        circulating_currents={"fc_hole": "1 mA"},
        field_units="mT",
        current_units="uA",
        progress_bar=False,
    )[-1]

    contour = sc.geometry.close_curve(sc.geometry.circle(0.4, points=48)) + p

    def loop_flux(solution, dev):
        total = 0.0
        for name, mesh in dev.meshes.items():
            z_s = float(dev.layers[dev.films[name].layer].z0)
            J = np.asarray(solution.film_solutions[name].current_density)
            A = np.asarray(
                kernels.vector_potential_2d(
                    contour,
                    np.full(len(contour), h),
                    np.asarray(mesh.sites),
                    z_s,
                    np.asarray(mesh.vertex_areas),
                    J,
                )
            )
            dl = np.diff(contour, axis=0)
            total += float(np.einsum("kx,kx->", 0.5 * (A[:-1] + A[1:]), dl))
        return total

    flux = loop_flux(sol_with, combined) - loop_flux(sol_ns, squid_only)
    M_truth = (
        (flux * sc.ureg("mu_0 * uA * um") / sc.ureg("1 mA"))
        .to("Phi_0/A")
        .magnitude
    )
    # Converged back-action matches the coupled solve; first order does not.
    assert M[2] == pytest.approx(M_truth, rel=1e-3)
    assert abs(M[0] - M_truth) > 5 * abs(M[2] - M_truth)
    # Successive rounds contract toward the converged value.
    assert abs(M[2] - M[1]) < abs(M[1] - M[0])


def test_approach_curve_heights(mini_squid_solution, sample_disk):
    """Per-position heights: chi(z) approach curve over the disk center."""
    hs = np.array([0.5, 1.0, 2.0, 4.0])
    positions = np.zeros((len(hs), 2))
    M = susceptibility_scan(
        sample_disk,
        squid_solution=mini_squid_solution,
        positions=positions,
        squid_height=hs,
        pickup_loop="pl",
        I_fc="1 mA",
    )
    # Monotonic decay of the diamagnetic response with height.
    assert np.all(M < 0)
    assert np.all(np.diff(np.abs(M)) < 0)
    # The heights array agrees with scalar-height calls elementwise.
    for i in (0, 2):
        M_scalar = susceptibility_scan(
            sample_disk,
            squid_solution=mini_squid_solution,
            positions=positions[i : i + 1],
            squid_height=float(hs[i]),
            pickup_loop="pl",
            I_fc="1 mA",
        )
        assert M[i] == pytest.approx(M_scalar[0], rel=1e-10)
    # Back-action accepts per-position heights too.
    M_ba = susceptibility_scan(
        sample_disk,
        squid_solution=mini_squid_solution,
        positions=positions[:2],
        squid_height=hs[:2],
        pickup_loop="pl",
        I_fc="1 mA",
        back_action=1,
    )
    assert np.all(np.abs(M_ba) > np.abs(M[:2]))  # coupling strengthens it
    with pytest.raises(ValueError):
        susceptibility_scan(
            sample_disk,
            squid_solution=mini_squid_solution,
            positions=positions,
            squid_height=hs[:2],
            pickup_loop="pl",
            I_fc="1 mA",
        )


def test_review_regressions(mini_squid_solution, sample_disk):
    p = np.array([[1.0, 0.0]])
    M_dev = susceptibility_scan(
        sample_disk,
        squid_solution=mini_squid_solution,
        positions=p,
        squid_height=1.0,
        pickup_loop="pl",
        I_fc="1 mA",
    )
    # A user-supplied model factorized in DIFFERENT units must give the
    # same physical answer (units come from the model, not the argument).
    model_mA = sc.factorize_model(device=sample_disk, current_units="mA")
    M_model = susceptibility_scan(
        sample_model=model_mA,
        squid_solution=mini_squid_solution,
        positions=p,
        squid_height=1.0,
        pickup_loop="pl",
        I_fc="1 mA",
        current_units="uA",  # deliberately inconsistent; must be ignored
    )
    assert M_model[0] == pytest.approx(M_dev[0], rel=1e-6)
    # Float I_fc means amperes.
    M_float = susceptibility_scan(
        sample_disk,
        squid_solution=mini_squid_solution,
        positions=p,
        squid_height=1.0,
        pickup_loop="pl",
        I_fc=1e-3,
    )
    assert M_float[0] == pytest.approx(M_dev[0], rel=1e-10)
    with pytest.raises(ValueError):
        susceptibility_scan(
            sample_disk,
            squid_solution=mini_squid_solution,
            positions=p,
            squid_height=1.0,
            pickup_loop="pl",
            I_fc="1 mA",
            batch_size=-1,
        )
    with pytest.raises(ValueError):
        susceptibility_scan(
            sample_disk,
            squid_solution=mini_squid_solution,
            positions=p,
            squid_height=np.ones((1, 1)),
            pickup_loop="pl",
            I_fc="1 mA",
        )


def test_back_action_unsmoothed_mesh_is_finite(sample_disk):
    """The pickup contour of an UNSMOOTHED probe mesh coincides with mesh
    feature-ring vertices (dz = 0 in the readout); the vector-potential
    kernel must drop the self terms instead of dividing by zero."""
    squid = sc.Device(
        "rough_squid",
        layers=[sc.Layer("sq", Lambda=0.3, z0=0)],
        films=[
            sc.Polygon(
                "fc_ring", layer="sq", points=sc.geometry.circle(1.5, points=60)
            )
        ],
        holes=[
            sc.Polygon(
                "fc_hole", layer="sq", points=sc.geometry.circle(0.9, points=40)
            )
        ],
        abstract_regions=[
            sc.Polygon("pl", layer="sq", points=sc.geometry.circle(0.4, points=24))
        ],
        length_units="um",
        solve_dtype="float64",
    )
    squid.make_mesh(min_points=700)  # no smoothing on purpose
    sol = sc.solve(
        squid,
        applied_field=sc.sources.ConstantField(0),
        circulating_currents={"fc_hole": "1 mA"},
        field_units="mT",
        current_units="mA",
        progress_bar=False,
    )[-1]
    M = susceptibility_scan(
        sample_disk,
        squid_solution=sol,
        positions=np.array([[0.5, 0.0]]),
        squid_height=1.0,
        pickup_loop="pl",
        I_fc="1 mA",
        back_action=1,
    )
    assert np.all(np.isfinite(M))
    assert M[0] < 0


def test_build_scan_forward_matches_and_differentiates(
    mini_squid_solution, sample_disk
):
    """The differentiable scan forward model: matches the solve_many path
    to machine precision and gives finite-difference-exact gradients wrt
    the sample's per-site Lambda."""
    import jax
    import jax.numpy as jnp

    from superscreen_tpu.squids import build_scan_forward

    pos = np.array([[0.0, 0.0], [2.0, 0.5], [5.0, 0.0]])
    M_ref = susceptibility_scan(
        sample_disk,
        squid_solution=mini_squid_solution,
        positions=pos,
        squid_height=1.0,
        pickup_loop="pl",
        I_fc="1 mA",
    )
    model, scan_fn = build_scan_forward(
        sample_disk,
        mini_squid_solution,
        pos,
        squid_height=1.0,
        pickup_loop="pl",
        I_fc="1 mA",
    )
    params = model.default_params()
    chi = np.asarray(jax.jit(scan_fn)(params))
    np.testing.assert_allclose(chi, M_ref, rtol=1e-10)

    def loss(lam):
        return scan_fn({**params, "Lambda": {"disk": lam}})[0]

    lam0 = jnp.asarray(params["Lambda"]["disk"])
    g = jax.grad(loss)(lam0)
    i = int(jnp.argmax(jnp.abs(g)))
    eps = 1e-5
    fd = (loss(lam0.at[i].add(eps)) - loss(lam0.at[i].add(-eps))) / (2 * eps)
    assert g[i] == pytest.approx(float(fd), rel=1e-5)


def test_pickup_loop_variants(mini_squid_solution, sample_disk):
    p = np.array([[0.0, 0.0]])
    by_name = susceptibility_scan(
        sample_disk,
        squid_solution=mini_squid_solution,
        positions=p,
        squid_height=1.0,
        pickup_loop="pl",
        I_fc="1 mA",
    )
    # Same contour passed explicitly (CW on purpose: orientation is fixed
    # internally).
    contour = sc.geometry.circle(0.4, points=48)[::-1]
    by_coords = susceptibility_scan(
        sample_disk,
        squid_solution=mini_squid_solution,
        positions=p,
        squid_height=1.0,
        pickup_loop=contour,
        I_fc="1 mA",
    )
    assert by_coords[0] == pytest.approx(by_name[0], rel=1e-9)
    with pytest.raises(KeyError):
        susceptibility_scan(
            sample_disk,
            squid_solution=mini_squid_solution,
            positions=p,
            squid_height=1.0,
            pickup_loop="nope",
            I_fc="1 mA",
        )
