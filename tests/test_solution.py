import h5py
import numpy as np
import pytest

import superscreen_tpu as sc
import superscreen_tpu.geometry as geo


@pytest.fixture(scope="module")
def device():
    layers = [
        sc.Layer("layer0", london_lambda=1, thickness=0.1, z0=0),
        sc.Layer("layer1", london_lambda=2, thickness=0.05, z0=0.5),
    ]
    films = [
        sc.Polygon("disk", layer="layer0", points=geo.circle(5, points=80)),
        sc.Polygon("ring", layer="layer1", points=geo.circle(4, points=80)),
    ]
    holes = [
        sc.Polygon("ring_hole", layer="layer1", points=geo.circle(2, points=50)),
    ]
    device = sc.Device(
        "device", layers=layers, films=films, holes=holes, solve_dtype="float64"
    )
    device.make_mesh(min_points=1200, max_edge_length=0.5)
    return device


@pytest.fixture(scope="module")
def solution(device):
    solutions = sc.solve(
        device=device,
        applied_field=sc.sources.ConstantField(1.0),
        circulating_currents={"ring_hole": "100 uA"},
        field_units="mT",
        current_units="uA",
        iterations=2,
        progress_bar=False,
    )
    return solutions[-1]


def test_solution_attributes(solution):
    assert set(solution.film_solutions) == {"disk", "ring"}
    assert solution.field_units == "mT"
    assert solution.current_units == "uA"
    assert solution.time_created is not None
    assert "superscreen_tpu" in solution.version_info
    fs = solution.film_solutions["disk"]
    assert fs.total_field.shape == fs.applied_field.shape
    assert fs.field_from_other_films is not None


def test_simply_connected_fluxoid_is_zero(solution):
    """Fluxoid of any region inside a simply-connected film vanishes."""
    rng = np.random.default_rng(0)
    for _ in range(3):
        r = rng.uniform(0.8, 2.0)
        cx, cy = rng.uniform(-1.5, 1.5, size=2)
        poly = geo.circle(r, points=201, center=(cx, cy))
        fluxoid = solution.polygon_fluxoid(poly, film="disk")
        total = sum(fluxoid).to("Phi_0").magnitude
        parts_scale = max(
            abs(fluxoid.flux_part.to("Phi_0").magnitude),
            abs(fluxoid.supercurrent_part.to("Phi_0").magnitude),
            1e-9,
        )
        # Reference tolerance for this invariant is 8e-2
        # (test_solution.py:231-233).
        assert abs(total) / parts_scale < 8e-2


def test_polygon_fluxoid_validation(solution):
    with pytest.raises(ValueError):
        solution.polygon_fluxoid(geo.circle(10), film="disk")


def test_interp_current_density(solution):
    pts = np.array([[0.0, 0.0], [2.0, 1.0], [10.0, 10.0]])
    J = solution.interp_current_density(pts, film="disk")
    assert J.shape == (3, 2)
    assert np.allclose(J[2], 0)  # outside the film
    Jq = solution.interp_current_density(pts, film="disk", with_units=True)
    assert hasattr(Jq, "magnitude")
    Jc = solution.interp_current_density(pts, film="disk", method="cubic")
    assert Jc.shape == (3, 2)


def test_interp_field(solution):
    pts = np.array([[0.0, 0.0], [1.0, 1.0]])
    for dataset in ("field", "self_field", "applied_field", "field_from_other_films"):
        Hz = solution.interp_field(pts, film="disk", dataset=dataset)
        assert Hz.shape == (2,)
    with pytest.raises(ValueError):
        solution.interp_field(pts, film="disk", dataset="bad")


def test_field_at_position_consistency(solution, device):
    """Off-plane field evaluation matches in-plane interpolation near the
    film plane."""
    # At a height well above the disk, field from Biot-Savart should be
    # finite and smooth.
    pts = np.array([[0.0, 0.0], [1.0, 0.0]])
    B = solution.field_at_position(pts, zs=2.0, with_units=False)
    assert np.all(np.isfinite(B))
    # In-plane: total field at mesh sites matches film solution data.
    mesh = device.meshes["disk"]
    idx = mesh.closest_site((0.5, 0.5))
    site = mesh.sites[idx]
    B_plane = solution.field_at_position(
        np.atleast_2d(site), zs=0.0, with_units=False
    )
    expected = solution.film_solutions["disk"].total_field[idx]
    assert np.isclose(np.squeeze(B_plane), expected, rtol=0.05, atol=0.01)


def test_screening_field_dict(solution):
    pts = np.array([[0.0, 0.0], [1.0, 0.0]])
    fields = solution.screening_field_at_position(
        pts, zs=2.0, with_units=False, return_sum=False
    )
    assert set(fields) == {"disk", "ring"}
    vec = solution.screening_field_at_position(
        pts, zs=2.0, vector=True, with_units=False
    )
    assert vec.shape == (2, 3)


def test_vector_potential_field_consistency(solution, device):
    """Bz from the curl of the vector potential matches the direct
    Biot-Savart field above the film (5% of max, as in the reference
    test_solution.py:288-339)."""
    z0 = 1.5
    # Grid of evaluation points above the disk.
    xs = np.linspace(-2, 2, 9)
    ys = np.linspace(-2, 2, 9)
    X, Y = np.meshgrid(xs, ys)
    pts = np.stack([X.ravel(), Y.ravel()], axis=1)
    eps = 1e-3

    def A_at(p):
        return solution.vector_potential_at_position(
            p, zs=z0, with_units=False
        )

    # dAy/dx - dAx/dy via central differences
    Ay_xp = A_at(pts + [eps, 0])[:, 1]
    Ay_xm = A_at(pts - [eps, 0])[:, 1]
    Ax_yp = A_at(pts + [0, eps])[:, 0]
    Ax_ym = A_at(pts - [0, eps])[:, 0]
    Bz_from_A = (Ay_xp - Ay_xm) / (2 * eps) - (Ax_yp - Ax_ym) / (2 * eps)
    Bz_direct = solution.screening_field_at_position(
        pts, zs=z0, with_units=False, units="mT"
    )
    # Convert A-curl from mT*um/um to mT.
    assert np.abs(Bz_from_A - Bz_direct).max() < 0.05 * np.abs(Bz_direct).max()


def test_vector_potential_inside_film_raises(solution):
    pts = np.array([[0.0, 0.0]])
    with pytest.raises(ValueError):
        solution.vector_potential_at_position(pts, zs=0.0)


def test_polygon_flux(solution):
    flux = solution.polygon_flux("disk")
    assert hasattr(flux, "magnitude")
    flux_val = solution.polygon_flux("disk", units="Phi_0", with_units=False)
    assert np.isfinite(flux_val)
    with pytest.raises(ValueError):
        solution.polygon_flux("unknown")


def test_solution_hdf5_roundtrip(solution, tmp_path):
    path = tmp_path / "solution.h5"
    solution.to_hdf5(path)
    loaded = sc.Solution.from_hdf5(path)
    assert loaded.equals(solution)
    assert loaded == solution  # including timestamp
    assert np.allclose(
        loaded.film_solutions["disk"].stream,
        solution.film_solutions["disk"].stream,
    )


def test_save_load_solutions(device, tmp_path):
    solutions = sc.solve(
        device=device,
        applied_field=sc.sources.ConstantField(0.5),
        field_units="mT",
        current_units="uA",
        iterations=2,
        progress_bar=False,
    )
    path = tmp_path / "solutions.h5"
    sc.Solution.save_solutions(solutions, path)
    loaded = sc.Solution.load_solutions(path)
    assert len(loaded) == len(solutions)
    for a, b in zip(loaded, solutions):
        assert a.equals(b)


def test_incremental_save(device, tmp_path):
    path = tmp_path / "incremental.h5"
    solutions = sc.solve(
        device=device,
        applied_field=sc.sources.ConstantField(0.5),
        field_units="mT",
        current_units="uA",
        iterations=1,
        save_path=path,
        progress_bar=False,
    )
    with h5py.File(path, "r") as f:
        assert "0" in f and "1" in f and "device" in f
    loaded = sc.Solution.load_solutions(path)
    assert len(loaded) == 2
    assert loaded[-1].equals(solutions[-1])


def test_positional_apis_accept_lists(solution):
    """All position-taking APIs accept plain Python lists (the reference
    coerces array-likes)."""
    film = list(solution.device.films)[0]
    solution.current_through_path(
        [[2.5, 0.0], [3.9, 0.0]], film=film, units="uA"
    )
    solution.interp_current_density([[3.0, 0.0]], film=film)
    solution.interp_field([[3.0, 0.0]], film=film)
    solution.field_at_position([[0.5, 0.5]], zs=2.0)
    solution.vector_potential_at_position([[0.5, 0.5]], zs=2.0)
    solution.screening_field_at_position([[0.5, 0.5]], zs=2.0)


def test_current_through_two_point_path(solution):
    """A two-point path is a valid cross-section (midpoint rule; the
    reference's trapezoid over per-edge products returns exactly 0 here)."""
    I2 = solution.current_through_path(
        [[2.2, 0.0], [3.9, 0.0]], film="ring", units="uA", with_units=False
    )
    Imany = solution.current_through_path(
        np.stack([np.linspace(2.2, 3.9, 60), np.zeros(60)], axis=1),
        film="ring",
        units="uA",
        with_units=False,
    )
    assert I2 != 0.0
    assert np.isclose(I2, Imany, rtol=0.1)


def test_mixed_z_field_query(solution, device):
    """A batch mixing an in-plane in-film point with an off-plane point
    must treat each point by its own z (regression: the in-plane point
    previously fell through to the singular dz=0 Biot-Savart sum)."""
    mesh = device.meshes["disk"]
    idx = mesh.closest_site((0.5, 0.5))
    site = mesh.sites[idx]
    mixed = np.array([[site[0], site[1], 0.0], [site[0], site[1], 2.0]])
    B_mixed = np.asarray(solution.field_at_position(mixed, with_units=False))
    B_plane = float(
        np.squeeze(
            solution.field_at_position(
                np.atleast_2d(site), zs=0.0, with_units=False
            )
        )
    )
    B_above = float(
        np.squeeze(
            solution.field_at_position(
                np.atleast_2d(site), zs=2.0, with_units=False
            )
        )
    )
    np.testing.assert_allclose(B_mixed, [B_plane, B_above], rtol=1e-10)


def test_zs_required_for_2d_positions(solution):
    with pytest.raises(ValueError, match="zs must be provided"):
        solution.field_at_position(np.array([[0.0, 0.0]]))


def test_factorized_model_validation_and_copy(device):
    """Misspelled drive names raise instead of being silently dropped;
    conservation tolerates float rounding; copy() is drive-independent."""
    with pytest.raises(KeyError, match="not in device.holes"):
        sc.factorize_model(
            device=device, current_units="uA", circulating_currents={"typo": 1.0}
        )
    model = sc.factorize_model(
        device=device,
        current_units="uA",
        circulating_currents={"ring_hole": 1.0},
    )
    m2 = model.copy()
    m2.set_circulating_currents({"ring_hole": 5.0})
    assert model.circulating_currents["ring_hole"] == 1.0
    assert model.film_info["ring"].circulating_currents["ring_hole"] == 1.0
    assert m2.film_info["ring"].circulating_currents["ring_hole"] == 5.0
    # set_vortices on the copy validates placement and leaves the original.
    with pytest.raises(ValueError):
        m2.set_vortices([sc.Vortex(x=100.0, y=0.0, film="disk")])
    m2.set_vortices([sc.Vortex(x=0.5, y=0.0, film="disk")])
    assert len(model.film_info["disk"].vortices) == 0
    assert len(m2.film_info["disk"].vortices) == 1


def test_terminal_currents_validation():
    strip = sc.Device(
        "strip",
        layers=[sc.Layer("L", Lambda=1.0, z0=0)],
        films=[
            sc.Polygon(
                "strip", layer="L", points=geo.box(4.0, 8.0, points=201)
            )
        ],
        terminals={
            "strip": [
                sc.Polygon("source", points=geo.box(4.0, 0.1, center=(0, 4.0))),
                sc.Polygon("d1", points=geo.box(1.5, 0.1, center=(-1, -4.0))),
                sc.Polygon("d2", points=geo.box(1.5, 0.1, center=(1, -4.0))),
            ]
        },
        length_units="um",
    )
    strip.make_mesh(min_points=800, smooth=2, preserve_boundary=True)
    with pytest.raises(KeyError, match="unknown terminals"):
        sc.factorize_model(
            device=strip,
            current_units="mA",
            terminal_currents={"strip": {"sourcee": 1.0, "d1": -1.0}},
        )
    with pytest.raises(KeyError, match="no terminals"):
        sc.factorize_model(
            device=strip,
            current_units="mA",
            terminal_currents={"stripp": {"source": 1.0, "d1": -1.0}},
        )
    with pytest.raises(ValueError, match="not conserved"):
        sc.factorize_model(
            device=strip,
            current_units="mA",
            terminal_currents={"strip": {"source": 1.0, "d1": -0.5}},
        )
    # Conserved up to float rounding: 0.1 + 0.2 - 0.3 != 0 exactly.
    sc.factorize_model(
        device=strip,
        current_units="mA",
        terminal_currents={"strip": {"source": 0.1, "d1": 0.2, "d2": -0.3}},
    )
