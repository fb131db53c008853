import h5py
import numpy as np
import pytest

import superscreen_tpu as sc
import superscreen_tpu.geometry as geo


@pytest.fixture(scope="module")
def device():
    layers = [sc.Layer("layer1", london_lambda=0.5, thickness=0.05, z0=0.5)]
    films = [sc.Polygon("ring", layer="layer1", points=geo.circle(4))]
    holes = [sc.Polygon("ring_hole", layer="layer1", points=geo.circle(2))]
    device = sc.Device(
        "device", layers=layers, films=films, holes=holes, solve_dtype="float64"
    )
    device.make_mesh(max_edge_length=0.22)
    return device


@pytest.fixture(scope="module")
def two_rings():
    inner_radius = 2.5
    outer_radius = 5
    layers = [
        sc.Layer("layer0", Lambda=1, z0=0),
        sc.Layer("layer1", Lambda=1, z0=1),
    ]
    films = [
        sc.Polygon(
            "big_ring", layer="layer0", points=geo.circle(1.5 * outer_radius, points=100)
        ),
        sc.Polygon(
            "little_ring", layer="layer1", points=geo.circle(outer_radius, points=80)
        ),
    ]
    holes = [
        sc.Polygon(
            "big_hole", layer="layer0", points=geo.circle(1.5 * inner_radius, points=60)
        ),
        sc.Polygon(
            "little_hole", layer="layer1", points=geo.circle(inner_radius, points=50)
        ),
    ]
    device = sc.Device(
        "two_rings",
        layers=layers,
        films=films,
        holes=holes,
        solve_dtype="float64",
    )
    device.make_mesh(max_edge_length=0.65)
    return device


@pytest.mark.parametrize(
    "pre_factorize, inhomogeneous",
    [(False, False), (True, True)],
)
def test_current_value(device, pre_factorize, inhomogeneous, tmp_path):
    applied_field = sc.sources.ConstantField(0)
    circulating_currents = {"ring_hole": "1 mA"}

    old_lambda = device.layers["layer1"].london_lambda
    try:
        if inhomogeneous:

            def linear(x, y, offset=0):
                return offset + 0.1 * ((y - y.min()) + (x - x.min()))

            device.layers["layer1"].london_lambda = sc.Parameter(
                linear, offset=old_lambda
            )
        if pre_factorize:
            model = sc.factorize_model(
                device=device,
                circulating_currents=circulating_currents,
                current_units="uA",
            )
            model_save_path = tmp_path / "model.h5"
            with h5py.File(model_save_path, "x") as h5file:
                model.to_hdf5(h5file)
            with h5py.File(model_save_path, "r") as h5file:
                model = sc.FactorizedModel.from_hdf5(h5file)
            solutions = sc.solve(
                model=model,
                applied_field=applied_field,
                field_units="mT",
                progress_bar=False,
            )
        else:
            solutions = sc.solve(
                device=device,
                applied_field=applied_field,
                circulating_currents=circulating_currents,
                field_units="mT",
                current_units="uA",
                progress_bar=False,
            )
    finally:
        device.layers["layer1"].london_lambda = old_lambda

    assert isinstance(solutions, list)
    assert len(solutions) == 1
    solution = solutions[0]
    xs = np.linspace(1.9, 4.1, 1001)
    positions = np.stack([xs, np.zeros_like(xs)], axis=1)
    rtol = 5e-2
    for angle, axis in [(0, 1), (90, 0), (180, 1), (270, 0)]:
        coords = sc.geometry.rotate(positions, angle)
        current = solution.current_through_path(
            coords, film="ring", units="uA", with_units=False
        )
        assert np.isclose(abs(current), 1000, rtol=rtol)
        j = solution.interp_current_density(
            coords, film="ring", units="uA / um", with_units=False
        )
        dr = np.linalg.norm(np.diff(coords, axis=0), axis=1)
        current = np.sum(j[1:, axis] * dr)
        assert np.isclose(abs(current), 1000, rtol=rtol)


def test_invalid_vortex_args(device):
    with pytest.raises(TypeError):
        _ = sc.solve(device=device, vortices=[0, 1, 2], progress_bar=False)
    with pytest.raises(KeyError):
        _ = sc.solve(
            device=device,
            vortices=[sc.Vortex(x=3.5, y=0, film="invalid")],
            progress_bar=False,
        )
    # Vortex in hole
    with pytest.raises(ValueError):
        _ = sc.solve(
            device=device,
            vortices=[sc.Vortex(x=0, y=0, film="ring")],
            progress_bar=False,
        )
    # Vortex outside film
    with pytest.raises(ValueError):
        _ = sc.solve(
            device=device,
            vortices=[sc.Vortex(x=10, y=0, film="ring")],
            progress_bar=False,
        )


def test_vortex_flux(device):
    """The fluxoid of a region enclosing a vortex equals nPhi0 Phi_0."""
    vortex = sc.Vortex(x=3.0, y=0, film="ring", nPhi0=1)
    solution = sc.solve(
        device=device,
        vortices=[vortex],
        current_units="uA",
        field_units="mT",
        progress_bar=False,
    )[-1]
    # Fluxoid around a small polygon containing the vortex.
    poly = geo.circle(0.6, points=201, center=(3.0, 0))
    fluxoid = solution.polygon_fluxoid(poly, film="ring")
    total = sum(fluxoid).to("Phi_0").magnitude
    assert np.isclose(total, 1.0, rtol=0.1)


def test_mutual_inductance_symmetry(two_rings):
    M = two_rings.mutual_inductance_matrix(
        units="pH", iterations=3, progress_bar=False
    )
    m = np.asarray(M.magnitude)
    assert m.shape == (2, 2)
    assert np.isclose(m[0, 1], m[1, 0], rtol=5e-2)
    # Self-inductances are positive and larger than the mutual.
    assert m[0, 0] > 0 and m[1, 1] > 0
    assert m[0, 0] > abs(m[0, 1])


def test_mutual_inductance_all_iterations(two_rings):
    Ms = two_rings.mutual_inductance_matrix(
        units="pH", iterations=2, all_iterations=True, progress_bar=False
    )
    assert len(Ms) == 3
    # Self-inductance converges.
    last = np.asarray(Ms[-1].magnitude)
    prev = np.asarray(Ms[-2].magnitude)
    assert np.allclose(last, prev, rtol=0.2)


def test_fluxoid_quantization(device):
    model = sc.factorize_model(
        device=device, current_units="uA", circulating_currents={}
    )
    for target in (0.0, 1.0):
        solution = sc.find_fluxoid_solution(
            model, fluxoids={"ring_hole": target}, progress_bar=False
        )
        fluxoid = solution.hole_fluxoid("ring_hole")
        total = sum(fluxoid).to("Phi_0").magnitude
        assert np.isclose(total, target, atol=2e-3)


def test_find_fluxoid_solution_accepts_device(device):
    # Beyond-reference convenience: a meshed Device is factorized on the
    # fly (the reference requires a FactorizedModel, fluxoid.py:55-56).
    solution = sc.find_fluxoid_solution(
        device, fluxoids={"ring_hole": 0.0}, progress_bar=False
    )
    total = sum(solution.hole_fluxoid("ring_hole")).to("Phi_0").magnitude
    assert np.isclose(total, 0.0, atol=2e-3)


def test_fluxoid_with_applied_field(device):
    model = sc.factorize_model(
        device=device, current_units="uA", circulating_currents={}
    )
    solution = sc.find_fluxoid_solution(
        model,
        fluxoids={"ring_hole": 0.0},
        applied_field=sc.sources.ConstantField(0.5),
        field_units="mT",
        progress_bar=False,
    )
    total = sum(solution.hole_fluxoid("ring_hole")).to("Phi_0").magnitude
    assert np.isclose(total, 0.0, atol=5e-3)


def test_bad_applied_field(device):
    def bad_field(x, y, z):
        return np.ones((len(x), 2))

    with pytest.raises(ValueError):
        sc.solve(device=device, applied_field=bad_field, progress_bar=False)


def test_solve_without_mesh():
    layers = [sc.Layer("layer1", Lambda=1)]
    films = [sc.Polygon("disk", layer="layer1", points=geo.circle(1))]
    dev = sc.Device("nomesh", layers=layers, films=films)
    with pytest.raises(ValueError):
        sc.solve(device=dev, progress_bar=False)


def test_model_mutation_guards(device):
    model = sc.factorize_model(
        device=device, current_units="uA", circulating_currents={}
    )
    with pytest.raises(ValueError):
        sc.solve(device=device, model=model, progress_bar=False)
    with pytest.raises(KeyError):
        model.set_circulating_currents({"unknown_hole": 1.0})
    model.set_circulating_currents({"ring_hole": 5.0})
    assert model.circulating_currents == {"ring_hole": 5.0}
    model.set_vortices([sc.Vortex(x=3, y=0, film="ring")])
    assert len(model.vortices["ring"]) == 1


def test_terminal_current_conservation_error():
    layers = [sc.Layer("layer1", Lambda=1)]
    films = [sc.Polygon("strip", layer="layer1", points=geo.box(4, 2, points=60))]
    source = sc.Polygon("source", points=geo.box(0.1, 2, points=20, center=(-2, 0)))
    drain = sc.Polygon("drain", points=geo.box(0.1, 2, points=20, center=(2, 0)))
    dev = sc.Device(
        "strip_dev",
        layers=layers,
        films=films,
        terminals={"strip": [source, drain]},
        solve_dtype="float64",
    )
    dev.make_mesh(max_edge_length=0.4)
    with pytest.raises(ValueError):
        sc.factorize_model(
            device=dev,
            current_units="uA",
            terminal_currents={"strip": {"source": 1.0, "drain": 0.0}},
        )


def test_non_1d_applied_field_raises(device):
    """The reference raises for applied fields that don't evaluate to a 1D
    vector (solver/solve.py:431-435)."""

    def bad_field(x, y, z):
        return np.ones((len(np.atleast_1d(x)), 2))

    with pytest.raises(ValueError):
        sc.solve(device=device, applied_field=bad_field, progress_bar=False)


def test_check_inversion_matches_fast_path(device):
    """check_inversion routes through the legacy per-stage path; the
    results must match the device-resident path."""
    fast = sc.solve(
        device=device,
        applied_field=sc.sources.ConstantField(0.5),
        field_units="mT",
        progress_bar=False,
    )[-1]
    checked = sc.solve(
        device=device,
        applied_field=sc.sources.ConstantField(0.5),
        field_units="mT",
        check_inversion=True,
        progress_bar=False,
    )[-1]
    a = fast.film_solutions["ring"].stream
    b = checked.film_solutions["ring"].stream
    assert np.abs(a - b).max() < 1e-10 * np.abs(a).max()


def test_sweep_prewarm_noop_on_cpu(monkeypatch):
    """_start_sweep_prewarm must not spawn threads on the CPU backend or
    when disabled -- the prewarm only pays on a single tunneled TPU, and
    a surprise daemon thread in CPU test/CI runs would be pure noise."""
    import threading

    import importlib

    solve_mod = importlib.import_module("superscreen_tpu.solver.solve")

    spawned = []
    real_thread = threading.Thread

    class SpyThread(real_thread):
        def __init__(self, *args, **kwargs):
            spawned.append(kwargs.get("target"))
            super().__init__(*args, **kwargs)

    monkeypatch.setattr(threading, "Thread", SpyThread)
    # CPU backend (the tests run on CPU): guard returns before threading.
    solve_mod._start_sweep_prewarm(object())
    assert spawned == []
    # Explicit opt-out must also return early regardless of backend.
    monkeypatch.setenv("SUPERSCREEN_TPU_PREWARM_SWEEP", "0")
    solve_mod._start_sweep_prewarm(object())
    assert spawned == []
