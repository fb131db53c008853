"""Scanning-source sweeps (BASELINE config 5): trapped vortex + a source
position sweep executed as one batched solve."""

import numpy as np
import pytest

import superscreen_tpu as sc
import superscreen_tpu.geometry as geo
from superscreen_tpu.sweep import solve_many


@pytest.fixture(scope="module")
def device():
    layers = [sc.Layer("base", Lambda=1, z0=0)]
    films = [sc.Polygon("ring", layer="base", points=geo.circle(4, points=60))]
    holes = [sc.Polygon("hole", layer="base", points=geo.circle(1.5, points=40))]
    device = sc.Device(
        "scan", layers=layers, films=films, holes=holes, solve_dtype="float64"
    )
    device.make_mesh(max_edge_length=0.5)
    return device


def test_position_sweep_matches_loop(device):
    """A monopole-source position sweep solved as one batch matches the
    per-position solve loop."""
    positions = [(0.0, 0.0), (2.0, 0.0), (0.0, -2.5)]
    fields = [
        sc.sources.MonopoleField(r0=(x, y, 1.5)) for (x, y) in positions
    ]
    model = sc.factorize_model(device=device, current_units="uA")
    result = solve_many(
        model=model,
        applied_fields=fields,
        field_units="mT",
        iterations=0,
    )
    assert len(result) == len(positions)
    for i, f in enumerate(fields):
        ref = sc.solve(
            model=model,
            applied_field=f,
            field_units="mT",
            progress_bar=False,
        )[-1]
        sol = result.solution(i)
        a = ref.film_solutions["ring"].stream
        b = sol.film_solutions["ring"].stream
        assert np.abs(a - b).max() < 1e-10 * max(np.abs(a).max(), 1e-30)


def test_scanning_response_map_with_vortex(device):
    """A response map over source positions with a trapped vortex: the
    vortex contribution is position-independent and the source response
    decays with distance."""
    vortex = sc.Vortex(x=2.5, y=0, film="ring", nPhi0=1)
    xs = np.linspace(-2, 2, 5)
    fields = [sc.sources.MonopoleField(r0=(x, 0.0, 1.0)) for x in xs]

    def scan(vortices):
        model = sc.factorize_model(
            device=device, current_units="uA", vortices=vortices
        )
        result = solve_many(
            model=model, applied_fields=fields, field_units="mT", iterations=0
        )
        return np.array(
            [
                sum(result.solution(i).hole_fluxoid("hole")).to("Phi_0").magnitude
                for i in range(len(xs))
            ]
        )

    with_vortex = scan([vortex])
    without_vortex = scan([])
    assert np.all(np.isfinite(with_vortex))
    # The trapped vortex adds a position-independent offset to the map.
    offsets = with_vortex - without_vortex
    assert np.allclose(offsets, offsets[0], rtol=1e-9, atol=1e-12)
    # Symmetric scan line over a centered hole: symmetric up to mesh
    # discretization (~1%).
    assert np.allclose(without_vortex, without_vortex[::-1], rtol=2e-2)


def test_batched_circulating_current_sweep(device):
    """Sweeping circulating currents batches as rank-1 updates."""
    model = sc.factorize_model(device=device, current_units="uA")
    currents = [0.0, 10.0, 20.0]
    result = solve_many(
        model=model,
        applied_fields=[sc.sources.ConstantField(0)] * len(currents),
        circulating_currents=[{"hole": c} for c in currents],
        field_units="mT",
    )
    s = result.streams["ring"]
    # Linearity in the circulating current.
    assert np.allclose(s[2], 2 * s[1], rtol=1e-9, atol=1e-12)
    assert np.allclose(s[0], 0, atol=1e-12)
