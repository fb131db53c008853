import matplotlib.pyplot as plt
import numpy as np
import pytest

import superscreen_tpu as sc
import superscreen_tpu.geometry as geo
from superscreen_tpu.visualization import (
    auto_grid,
    auto_range_iqr,
    cross_section,
    grids_to_vecs,
    non_gui_backend,
    plot_currents,
    plot_field_at_positions,
    plot_fields,
    plot_mutual_inductance,
    plot_polygon_flux,
    plot_streams,
)


@pytest.fixture(scope="module")
def solutions():
    layers = [
        sc.Layer("layer0", Lambda=1, z0=0),
        sc.Layer("layer1", Lambda=2, z0=0.5),
    ]
    films = [
        sc.Polygon("disk", layer="layer0", points=geo.circle(4, points=50)),
        sc.Polygon("ring", layer="layer1", points=geo.circle(3, points=50)),
    ]
    holes = [
        sc.Polygon("hole", layer="layer1", points=geo.circle(1.2, points=30)),
    ]
    device = sc.Device(
        "device", layers=layers, films=films, holes=holes, solve_dtype="float64"
    )
    device.make_mesh(min_points=600)
    return sc.solve(
        device=device,
        applied_field=sc.sources.ConstantField(0.5),
        circulating_currents={"hole": "50 uA"},
        field_units="mT",
        current_units="uA",
        iterations=1,
        progress_bar=False,
    )


@pytest.fixture(scope="module")
def solution(solutions):
    return solutions[-1]


def test_auto_grid():
    with non_gui_backend():
        fig, axes = auto_grid(5, max_cols=2)
        assert len(fig.axes) == 5
        plt.close("all")


def test_auto_range_iqr():
    rng = np.random.default_rng(0)
    data = rng.normal(size=1000)
    vmin, vmax = auto_range_iqr(data)
    assert vmin < vmax
    data_outliers = np.concatenate([data, [1000.0]])
    vmin2, vmax2 = auto_range_iqr(data_outliers)
    assert vmax2 < 1000


def test_grids_to_vecs():
    xg, yg = np.meshgrid(np.arange(3), np.arange(4))
    xs, ys = grids_to_vecs(xg, yg)
    assert np.array_equal(xs, np.arange(3))
    assert np.array_equal(ys, np.arange(4))


def test_cross_section(solution):
    mesh = solution.device.meshes["disk"]
    values = solution.film_solutions["disk"].total_field
    coords = np.stack([np.linspace(-2, 2, 50), np.zeros(50)], axis=1)
    paths, dists, sections = cross_section(mesh.sites, values, coords)
    assert len(paths) == 1
    assert sections[0].shape == (50,)


@pytest.mark.parametrize("shading", ["flat", "gouraud"])
def test_plot_streams(solution, shading):
    with non_gui_backend():
        fig, axes = plot_streams(solution, shading=shading)
        plt.close("all")


@pytest.mark.parametrize(
    "dataset", ["field", "self_field", "applied_field", "field_from_other_films"]
)
def test_plot_fields(solution, dataset):
    with non_gui_backend():
        fig, axes = plot_fields(
            solution, dataset=dataset, auto_range_cutoff=1
        )
        plt.close("all")


def test_plot_fields_options(solution):
    with non_gui_backend():
        coords = np.stack([np.linspace(-2, 2, 30), np.zeros(30)], axis=1)
        fig, axes = plot_fields(
            solution,
            films=["disk"],
            normalize=True,
            share_color_scale=True,
            symmetric_color_scale=True,
            cross_section_coords=coords,
        )
        plt.close("all")


@pytest.mark.parametrize("streamplot", [False, True])
def test_plot_currents(solution, streamplot):
    with non_gui_backend():
        fig, axes = plot_currents(
            solution, streamplot=streamplot, units="mA/um"
        )
        plt.close("all")


def test_plot_field_at_positions(solution):
    with non_gui_backend():
        xs = np.linspace(-5, 5, 30)
        X, Y = np.meshgrid(xs, xs)
        pts = np.stack([X.ravel(), Y.ravel()], axis=1)
        fig, axes = plot_field_at_positions(solution, pts, zs=1.5)
        plt.close("all")


def test_plot_mutual_inductance():
    rng = np.random.default_rng(0)
    base = np.array([[10.0, -2.0], [-2.0, 8.0]])
    Ms = [base * (1 + 0.1 * 0.5**k) for k in range(4)]
    with non_gui_backend():
        fig, ax = plot_mutual_inductance(Ms, diff=False)
        fig, ax = plot_mutual_inductance(Ms, diff=True, logy=True)
        fig, ax = plot_mutual_inductance(Ms, diff=True, absolute=True)
        plt.close("all")


def test_plot_polygon_flux(solutions):
    with non_gui_backend():
        fig, ax = plot_polygon_flux(solutions)
        fig, ax = plot_polygon_flux(solutions, diff=True, logy=True)
        plt.close("all")


def test_solution_plot_aliases(solution):
    with non_gui_backend():
        solution.plot_streams()
        solution.plot_fields()
        solution.plot_currents()
        xs = np.linspace(-4, 4, 20)
        X, Y = np.meshgrid(xs, xs)
        pts = np.stack([X.ravel(), Y.ravel()], axis=1)
        solution.plot_field_at_positions(pts, zs=2.0)
        plt.close("all")


def test_device_plots(solution):
    with non_gui_backend():
        solution.device.plot_polygons(legend=True)
        solution.device.plot_mesh()
        solution.device.draw()
        solution.device.draw(subplots=True, legend=True)
        plt.close("all")
