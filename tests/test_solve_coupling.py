"""Tests for the coupling dispatch in the public ``solve()`` entry point
(exact / fft / auto), mirroring ``solve_many``'s dispatch.  Reference
inter-film hot loop: ``solver/solve.py:28-73``."""

import numpy as np
import pytest

import superscreen_tpu as sc
import superscreen_tpu.geometry as geo


@pytest.fixture(scope="module")
def stacked_disks():
    layers = [
        sc.Layer("layer0", Lambda=1.0, z0=0),
        sc.Layer("layer1", Lambda=0.5, z0=1.0),
    ]
    films = [
        sc.Polygon("disk0", layer="layer0", points=geo.circle(5.0, points=90)),
        sc.Polygon("disk1", layer="layer1", points=geo.circle(4.0, points=80)),
    ]
    device = sc.Device(
        "stack", layers=layers, films=films, solve_dtype="float64"
    )
    device.make_mesh(max_edge_length=0.5)
    return device


def _streams(solutions):
    sol = solutions[-1]
    return {
        name: np.asarray(fs.stream) for name, fs in sol.film_solutions.items()
    }


def test_solve_fft_matches_exact(stacked_disks):
    kwargs = dict(
        applied_field=sc.sources.ConstantField(1.0),
        field_units="mT",
        iterations=3,
        progress_bar=False,
    )
    g_exact = _streams(sc.solve(stacked_disks, coupling="exact", **kwargs))
    g_fft = _streams(sc.solve(stacked_disks, coupling="fft", **kwargs))
    for name in g_exact:
        scale = np.max(np.abs(g_exact[name]))
        err = np.max(np.abs(g_exact[name] - g_fft[name])) / scale
        # FFT wraparound at default padding bounds the agreement (~7e-3
        # per coupling application, docs/COUPLING.md).
        assert err < 2e-2, f"{name}: {err}"


def test_solve_fft_matches_exact_legacy_path(stacked_disks, monkeypatch):
    monkeypatch.setenv("SUPERSCREEN_TPU_DEVICE_SOLVE", "0")
    kwargs = dict(
        applied_field=sc.sources.ConstantField(1.0),
        field_units="mT",
        iterations=3,
        progress_bar=False,
    )
    g_exact = _streams(sc.solve(stacked_disks, coupling="exact", **kwargs))
    g_fft = _streams(sc.solve(stacked_disks, coupling="fft", **kwargs))
    for name in g_exact:
        scale = np.max(np.abs(g_exact[name]))
        err = np.max(np.abs(g_exact[name] - g_fft[name])) / scale
        assert err < 2e-2, f"{name}: {err}"


def test_solve_auto_defaults_to_exact_on_small_meshes(stacked_disks):
    kwargs = dict(
        applied_field=sc.sources.ConstantField(1.0),
        field_units="mT",
        iterations=2,
        progress_bar=False,
    )
    g_auto = _streams(sc.solve(stacked_disks, coupling="auto", **kwargs))
    g_exact = _streams(sc.solve(stacked_disks, coupling="exact", **kwargs))
    for name in g_auto:
        np.testing.assert_allclose(g_auto[name], g_exact[name], rtol=0, atol=0)


def test_solve_rejects_bad_coupling(stacked_disks):
    with pytest.raises(ValueError, match="coupling"):
        sc.solve(
            stacked_disks,
            applied_field=sc.sources.ConstantField(1.0),
            coupling="nope",
            progress_bar=False,
        )


def test_solve_fft_rejects_coincident_layers():
    layers = [
        sc.Layer("layer0", Lambda=1.0, z0=0),
        sc.Layer("layer1", Lambda=0.5, z0=0),
    ]
    films = [
        sc.Polygon("d0", layer="layer0", points=geo.circle(3.0, points=50)),
        sc.Polygon("d1", layer="layer1", points=geo.circle(2.0, points=40)),
    ]
    device = sc.Device("flat", layers=layers, films=films)
    device.make_mesh(max_edge_length=0.6)
    with pytest.raises(ValueError, match="distinct layer heights"):
        sc.solve(
            device,
            applied_field=sc.sources.ConstantField(1.0),
            iterations=2,
            coupling="fft",
            progress_bar=False,
        )


def test_friendly_grid_size_properties():
    from superscreen_tpu.ops.fft_coupling import friendly_grid_size

    for n in (3, 7, 100, 513, 1025, 1125, 1300, 2049, 5000):
        g = friendly_grid_size(n)
        assert g >= n
        assert g % 2 == 0
        k = g
        for p in (2, 3, 5):
            while k % p == 0:
                k //= p
        assert k == 1, (n, g)
        # Never more than 25% overshoot in the tested range (the
        # power-of-two snap it replaces overshoots up to 100%).
        assert g <= 1.25 * n + 2, (n, g)


def test_subgrid_spectrum_matches_full_grid_interpolation(stacked_disks):
    """The subgrid mesh->grid interpolation + zero-pad must reproduce the
    straightforward full-grid barycentric interpolation exactly."""
    import jax.numpy as jnp
    import matplotlib.tri as mtri

    from superscreen_tpu.ops.fft_coupling import (
        build_film_grid_data,
        fft_source_spectrum,
    )

    device = stacked_disks
    grids = build_film_grid_data(device)
    name = "disk0"
    mesh = device.meshes[name]
    n = len(mesh.sites)
    rng = np.random.default_rng(11)
    g = rng.standard_normal((2, n))

    spec = np.asarray(fft_source_spectrum(grids[name], jnp.asarray(g)))

    # Independent reference: full-grid matplotlib linear interpolation
    # (0 outside the film), same grid axes as _grid_axes builds.
    G = grids[name].kmag.shape[0]
    all_sites = [m.sites for m in device.meshes.values()]
    mins = np.min([s.min(axis=0) for s in all_sites], axis=0)
    maxs = np.max([s.max(axis=0) for s in all_sites], axis=0)
    center = 0.5 * (mins + maxs)
    span = float((maxs - mins).max()) * 3.0
    x = center[0] - span / 2 + np.arange(G) * (span / G)
    y = center[1] - span / 2 + np.arange(G) * (span / G)
    XX, YY = np.meshgrid(x, y, indexing="ij")
    tri = mesh.triangulation
    for b in range(2):
        interp = mtri.LinearTriInterpolator(tri, g[b])
        vals = np.asarray(interp(XX.ravel(), YY.ravel()).filled(0.0))
        ref_spec = np.fft.rfft2(vals.reshape(G, G))
        err = np.max(np.abs(spec[b] - ref_spec)) / np.max(np.abs(ref_spec))
        assert err < 5e-6, err
