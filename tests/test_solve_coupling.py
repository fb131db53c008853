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
