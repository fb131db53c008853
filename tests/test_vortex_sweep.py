"""Batched vortex-amplitude sweeps: solve_many(vortex_nPhi0=...).

Vortex positions are declared once (their response columns are part of
the factorization); per-sweep-point amplitudes then sweep winding-number
states or, with one-hot rows, the vortex position over the candidate
sites -- all in one batched solve. The reference package needs a full
re-solve per vortex configuration.
"""

import numpy as np
import pytest

import superscreen_tpu as sc
from superscreen_tpu.sweep import solve_many


@pytest.fixture(scope="module")
def disk_device():
    device = sc.Device(
        "disk",
        layers=[sc.Layer("base", Lambda=0.5, z0=0)],
        films=[
            sc.Polygon("disk", layer="base", points=sc.geometry.circle(3, points=80))
        ],
        length_units="um",
        solve_dtype="float64",
    )
    device.make_mesh(min_points=1500, smooth=5)
    return device


CANDIDATES = [(1.0, 0.0), (-0.8, 0.6)]


def _vortices(amps=(1.0, 1.0)):
    return [
        sc.Vortex(x=x, y=y, film="disk", nPhi0=a)
        for (x, y), a in zip(CANDIDATES, amps)
    ]


def test_vortex_amplitude_sweep_matches_solve(disk_device):
    amps = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [2.0, -1.0]])
    B = len(amps)
    n = len(disk_device.meshes["disk"].sites)
    result = solve_many(
        device=disk_device,
        vortices=_vortices(),
        applied_field_arrays={"disk": np.full((B, n), 0.2)},
        field_units="mT",
        current_units="uA",
        vortex_nPhi0=amps,
    )
    for b in range(B):
        vs = [
            sc.Vortex(x=x, y=y, film="disk", nPhi0=float(a))
            for (x, y), a in zip(CANDIDATES, amps[b])
            if a != 0
        ]
        sol = sc.solve(
            disk_device,
            applied_field=sc.sources.ConstantField(0.2),
            vortices=vs,
            field_units="mT",
            current_units="uA",
            progress_bar=False,
        )[-1]
        g_ref = np.asarray(sol.film_solutions["disk"].stream)
        g_b = np.asarray(result.streams["disk"][b])
        assert np.abs(g_b - g_ref).max() <= 1e-10 * np.abs(g_ref).max()
        # Materialized solutions carry the per-point amplitudes.
        got = [v.nPhi0 for v in result.solution(b).vortices]
        np.testing.assert_allclose(got, amps[b])


def test_vortex_position_sweep_one_hot(disk_device):
    """One-hot amplitude rows sweep the vortex position over candidates."""
    n = len(disk_device.meshes["disk"].sites)
    result = solve_many(
        device=disk_device,
        vortices=_vortices(),
        applied_field_arrays={"disk": np.zeros((2, n))},
        field_units="mT",
        current_units="uA",
        vortex_nPhi0=np.eye(2),
    )
    for b, (x, y) in enumerate(CANDIDATES):
        sol = sc.solve(
            disk_device,
            applied_field=sc.sources.ConstantField(0),
            vortices=[sc.Vortex(x=x, y=y, film="disk", nPhi0=1)],
            field_units="mT",
            current_units="uA",
            progress_bar=False,
        )[-1]
        g_ref = np.asarray(sol.film_solutions["disk"].stream)
        g_b = np.asarray(result.streams["disk"][b])
        assert np.abs(g_b - g_ref).max() <= 1e-10 * np.abs(g_ref).max()


def test_vortex_nphi0_dict_form_and_validation(disk_device):
    n = len(disk_device.meshes["disk"].sites)
    amps = np.array([[1.0, 0.0], [0.0, 1.0]])
    flat = solve_many(
        device=disk_device,
        vortices=_vortices(),
        applied_field_arrays={"disk": np.zeros((2, n))},
        field_units="mT",
        current_units="uA",
        vortex_nPhi0=amps,
    )
    by_film = solve_many(
        device=disk_device,
        vortices=_vortices(),
        applied_field_arrays={"disk": np.zeros((2, n))},
        field_units="mT",
        current_units="uA",
        vortex_nPhi0={"disk": amps},
    )
    np.testing.assert_allclose(
        np.asarray(flat.streams["disk"]), np.asarray(by_film.streams["disk"])
    )
    with pytest.raises(ValueError):
        solve_many(
            device=disk_device,
            vortices=_vortices(),
            applied_field_arrays={"disk": np.zeros((2, n))},
            field_units="mT",
            current_units="uA",
            vortex_nPhi0=np.ones((2, 3)),  # wrong n_vortices
        )
    with pytest.raises(ValueError):
        solve_many(
            device=disk_device,
            vortices=_vortices(),
            applied_field_arrays={"disk": np.zeros((2, n))},
            field_units="mT",
            current_units="uA",
            vortex_nPhi0={"nope": amps},
        )


def test_fixed_vortices_unchanged(disk_device):
    """Without vortex_nPhi0, declared amplitudes behave as before."""
    n = len(disk_device.meshes["disk"].sites)
    result = solve_many(
        device=disk_device,
        vortices=_vortices((2.0, -1.0)),
        applied_field_arrays={"disk": np.zeros((1, n))},
        field_units="mT",
        current_units="uA",
    )
    sol = sc.solve(
        disk_device,
        applied_field=sc.sources.ConstantField(0),
        vortices=_vortices((2.0, -1.0)),
        field_units="mT",
        current_units="uA",
        progress_bar=False,
    )[-1]
    g_ref = np.asarray(sol.film_solutions["disk"].stream)
    g_b = np.asarray(result.streams["disk"][0])
    assert np.abs(g_b - g_ref).max() <= 1e-10 * np.abs(g_ref).max()
