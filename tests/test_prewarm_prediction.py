"""Tests for the make_mesh-time factorization prewarm: the predicted
interior-system size must match what factorize_linear_systems actually
pads (solver/solve_film.py pad_to), and the prewarm hook must fire during
meshing for low-memory films."""

import numpy as np
import pytest

import superscreen_tpu as sc
import superscreen_tpu.geometry as geo
from superscreen_tpu.solver import utils as solver_utils


def _ring_device():
    return sc.Device(
        "ring",
        layers=[sc.Layer("l0", Lambda=1.0, z0=0)],
        films=[sc.Polygon("ring", layer="l0", points=geo.circle(4.0, points=80))],
        holes=[sc.Polygon("hole", layer="l0", points=geo.circle(2.0, points=50))],
    )


def test_predicted_interior_matches_factorize(monkeypatch):
    device = _ring_device()
    device.make_mesh(max_edge_length=0.35)
    # Force the low-memory path so the film has a padded interior system.
    monkeypatch.setattr(solver_utils, "MAX_DENSE_KERNEL_SIZE", 10)
    predicted = device._predicted_interior_size("ring")
    info = solver_utils.make_film_info(
        device=device,
        vortices=[],
        circulating_currents={},
        terminal_currents={},
    )["ring"]
    ix = info.interior_indices
    if info.hole_indices:
        ix = np.setdiff1d(
            ix, np.concatenate(list(info.hole_indices.values()))
        )
    assert predicted == len(ix) > 0


def test_prewarm_hook_fires_during_make_mesh(monkeypatch):
    from superscreen_tpu.ops import linalg

    monkeypatch.setattr(solver_utils, "MAX_DENSE_KERNEL_SIZE", 10)
    calls = []
    monkeypatch.setattr(
        linalg, "prewarm_factorization", lambda n, dtype: calls.append((n, dtype))
    )
    device = _ring_device()
    device.make_mesh(max_edge_length=0.35)
    assert calls, "prewarm was never started from make_mesh"
    pad, dtype = calls[-1]
    assert pad % 2048 == 0
    assert pad >= device._predicted_interior_size("ring")


def test_prewarm_hook_noop_for_dense_films(monkeypatch):
    from superscreen_tpu.ops import linalg

    calls = []
    monkeypatch.setattr(
        linalg, "prewarm_factorization", lambda n, dtype: calls.append(n)
    )
    device = _ring_device()
    device.make_mesh(max_edge_length=0.5)  # small: dense-kernel film
    assert not calls
