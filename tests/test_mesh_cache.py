"""Tests for the opt-in on-disk triangulation cache
(superscreen_tpu/device/mesh_cache.py)."""

import numpy as np
import pytest

import superscreen_tpu as sc
import superscreen_tpu.geometry as geo
from superscreen_tpu.device import mesh_cache
from superscreen_tpu.device import mesh_generation as mgen


def _ring_device():
    return sc.Device(
        "ring",
        layers=[sc.Layer("l0", Lambda=1.0, z0=0)],
        films=[sc.Polygon("ring", layer="l0", points=geo.circle(4.0, points=60))],
        holes=[sc.Polygon("hole", layer="l0", points=geo.circle(2.0, points=40))],
    )


def test_cache_disabled_by_default(monkeypatch):
    monkeypatch.delenv("SUPERSCREEN_TPU_MESH_CACHE", raising=False)
    assert mesh_cache.cache_dir() is None
    assert mesh_cache.load("deadbeef") is None
    # store is a no-op without a directory
    mesh_cache.store("deadbeef", np.zeros((3, 2)), np.array([[0, 1, 2]]))


def test_cache_roundtrip_identical_mesh(monkeypatch, tmp_path):
    monkeypatch.setenv("SUPERSCREEN_TPU_MESH_CACHE", str(tmp_path))
    dev1 = _ring_device()
    dev1.make_mesh(max_edge_length=0.8)
    first = dev1.meshes["ring"]
    # Second meshing of identical geometry+params must be served from the
    # cache without calling the mesher.
    calls = []
    real = mgen.generate_mesh

    def counting(*args, **kwargs):
        calls.append(1)
        return real(*args, **kwargs)

    monkeypatch.setattr(mgen, "generate_mesh", counting)
    dev2 = _ring_device()
    dev2.make_mesh(max_edge_length=0.8)
    second = dev2.meshes["ring"]
    assert not calls
    np.testing.assert_array_equal(first.sites, second.sites)
    np.testing.assert_array_equal(first.elements, second.elements)


def test_cache_key_sensitivity(monkeypatch, tmp_path):
    monkeypatch.setenv("SUPERSCREEN_TPU_MESH_CACHE", str(tmp_path))
    dev = _ring_device()
    dev.make_mesh(max_edge_length=0.8)
    n1 = len(dev.meshes["ring"].sites)
    # Different parameters miss the cache and re-mesh.
    dev.make_mesh(max_edge_length=0.5)
    n2 = len(dev.meshes["ring"].sites)
    assert n2 > n1
    # Smoothing is part of the key (the cached artifact is post-smooth).
    dev.make_mesh(max_edge_length=0.8, smooth=3)
    smoothed = dev.meshes["ring"]
    dev.make_mesh(max_edge_length=0.8)
    unsmoothed = dev.meshes["ring"]
    assert len(smoothed.sites) == n1 == len(unsmoothed.sites)
    assert not np.array_equal(smoothed.sites, unsmoothed.sites)


def test_corrupt_entry_is_a_miss(monkeypatch, tmp_path):
    monkeypatch.setenv("SUPERSCREEN_TPU_MESH_CACHE", str(tmp_path))
    dev = _ring_device()
    dev.make_mesh(max_edge_length=0.8)
    entries = list(tmp_path.glob("*.npz"))
    assert entries
    for entry in entries:
        entry.write_bytes(b"not an npz")
    dev2 = _ring_device()
    dev2.make_mesh(max_edge_length=0.8)  # must re-mesh, not crash
    assert len(dev2.meshes["ring"].sites) == len(dev.meshes["ring"].sites)
