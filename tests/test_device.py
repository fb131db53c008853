import copy
import pickle

import h5py
import numpy as np
import pytest

import superscreen_tpu as sc
import superscreen_tpu.geometry as geo


@pytest.fixture(scope="module")
def device():
    layers = [
        sc.Layer("layer0", london_lambda=1, thickness=0.1, z0=0),
        sc.Layer("layer1", Lambda=2, z0=0.5),
    ]
    films = [
        sc.Polygon("disk", layer="layer0", points=geo.circle(5, points=60)),
        sc.Polygon("ring", layer="layer1", points=geo.circle(4, points=60)),
    ]
    holes = [
        sc.Polygon("ring_hole", layer="layer1", points=geo.circle(2, points=40)),
    ]
    abstract_regions = [
        sc.Polygon("bbox", layer="layer0", points=geo.box(11, points=20)),
    ]
    device = sc.Device(
        "device",
        layers=layers,
        films=films,
        holes=holes,
        abstract_regions=abstract_regions,
    )
    device.make_mesh(min_points=600)
    return device


def test_layer():
    layer = sc.Layer("l", london_lambda=2, thickness=0.5, z0=1)
    assert layer.Lambda == 2**2 / 0.5
    with pytest.raises(AttributeError):
        layer.Lambda = 5
    layer2 = sc.Layer("l2", Lambda=3)
    layer2.Lambda = 4
    assert layer2.Lambda == 4
    with pytest.raises(ValueError):
        sc.Layer("bad")
    with pytest.raises(ValueError):
        sc.Layer("bad", Lambda=1, london_lambda=1, thickness=1)
    assert layer == layer.copy()
    assert layer != layer2
    assert "Layer" in repr(layer)


def test_device_validation():
    layers = [sc.Layer("layer0", Lambda=1)]
    films = [sc.Polygon("disk", layer="bad_layer", points=geo.circle(1))]
    with pytest.raises(ValueError):
        sc.Device("bad", layers=layers, films=films)
    # Film with no name is invalid
    films = [sc.Polygon(layer="layer0", points=geo.circle(1))]
    with pytest.raises(ValueError):
        sc.Device("bad", layers=layers, films=films)
    # Terminals must reference existing films
    films = [sc.Polygon("disk", layer="layer0", points=geo.circle(1))]
    with pytest.raises(ValueError):
        sc.Device(
            "bad",
            layers=layers,
            films=films,
            terminals={"unknown": []},
        )


def test_device_attributes(device):
    assert set(device.films) == {"disk", "ring"}
    assert set(device.holes) == {"ring_hole"}
    assert device.length_units == "um"
    polygons = device.get_polygons()
    assert len(polygons) == 4
    assert device.poly_points.shape[1] == 2
    hbf = device.holes_by_film()
    assert [h.name for h in hbf["ring"]] == ["ring_hole"]
    assert hbf["disk"] == []
    pbl = device.polygons_by_layer()
    assert len(pbl["layer0"]) == 2
    pbl_holes = device.polygons_by_layer("hole")
    assert len(pbl_holes["layer1"]) == 1
    with pytest.raises(ValueError):
        device.polygons_by_layer("bad")


def test_solve_dtype():
    layers = [sc.Layer("layer0", Lambda=1)]
    films = [sc.Polygon("disk", layer="layer0", points=geo.circle(1))]
    dev = sc.Device("d", layers=layers, films=films, solve_dtype="float32")
    assert dev.solve_dtype == np.dtype("float32")
    with pytest.raises(ValueError):
        dev.solve_dtype = "int64"


def test_device_transforms(device):
    scaled = device.scale(xfact=2, yfact=2)
    assert np.isclose(
        scaled.films["disk"].area, 4 * device.films["disk"].area
    )
    rotated = device.rotate(45)
    assert np.isclose(
        rotated.films["disk"].area, device.films["disk"].area
    )
    mirrored = device.mirror_layers(about_z=0)
    assert mirrored.layers["layer1"].z0 == -0.5
    with pytest.raises(TypeError):
        device.scale(origin=[0, 0])
    with pytest.raises(TypeError):
        device.rotate(90, origin=0)

    translated = device.translate(1, 2, dz=0.1)
    assert np.isclose(
        translated.films["disk"].points[:, 0].mean(),
        device.films["disk"].points[:, 0].mean() + 1,
    )
    assert translated.layers["layer0"].z0 == 0.1
    # Context-manager translation restores in-place.
    x0 = device.films["disk"].points[:, 0].mean()
    with device.translation(1, 1):
        assert np.isclose(device.films["disk"].points[:, 0].mean(), x0 + 1)
    assert np.isclose(device.films["disk"].points[:, 0].mean(), x0)


def test_device_copy_and_pickle(device):
    dev2 = device.copy(with_mesh=True, copy_mesh=True)
    assert dev2 == device
    assert dev2.meshes["disk"] is not device.meshes["disk"]
    dev3 = copy.deepcopy(device)
    assert dev3 == device
    dev4 = copy.copy(device)
    assert dev4 == device
    blob = pickle.dumps(device)
    dev5 = pickle.loads(blob)
    assert dev5 == device


def test_device_mesh_stats(device):
    stats = device.mesh_stats_dict()
    assert set(stats) == {"disk", "ring"}
    assert stats["disk"]["num_sites"] == len(device.meshes["disk"].sites)
    html = device.mesh_stats()
    assert html is not None


def test_boundary_vertices_ordered(device):
    from superscreen_tpu import polygon_ops as pops

    indices = device.boundary_vertices("disk")
    pts = device.meshes["disk"].sites[indices]
    assert pops.signed_area(pts) > 0


def test_device_hdf5_roundtrip(device, tmp_path):
    path = tmp_path / "device.h5"
    device.to_hdf5(path)
    loaded = sc.Device.from_hdf5(path)
    assert loaded == device
    assert set(loaded.meshes) == {"disk", "ring"}
    # Position-dependent Lambda round-trips via dill.
    dev2 = device.copy(with_mesh=False)
    dev2.layers["layer1"].Lambda = sc.Parameter(
        lambda x, y, a=1: a + 0 * x, a=2
    )
    path2 = tmp_path / "device2.h5"
    dev2.to_hdf5(path2)
    loaded2 = sc.Device.from_hdf5(path2)
    val = loaded2.layers["layer1"].Lambda(np.zeros(2), np.zeros(2))
    assert np.allclose(val, 2)


def test_device_repr_eq(device):
    assert "Device" in repr(device)
    assert device == device
    assert device != "not a device"
    other = device.copy()
    other.name = "other"
    assert device != other


def test_terminals_assigned_layer():
    layers = [sc.Layer("layer0", Lambda=1)]
    films = [sc.Polygon("strip", layer="layer0", points=geo.box(4, 2, points=40))]
    source = sc.Polygon("source", points=geo.box(0.2, 2, points=16, center=(-2, 0)))
    dev = sc.Device(
        "d", layers=layers, films=films, terminals={"strip": [source]}
    )
    assert dev.terminals["strip"][0].layer == "layer0"
