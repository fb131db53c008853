"""High-precision (float64-residual refinement) solve mode.

Verifies that ``solve(high_precision=True)`` on a float32 device reaches the
float64 answer (the classic mixed-precision refinement guarantee), which is
what delivers the <=1e-6 accuracy target on f32-only hardware like TPUs.
"""

import numpy as np
import pytest

import superscreen_tpu as sc
from superscreen_tpu.solver.refine import (
    C_vector64,
    build_hp_system,
    coo_matvec64,
    q_apply64,
    q_row_sums64,
    refined_solve,
)


def _ring_device(dtype, Lambda=0.8):
    layers = [sc.Layer("base", Lambda=Lambda, z0=0)]
    films = [
        sc.Polygon("disk", layer="base", points=sc.geometry.circle(5, points=70))
    ]
    holes = [
        sc.Polygon("hole", layer="base", points=sc.geometry.circle(1.5, points=36))
    ]
    device = sc.Device(
        "ring", layers=layers, films=films, holes=holes, solve_dtype=dtype
    )
    device.make_mesh(min_points=900)
    return device


def _two_film_device(dtype):
    layers = [
        sc.Layer("l0", Lambda=0.5, z0=0),
        sc.Layer("l1", Lambda=1.0, z0=0.8),
    ]
    films = [
        sc.Polygon("ring0", layer="l0", points=sc.geometry.circle(5, points=60)),
        sc.Polygon("disk1", layer="l1", points=sc.geometry.circle(3.5, points=50)),
    ]
    holes = [
        sc.Polygon("hole0", layer="l0", points=sc.geometry.circle(2, points=30))
    ]
    device = sc.Device(
        "pair", layers=layers, films=films, holes=holes, solve_dtype=dtype
    )
    device.make_mesh(min_points=800)
    return device


def _rel_err(a, b):
    return np.linalg.norm(np.asarray(a) - np.asarray(b)) / np.linalg.norm(b)


def test_hp_kernels_match_f64_device_ops():
    """The host f64 kernels agree with the (f64-on-CPU) device kernels."""
    from superscreen_tpu.ops import kernels

    rng = np.random.default_rng(0)
    sites = rng.uniform(-3, 3, size=(200, 2))
    w = rng.uniform(0.1, 1.0, size=200)
    np.testing.assert_allclose(
        C_vector64(sites),
        np.asarray(kernels.C_vector(sites, dtype="float64")),
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        q_row_sums64(sites, w),
        np.asarray(kernels.q_apply(sites, w)),
        rtol=1e-10,
    )
    np.testing.assert_allclose(
        q_apply64(sites[:50], sites, w),
        np.asarray(kernels.q_apply_rect(sites[:50], sites, w)),
        rtol=1e-10,
    )


def test_hp_system_matches_f64_assembly():
    """A64 equals the solver's own system assembled in float64."""
    device = _ring_device("float64")
    model = sc.factorize_model(device=device, current_units="mA")
    name = "disk"
    hp = build_hp_system(device, model.film_info[name], model.film_systems[name])
    A_solver = np.asarray(model.film_systems[name].A)
    np.testing.assert_allclose(hp.A64, A_solver, rtol=1e-10, atol=1e-12)
    for hole, system in model.hole_systems[name].items():
        np.testing.assert_allclose(
            hp.hole_eff64[hole], np.asarray(system.A), rtol=1e-10, atol=1e-12
        )


def test_refined_solve_reaches_f64_floor():
    rng = np.random.default_rng(1)
    n = 300
    M = rng.standard_normal((n, n)) / np.sqrt(n)
    A64 = -(np.eye(n) * 3.0 + M @ M.T)  # solve (-A) x = h, SPD -A
    h = rng.standard_normal(n)
    x_exact = np.linalg.solve(-A64, h)

    A32 = A64.astype(np.float32)

    def precond(r):
        return np.linalg.solve(-A32, np.asarray(r, dtype=np.float32))

    x32 = precond(h).astype(np.float64)
    x_hp = refined_solve(A64, precond, h)
    assert _rel_err(x_hp, x_exact) < 1e-12
    assert _rel_err(x_hp, x_exact) < 1e-4 * _rel_err(x32, x_exact)


def test_coo_matvec64_matches_dense():
    device = _ring_device("float64")
    gx = device.meshes["disk"].operators.gradient_x
    x = np.random.default_rng(2).standard_normal(gx.shape[1])
    np.testing.assert_allclose(
        coo_matvec64(gx, x), gx.to_dense() @ x, rtol=1e-12, atol=1e-12
    )


def test_high_precision_single_film_matches_f64_solve():
    kwargs = dict(
        applied_field=sc.sources.ConstantField(0.7),
        field_units="mT",
        circulating_currents={"hole": "1 mA"},
    )
    dev32 = _ring_device("float32")
    sol_hp = sc.solve(device=dev32, high_precision=True, **kwargs)[-1]
    dev64 = _ring_device("float64")
    sol64 = sc.solve(device=dev64, **kwargs)[-1]

    fs_hp = sol_hp.film_solutions["disk"]
    fs_64 = sol64.film_solutions["disk"]
    assert _rel_err(fs_hp.stream, fs_64.stream) < 1e-9
    assert _rel_err(fs_hp.current_density, fs_64.current_density) < 1e-9
    assert _rel_err(fs_hp.self_field, fs_64.self_field) < 1e-9


def test_high_precision_coupled_films_and_vortices():
    vortices = [sc.Vortex(x=0.5, y=0.8, film="disk1")]
    kwargs = dict(
        applied_field=sc.sources.ConstantField(0.4),
        field_units="mT",
        circulating_currents={"hole0": "0.5 mA"},
        iterations=3,
        progress_bar=False,
    )
    dev32 = _two_film_device("float32")
    sol_hp = sc.solve(
        device=dev32, vortices=vortices, high_precision=True, **kwargs
    )[-1]
    dev64 = _two_film_device("float64")
    sol64 = sc.solve(device=dev64, vortices=vortices, **kwargs)[-1]
    for film in ("ring0", "disk1"):
        fs_hp = sol_hp.film_solutions[film]
        fs_64 = sol64.film_solutions[film]
        assert _rel_err(fs_hp.stream, fs_64.stream) < 1e-9
        assert (
            _rel_err(fs_hp.field_from_other_films, fs_64.field_from_other_films)
            < 1e-9
        )


def test_high_precision_mutual_inductance():
    """Mutuals via the per-column hp path match the f64 batched path."""
    dev32 = _two_film_device("float32")
    M_hp = dev32.mutual_inductance_matrix(
        units="pH", iterations=2, high_precision=True, progress_bar=False
    )
    dev64 = _two_film_device("float64")
    M_64 = dev64.mutual_inductance_matrix(units="pH", iterations=2)
    np.testing.assert_allclose(
        M_hp.magnitude, M_64.magnitude, rtol=1e-6
    )


def _strip_device(dtype, with_hole=True):
    holes = []
    if with_hole:
        holes = [
            sc.Polygon(
                "strip_hole", layer="base", points=sc.geometry.circle(0.4)
            )
        ]
    device = sc.Device(
        "strip",
        layers=[sc.Layer("base", Lambda=1.0, z0=0)],
        films=[sc.Polygon("strip", layer="base", points=sc.geometry.box(4, 2))],
        holes=holes,
        terminals={
            "strip": [
                sc.Polygon("source", points=sc.geometry.box(0.1, 1.5)).translate(
                    -2, 0
                ),
                sc.Polygon("drain", points=sc.geometry.box(0.1, 1.5)).translate(
                    2, 0
                ),
            ]
        },
        solve_dtype=dtype,
    )
    device.make_mesh(min_points=700)
    return device


def test_high_precision_transport():
    """hp on a holey transport strip matches the full-f64 solve."""
    kwargs = dict(
        applied_field=sc.sources.ConstantField(0.2),
        field_units="mT",
        terminal_currents={"strip": {"source": "1 mA", "drain": "-1 mA"}},
        circulating_currents={"strip_hole": "0.3 mA"},
    )
    dev32 = _strip_device("float32")
    sol_hp = sc.solve(device=dev32, high_precision=True, **kwargs)[-1]
    dev64 = _strip_device("float64")
    sol64 = sc.solve(device=dev64, **kwargs)[-1]
    fs_hp = sol_hp.film_solutions["strip"]
    fs_64 = sol64.film_solutions["strip"]
    assert _rel_err(fs_hp.stream, fs_64.stream) < 1e-9
    assert _rel_err(fs_hp.current_density, fs_64.current_density) < 1e-9
    assert _rel_err(fs_hp.self_field, fs_64.self_field) < 1e-9


def test_hp_systems_cached_on_model():
    device = _ring_device("float32")
    model = sc.factorize_model(device=device, current_units="mA")
    from superscreen_tpu.solver.refine import get_hp_systems

    first = get_hp_systems(model)
    assert get_hp_systems(model) is first
