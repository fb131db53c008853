"""Tests for the differentiable (adjoint) solve module.

Value parity against :func:`superscreen_tpu.solve` and gradient parity
against central finite differences, all in float64 on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import superscreen_tpu as sc
from superscreen_tpu import adjoint


def _rel_err(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return np.abs(a - b).max() / max(np.abs(b).max(), 1e-30)


def _ring_device(Lambda=0.8, dtype="float64"):
    device = sc.Device(
        "ring",
        layers=[sc.Layer("base", Lambda=Lambda, z0=0)],
        films=[
            sc.Polygon("ring", layer="base", points=sc.geometry.circle(1.5))
        ],
        holes=[
            sc.Polygon("hole", layer="base", points=sc.geometry.circle(0.5))
        ],
        solve_dtype=dtype,
    )
    device.make_mesh(min_points=500)
    return device


@pytest.fixture(scope="module")
def ring():
    return _ring_device()


@pytest.fixture(scope="module")
def ring_model(ring):
    return adjoint.build_adjoint_model(
        ring, field_units="mT", current_units="mA"
    )


def test_adjoint_matches_solve(ring, ring_model):
    params = ring_model.default_params(
        applied_field=sc.sources.ConstantField(0.3)
    )
    params["circulating_currents"]["hole"] = np.float64(0.7)
    out = jax.jit(ring_model.forward_fn(0))(params)

    sol = sc.solve(
        device=ring,
        applied_field=sc.sources.ConstantField(0.3),
        field_units="mT",
        current_units="mA",
        circulating_currents={"hole": "0.7 mA"},
    )[-1]
    fs = sol.film_solutions["ring"]
    assert _rel_err(out["ring"]["stream"], fs.stream) < 1e-10
    assert _rel_err(out["ring"]["current_density"], fs.current_density) < 1e-10
    assert _rel_err(out["ring"]["self_field"], fs.self_field) < 1e-10


def test_adjoint_grad_lambda_finite_difference(ring_model):
    params = ring_model.default_params(
        applied_field=sc.sources.ConstantField(0.5)
    )
    params["circulating_currents"]["hole"] = np.float64(0.2)
    fwd = jax.jit(ring_model.forward_fn(0))

    def loss(lam):
        out = fwd({**params, "Lambda": {"ring": lam}})
        return jnp.sum(out["ring"]["self_field"] ** 2)

    lam0 = jnp.asarray(params["Lambda"]["ring"])
    g = jax.grad(loss)(lam0)
    v = jax.random.normal(jax.random.PRNGKey(0), g.shape)
    eps = 1e-5
    fd = (loss(lam0 + eps * v) - loss(lam0 - eps * v)) / (2 * eps)
    ad = jnp.vdot(g, v)
    assert abs(float(fd - ad)) / abs(float(ad)) < 1e-6


def test_adjoint_grad_drives_finite_difference(ring_model):
    """Gradients w.r.t. circulating current and applied-field amplitude."""
    base = ring_model.default_params(
        applied_field=sc.sources.ConstantField(1.0)
    )
    fwd = jax.jit(ring_model.forward_fn(0))
    hz_unit = jnp.asarray(base["applied_field"]["ring"])

    def loss(drives):
        I_circ, amp = drives
        params = {
            **base,
            "applied_field": {"ring": amp * hz_unit},
            "circulating_currents": {"hole": I_circ},
        }
        out = fwd(params)
        # A physically meaningful scalar: weighted total field energy.
        w = ring_model.films["ring"].weights
        total = out["ring"]["self_field"] + amp * hz_unit
        return jnp.sum(w * total**2)

    drives0 = jnp.array([0.4, 0.8])
    g = jax.grad(loss)(drives0)
    for k in range(2):
        e = jnp.zeros(2).at[k].set(1e-5)
        fd = (loss(drives0 + e) - loss(drives0 - e)) / 2e-5
        assert abs(float(fd - g[k])) / max(abs(float(g[k])), 1e-12) < 1e-5


def test_adjoint_vortex_matches_solve_and_grad(ring):
    vortices = [sc.Vortex(x=0.9, y=0.35, film="ring", nPhi0=2.0)]
    model = adjoint.build_adjoint_model(
        ring, vortices=vortices, field_units="mT", current_units="mA"
    )
    params = model.default_params()
    out = jax.jit(model.forward_fn(0))(params)

    sol = sc.solve(
        device=ring,
        applied_field=sc.sources.ConstantField(0),
        field_units="mT",
        current_units="mA",
        vortices=vortices,
    )[-1]
    fs = sol.film_solutions["ring"]
    assert _rel_err(out["ring"]["stream"], fs.stream) < 1e-10
    assert _rel_err(out["ring"]["self_field"], fs.self_field) < 1e-10

    # The response is linear in nPhi0, so AD must match the secant exactly.
    fwd = jax.jit(model.forward_fn(0))

    def loss(nphi0):
        o = fwd({**params, "vortex_nPhi0": {"ring": nphi0}})
        return jnp.sum(o["ring"]["stream"])

    g = jax.grad(loss)(jnp.array([2.0]))
    secant = loss(jnp.array([3.0])) - loss(jnp.array([2.0]))
    assert abs(float(g[0] - secant)) / abs(float(secant)) < 1e-9


def test_adjoint_inhomogeneous_lambda_matches_solve():
    """The (grad Lambda . grad) term in A(Lambda) matches the solver."""
    lam = sc.Parameter(lambda x, y: 0.5 + 0.3 * x**2 + 0.1 * y)
    device = sc.Device(
        "disk",
        layers=[sc.Layer("base", Lambda=lam, z0=0)],
        films=[
            sc.Polygon("disk", layer="base", points=sc.geometry.circle(1.2))
        ],
        solve_dtype="float64",
    )
    device.make_mesh(min_points=400)
    model = adjoint.build_adjoint_model(
        device, field_units="mT", current_units="mA"
    )
    params = model.default_params(
        applied_field=sc.sources.ConstantField(0.4)
    )
    out = jax.jit(model.forward_fn(0))(params)
    sol = sc.solve(
        device=device,
        applied_field=sc.sources.ConstantField(0.4),
        field_units="mT",
        current_units="mA",
    )[-1]
    fs = sol.film_solutions["disk"]
    assert _rel_err(out["disk"]["stream"], fs.stream) < 1e-10
    assert _rel_err(out["disk"]["self_field"], fs.self_field) < 1e-10


def test_adjoint_two_layer_coupling_matches_solve():
    device = sc.Device(
        "two_rings",
        layers=[
            sc.Layer("bottom", Lambda=0.5, z0=0),
            sc.Layer("top", Lambda=0.8, z0=0.6),
        ],
        films=[
            sc.Polygon(
                "big_ring", layer="bottom", points=sc.geometry.circle(1.6)
            ),
            sc.Polygon(
                "little_ring", layer="top", points=sc.geometry.circle(1.0)
            ),
        ],
        holes=[
            sc.Polygon(
                "big_hole", layer="bottom", points=sc.geometry.circle(0.6)
            ),
            sc.Polygon(
                "little_hole", layer="top", points=sc.geometry.circle(0.4)
            ),
        ],
        solve_dtype="float64",
    )
    device.make_mesh(min_points=400)
    model = adjoint.build_adjoint_model(
        device, field_units="mT", current_units="mA"
    )
    params = model.default_params(
        applied_field=sc.sources.ConstantField(0.2)
    )
    params["circulating_currents"]["big_hole"] = np.float64(0.5)
    out = jax.jit(model.forward_fn(2))(params)
    sol = sc.solve(
        device=device,
        applied_field=sc.sources.ConstantField(0.2),
        field_units="mT",
        current_units="mA",
        circulating_currents={"big_hole": "0.5 mA"},
        iterations=2,
    )[-1]
    for film in ("big_ring", "little_ring"):
        fs = sol.film_solutions[film]
        assert _rel_err(out[film]["stream"], fs.stream) < 1e-9
        assert (
            _rel_err(
                out[film]["field_from_other_films"],
                fs.field_from_other_films,
            )
            < 1e-9
        )

    # Gradient through the coupled solve: d/d(Lambda_top) of the flux
    # through the bottom hole responds via the inter-film coupling.
    fwd = jax.jit(model.forward_fn(2))
    w = model.films["big_ring"].weights
    mask = model.films["big_ring"].hole_masks[0]

    def loss(lam_top):
        o = fwd({**params, "Lambda": {
            "big_ring": params["Lambda"]["big_ring"],
            "little_ring": lam_top,
        }})
        total = (
            o["big_ring"]["self_field"]
            + o["big_ring"]["field_from_other_films"]
        )
        return jnp.sum(mask * w * total)

    lam0 = jnp.asarray(params["Lambda"]["little_ring"])
    g = jax.grad(loss)(lam0)
    v = jax.random.normal(jax.random.PRNGKey(1), g.shape)
    eps = 1e-5
    fd = (loss(lam0 + eps * v) - loss(lam0 - eps * v)) / (2 * eps)
    ad = jnp.vdot(g, v)
    assert abs(float(fd - ad)) / max(abs(float(ad)), 1e-12) < 1e-5


def _strip_device():
    width, height = 2.0, 6.0
    layer = sc.Layer("base", Lambda=0.5)
    strip = sc.Polygon(
        "strip", layer="base", points=sc.geometry.box(width, height, points=160)
    )
    source = sc.Polygon(
        "source", points=sc.geometry.box(width, height / 100, center=(0, height / 2))
    )
    drain = sc.Polygon(
        "drain", points=sc.geometry.box(width, height / 100, center=(0, -height / 2))
    )
    device = sc.Device(
        "strip",
        layers=[layer],
        films=[strip],
        terminals={"strip": [source, drain]},
        length_units="um",
        solve_dtype="float64",
    )
    device.make_mesh(max_edge_length=0.3)
    return device


@pytest.fixture(scope="module")
def strip():
    return _strip_device()


def test_adjoint_transport_matches_solve(strip):
    solution = sc.solve(
        strip,
        terminal_currents={"strip": {"source": "1 mA", "drain": "-1 mA"}},
        applied_field=sc.sources.ConstantField(0.1),
        current_units="mA",
        field_units="mT",
        progress_bar=False,
    )[-1]
    fs = solution.film_solutions["strip"]
    model = adjoint.build_adjoint_model(
        strip, field_units="mT", current_units="mA", dtype="float64"
    )
    params = model.default_params(applied_field=sc.sources.ConstantField(0.1))
    params["terminal_currents"]["strip"] = np.array([1.0, -1.0])
    out = jax.jit(model.forward_fn(iterations=0))(params)["strip"]
    for ref, key in (
        (fs.stream, "stream"),
        (fs.current_density, "current_density"),
        (fs.self_field, "self_field"),
    ):
        ref = np.asarray(ref)
        got = np.asarray(out[key])
        assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 1e-12


def test_adjoint_transport_grads_finite_difference(strip):
    model = adjoint.build_adjoint_model(
        strip, field_units="mT", current_units="mA", dtype="float64"
    )
    params = model.default_params(applied_field=sc.sources.ConstantField(0.1))
    params["terminal_currents"]["strip"] = np.array([1.0, -1.0])
    fwd = jax.jit(model.forward_fn(iterations=0))
    eps = 1e-5

    def loss_current(I):
        p = {**params, "terminal_currents": {"strip": jnp.stack([I, -I])}}
        return jnp.sum(fwd(p)["strip"]["current_density"] ** 2)

    ad = jax.grad(loss_current)(jnp.asarray(1.0))
    fd = (loss_current(jnp.asarray(1.0 + eps)) - loss_current(jnp.asarray(1.0 - eps))) / (
        2 * eps
    )
    assert abs(float(ad) / float(fd) - 1) < 1e-7

    def loss_lambda(lam):
        return jnp.sum(fwd({**params, "Lambda": {"strip": lam}})["strip"]["stream"] ** 2)

    lam0 = jnp.asarray(params["Lambda"]["strip"])
    grad = jax.grad(loss_lambda)(lam0)
    v = jax.random.normal(jax.random.PRNGKey(0), grad.shape)
    fd = (loss_lambda(lam0 + eps * v) - loss_lambda(lam0 - eps * v)) / (2 * eps)
    ad = jnp.vdot(grad, v)
    assert abs(float(fd - ad)) / max(abs(float(ad)), 1e-12) < 1e-5


def test_adjoint_transport_with_holes_matches_solve():
    width, height = 1.0, 2.0
    slot_h, slot_w = height / 5, width / 4
    film = (
        sc.Polygon("film", layer="base", points=sc.geometry.box(width, height))
        .difference(
            sc.geometry.box(slot_w, slot_h, center=(-(width - slot_w) / 2, 0))
        )
        .difference(
            sc.geometry.box(slot_w, slot_h, center=(+(width - slot_w) / 2, 0))
        )
        .resample(151)
    )
    src = sc.Polygon(
        "source", points=sc.geometry.box(width, height / 100, center=(0, height / 2))
    )
    drn = sc.Polygon(
        "drain", points=sc.geometry.box(width, height / 100, center=(0, -height / 2))
    )
    hole = sc.Polygon(
        "hole", layer="base", points=sc.geometry.circle(0.08, center=(0, 0.55))
    )
    device = sc.Device(
        "holey",
        layers=[sc.Layer("base", Lambda=0.5)],
        films=[film],
        holes=[hole],
        terminals={"film": [src, drn]},
        length_units="um",
        solve_dtype="float64",
    )
    device.make_mesh(max_edge_length=0.1)
    solution = sc.solve(
        device,
        terminal_currents={"film": {"source": "1 mA", "drain": "-1 mA"}},
        circulating_currents={"hole": "0.3 mA"},
        applied_field=sc.sources.ConstantField(0.2),
        current_units="mA",
        field_units="mT",
        progress_bar=False,
    )[-1]
    fs = solution.film_solutions["film"]
    model = adjoint.build_adjoint_model(
        device, field_units="mT", current_units="mA", dtype="float64"
    )
    params = model.default_params(applied_field=sc.sources.ConstantField(0.2))
    params["terminal_currents"]["film"] = np.array([1.0, -1.0])
    params["circulating_currents"]["hole"] = np.asarray(0.3)
    out = jax.jit(model.forward_fn(iterations=0))(params)["film"]
    for ref, key in (
        (fs.stream, "stream"),
        (fs.current_density, "current_density"),
        (fs.self_field, "self_field"),
    ):
        ref = np.asarray(ref)
        got = np.asarray(out[key])
        assert np.max(np.abs(got - ref)) / np.max(np.abs(ref)) < 1e-12


def test_adjoint_vmap_over_lambda(ring_model):
    model = ring_model
    params = model.default_params(applied_field=sc.sources.ConstantField(0.3))
    fwd = model.forward_fn(iterations=0)
    lam0 = jnp.asarray(params["Lambda"]["ring"])
    lams = jnp.stack([lam0 * s for s in (0.5, 1.0, 2.0)])
    batched = jax.jit(
        jax.vmap(
            lambda lam: fwd({**params, "Lambda": {"ring": lam}})["ring"]["stream"]
        )
    )
    gb = batched(lams)
    g_single = fwd({**params, "Lambda": {"ring": lams[2]}})["ring"]["stream"]
    assert gb.shape == (3,) + g_single.shape
    assert np.allclose(np.asarray(gb[2]), np.asarray(g_single))
