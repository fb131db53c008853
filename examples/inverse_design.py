"""Inverse design with the differentiable solver: recover a penetration-depth
profile Lambda(x, y) from a synthetic "measured" field map.

This capability has no analog in the reference package — it exists because
the TPU-native solver is a pure JAX function, so `jax.grad` differentiates
the full Brandt solve (implicitly through the linear solve) with respect to
the per-site Lambda profile.  A scanning-SQUID lab would use exactly this
loop to fit spatial variations of the superfluid density to a measured map.

Run on CPU (float64) or TPU:

    python examples/inverse_design.py
"""

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np
import optax

import superscreen_tpu as sc


def main():
    # A disk with an (unknown to the optimizer) Gaussian weak spot in Lambda.
    true_lambda = sc.Parameter(
        lambda x, y: 0.6 + 0.8 * jnp.exp(-((x - 0.3) ** 2 + y**2) / 0.1)
    )
    device = sc.Device(
        "disk",
        layers=[sc.Layer("base", Lambda=true_lambda, z0=0)],
        films=[sc.Polygon("disk", layer="base", points=sc.geometry.circle(1.2))],
        solve_dtype="float64",
    )
    device.make_mesh(min_points=800)

    model = sc.build_adjoint_model(device, field_units="mT", current_units="mA")
    params = model.default_params(applied_field=sc.sources.ConstantField(0.5))
    lam_true = jnp.asarray(params["Lambda"]["disk"])

    # Synthetic measurement: the total Bz map of the true device.
    fwd = jax.jit(model.forward_fn(0))
    target = fwd(params)["disk"]["self_field"]

    # Optimize a uniform initial guess toward the true profile.
    hz = params["applied_field"]["disk"]
    w = model.films["disk"].weights
    lap_rows = model.films["disk"].lap_rows
    lap_cols = model.films["disk"].lap_cols
    lap_vals = model.films["disk"].lap_vals
    n = model.films["disk"].n

    def loss_fn(lam):
        out = fwd({**params, "Lambda": {"disk": lam}})
        misfit = jnp.sum(w * (out["disk"]["self_field"] - target) ** 2)
        # Laplacian (smoothness) regularization on the profile.
        lap_lam = jax.ops.segment_sum(
            lap_vals * lam[lap_cols], lap_rows, num_segments=n
        )
        return misfit + 1e-7 * jnp.sum(w * lap_lam**2)

    lam = jnp.full(n, 0.9)
    opt = optax.adam(3e-2)
    state = opt.init(lam)
    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    for step in range(150):
        loss, g = grad_fn(lam)
        updates, state = opt.update(g, state)
        lam = optax.apply_updates(lam, updates)
        lam = jnp.clip(lam, 0.05, 5.0)  # keep the profile physical
        if step % 25 == 0 or step == 149:
            err = float(
                jnp.linalg.norm(lam - lam_true) / jnp.linalg.norm(lam_true)
            )
            print(
                f"step {step:3d}  loss={float(loss):.3e}  "
                f"|lam - lam_true|/|lam_true| = {err:.3f}"
            )

    err = float(jnp.linalg.norm(lam - lam_true) / jnp.linalg.norm(lam_true))
    print(f"final relative profile error: {err:.3f}")
    return err


def transport_defect_localization():
    """Locate a weak spot in a current-biased strip from its field map.

    Scanning-SQUID imaging of current-carrying devices is a standard
    defect-localization technique; here the differentiable transport solve
    (terminal currents -> Bz map) is inverted for the Lambda profile."""
    true_lambda = sc.Parameter(
        lambda x, y: 0.5 + 1.0 * jnp.exp(-((x - 0.3) ** 2 + (y - 1.0) ** 2) / 0.08)
    )
    width, height = 2.0, 6.0
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
        layers=[sc.Layer("base", Lambda=true_lambda, z0=0)],
        films=[strip],
        terminals={"strip": [source, drain]},
        length_units="um",
        solve_dtype="float64",
    )
    device.make_mesh(max_edge_length=0.25)

    model = sc.build_adjoint_model(device, field_units="mT", current_units="mA")
    params = model.default_params()
    params["terminal_currents"]["strip"] = np.array([1.0, -1.0])
    lam_true = jnp.asarray(params["Lambda"]["strip"])
    fwd = jax.jit(model.forward_fn(0))
    target = fwd(params)["strip"]["self_field"]

    w = model.films["strip"].weights
    n = model.films["strip"].n

    def loss_fn(lam):
        out = fwd({**params, "Lambda": {"strip": lam}})
        return jnp.sum(w * (out["strip"]["self_field"] - target) ** 2)

    lam = jnp.full(n, 0.6)
    opt = optax.adam(3e-2)
    state = opt.init(lam)
    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    for step in range(150):
        loss, g = grad_fn(lam)
        updates, state = opt.update(g, state)
        lam = optax.apply_updates(lam, updates)
        lam = jnp.clip(lam, 0.05, 5.0)
        if step % 25 == 0 or step == 149:
            err = float(
                jnp.linalg.norm(lam - lam_true) / jnp.linalg.norm(lam_true)
            )
            print(
                f"step {step:3d}  loss={float(loss):.3e}  "
                f"|lam - lam_true|/|lam_true| = {err:.3f}"
            )
    # Did we find the defect? Compare the recovered peak location.
    sites = np.asarray(model.films["strip"].sites)
    k = int(np.argmax(np.asarray(lam)))
    print(
        f"recovered defect at ({sites[k, 0]:+.2f}, {sites[k, 1]:+.2f}) um "
        "(true: (+0.30, +1.00) um)"
    )
    return sites[k]


if __name__ == "__main__":
    main()
    transport_defect_localization()
