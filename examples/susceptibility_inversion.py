"""Quantitative susceptibility microscopy: reconstruct Lambda(x, y) from a
scanning-SQUID susceptibility image by gradient descent.

The differentiable scan forward model (`squids.build_scan_forward`) maps
the sample's per-site penetration depth to the pickup-loop response at
every scan position. Inverting it turns a susceptibility image into a
quantitative Lambda map -- the core promise of scanning-SQUID
susceptometry, which with the reference package requires hand-rolled
forward fits (one solve per pixel per optimizer step). Here the whole
image and its gradient are two device computations per step.

Run: python examples/susceptibility_inversion.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

import superscreen_tpu as sc
from superscreen_tpu.squids import build_scan_forward


def make_probe():
    squid = sc.Device(
        "probe",
        layers=[sc.Layer("sq", Lambda=0.3, z0=0)],
        films=[
            sc.Polygon(
                "fc_ring", layer="sq", points=sc.geometry.circle(1.5, points=80)
            )
        ],
        holes=[
            sc.Polygon(
                "fc_hole", layer="sq", points=sc.geometry.circle(0.9, points=50)
            )
        ],
        abstract_regions=[
            sc.Polygon("pl", layer="sq", points=sc.geometry.circle(0.4, points=48))
        ],
        length_units="um",
        solve_dtype="float64",
    )
    squid.make_mesh(min_points=1200, smooth=5)
    return sc.solve(
        squid,
        applied_field=sc.sources.ConstantField(0),
        circulating_currents={"fc_hole": "1 mA"},
        field_units="mT",
        current_units="mA",
        progress_bar=False,
    )[-1]


def main():
    probe = make_probe()
    true_lambda = sc.Parameter(
        lambda x, y: 0.3 + 1.2 * jnp.exp(-((x - 1.0) ** 2 + (y + 0.5) ** 2) / 0.5)
    )
    sample = sc.Device(
        "sample",
        layers=[sc.Layer("s", Lambda=true_lambda, z0=0)],
        films=[
            sc.Polygon("disk", layer="s", points=sc.geometry.circle(4.0, points=120))
        ],
        length_units="um",
        solve_dtype="float64",
    )
    sample.make_mesh(min_points=2500, smooth=5)

    # Scan grid.
    g = np.linspace(-2.5, 2.5, 7)
    positions = np.array([(x, y) for y in g for x in g])

    model, scan_fn = build_scan_forward(
        sample, probe, positions, squid_height=1.0, pickup_loop="pl", I_fc="1 mA"
    )
    params = model.default_params()
    lam_true = jnp.asarray(params["Lambda"]["disk"])

    # Synthetic measurement from the true Lambda profile.
    scan_jit = jax.jit(scan_fn)
    measured = scan_jit(params)

    # Invert: start from a uniform film. A 49-pixel image cannot pin down
    # ~2500 per-site values on its own, so regularize with the mesh
    # gradient (smoothness prior) -- standard for quantitative
    # susceptibility reconstruction.
    data = model.films["disk"]

    def grad_penalty(lam):
        gx = jnp.zeros(data.n).at[data.gx_rows].add(data.gx_vals * lam[data.gx_cols])
        gy = jnp.zeros(data.n).at[data.gy_rows].add(data.gy_vals * lam[data.gy_cols])
        return jnp.sum(data.weights * (gx**2 + gy**2))

    def loss_fn(lam):
        chi = scan_fn({**params, "Lambda": {"disk": lam}})
        return jnp.mean((chi - measured) ** 2) + 2e-4 * grad_penalty(lam)

    lam = jnp.full(lam_true.shape, 0.5)
    opt = optax.adam(5e-2)
    state = opt.init(lam)
    step_fn = jax.jit(jax.value_and_grad(loss_fn))
    sites = np.asarray(model.films["disk"].sites)
    seen = np.linalg.norm(sites, axis=1) < 2.5  # where the probe scanned
    t0 = time.perf_counter()
    for step in range(120):
        loss, grad = step_fn(lam)
        updates, state = opt.update(grad, state)
        lam = optax.apply_updates(lam, updates)
        lam = jnp.clip(lam, 0.05, 5.0)
        if step % 30 == 0 or step == 119:
            d = np.asarray(lam - lam_true)
            err = np.linalg.norm(d[seen]) / np.linalg.norm(
                np.asarray(lam_true)[seen]
            )
            print(
                f"step {step:3d}: image misfit {float(loss):.3e}, "
                f"|Lambda - true|/|true| over the scanned region = {err:.3f}"
            )
    dt = time.perf_counter() - t0
    print(f"{len(positions)}-pixel image inverted in {dt:.1f}s")
    k = int(np.argmax(np.asarray(lam)))
    print(
        f"recovered defect peak at ({sites[k, 0]:+.2f}, {sites[k, 1]:+.2f}) um "
        "(true: (+1.00, -0.50) um)"
    )


if __name__ == "__main__":
    main()
