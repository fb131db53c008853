"""Vortex localization: fit a measured field map with ONE batched solve.

A trapped vortex produces a characteristic screened field profile. Given a
"measured" Bz map of the film, we declare a grid of candidate vortex sites,
sweep one-hot amplitude rows over them with solve_many(vortex_nPhi0=...) --
every candidate solved in one batched device computation -- and pick the
candidate whose map best matches the measurement. The reference package
would need one full solve per candidate.

Run: python examples/vortex_localization.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import superscreen_tpu as sc
from superscreen_tpu.sweep import solve_many


def main():
    device = sc.Device(
        "disk",
        layers=[sc.Layer("base", Lambda=0.4, z0=0)],
        films=[
            sc.Polygon("disk", layer="base", points=sc.geometry.circle(4, points=100))
        ],
        length_units="um",
        solve_dtype="float64",
    )
    device.make_mesh(min_points=2500, smooth=5)
    mesh = device.meshes["disk"]
    n = len(mesh.sites)

    # Ground truth: a vortex at (1.2, -0.7) under a small applied field.
    true_xy = (1.2, -0.7)
    sol_true = sc.solve(
        device,
        applied_field=sc.sources.ConstantField(0.05),
        vortices=[sc.Vortex(x=true_xy[0], y=true_xy[1], film="disk", nPhi0=1)],
        field_units="mT",
        current_units="uA",
        progress_bar=False,
    )[-1]
    measured = np.asarray(sol_true.film_solutions["disk"].total_field)
    w = mesh.vertex_areas

    # Candidate sites: a coarse grid clipped to the film interior.
    g = np.linspace(-3, 3, 9)
    cand = np.array([(x, y) for x in g for y in g if np.hypot(x, y) < 3.4])
    vortices = [sc.Vortex(x=x, y=y, film="disk", nPhi0=1) for x, y in cand]
    B = len(cand)

    t0 = time.perf_counter()
    result = solve_many(
        device=device,
        vortices=vortices,
        applied_field_arrays={"disk": np.full((B, n), 0.05)},
        field_units="mT",
        current_units="uA",
        vortex_nPhi0=np.eye(B),
    )
    # Total field per candidate = applied + self (single film).
    maps = np.asarray(result.self_fields["disk"]) + 0.05
    resid = np.sqrt(np.sum(w[None, :] * (maps - measured[None, :]) ** 2, axis=1))
    dt = time.perf_counter() - t0
    best = int(np.argmin(resid))
    print(f"{B} candidate vortex sites solved+scored in {dt:.2f}s")
    print(
        f"best candidate: ({cand[best, 0]:+.2f}, {cand[best, 1]:+.2f}) um, "
        f"true: ({true_xy[0]:+.2f}, {true_xy[1]:+.2f}) um"
    )
    order = np.argsort(resid)[:3]
    for i in order:
        print(
            f"  candidate ({cand[i, 0]:+.2f}, {cand[i, 1]:+.2f}): "
            f"weighted residual {resid[i]:.4f}"
        )
    err = np.hypot(cand[best, 0] - true_xy[0], cand[best, 1] - true_xy[1])
    assert err <= 0.8, "localization missed by more than one grid cell"


if __name__ == "__main__":
    main()
