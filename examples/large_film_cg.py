"""Beyond the memory wall: a film too large for ANY materialized system.

A ring with >100k mesh vertices has a dense Brandt kernel of tens of GB
(40 GB fp32 at 100k; 113 GB at 168k) -- far beyond a single chip's HBM.
The matrix-free CG path stores only O(n) operator pieces and applies the
kernel in VMEM-resident Pallas tiles, so factorization is O(n) memory and
each solve is a preconditioned-CG loop of O(n^2)-compute matvecs.

Measured on one tunneled TPU v5e chip at n=168k: factorize ~96 s,
warm solve ~17 s, with the circulating-current physics verified
(g steps from I_circ at the hole edge to ~0 at the outer edge).

Run: python examples/large_film_cg.py [max_edge_length]
(default 0.12 -> ~40k vertices, a few minutes; 0.06 -> ~168k vertices)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# Force the matrix-free path regardless of size so the example exercises it.
os.environ.setdefault("SUPERSCREEN_TPU_LARGE_FACTOR", "cg")

import superscreen_tpu as sc
from superscreen_tpu.solver import utils as solver_utils

solver_utils.MAX_DENSE_KERNEL_SIZE = 10


def main():
    max_edge = float(sys.argv[1]) if len(sys.argv) > 1 else 0.12
    device = sc.Device(
        "big_ring",
        layers=[sc.Layer("base", Lambda=1.0, z0=0)],
        films=[
            sc.Polygon(
                "ring", layer="base", points=sc.geometry.circle(7.5, points=160)
            )
        ],
        holes=[
            sc.Polygon(
                "hole", layer="base", points=sc.geometry.circle(4, points=100)
            )
        ],
        solve_dtype="float32",
    )
    t0 = time.time()
    device.make_mesh(max_edge_length=max_edge, smooth=2)
    n = len(device.meshes["ring"].sites)
    print(f"meshed {n} vertices in {time.time() - t0:.1f}s "
          f"(dense kernel would be {n * n * 4 / 1e9:.1f} GB)")

    t0 = time.time()
    model = sc.factorize_model(
        device=device, circulating_currents={"hole": "100 uA"},
        current_units="uA",
    )
    kind = model.film_systems["ring"].lu_piv[0]
    print(f"factorized ({kind}) in {time.time() - t0:.1f}s -- O(n) storage")

    t0 = time.time()
    solution = sc.solve(
        model=model,
        applied_field=sc.sources.ConstantField(0.0),
        field_units="mT",
        progress_bar=False,
    )[-1]
    print(f"solved in {time.time() - t0:.1f}s")

    g = solution.film_solutions["ring"].stream
    sites = device.meshes["ring"].sites
    r = np.linalg.norm(sites, axis=1)
    for rr in (4.05, 5.5, 7.4):
        sel = np.abs(r - rr) < 0.05
        print(f"  g at r~{rr}: {g[sel].mean():8.3f} uA")
    path = np.stack(
        [np.linspace(4.02, 7.48, 80), np.zeros(80)], axis=1
    )
    I = solution.current_through_path(
        path, film="ring", units="uA", with_units=False
    )
    print(f"current through a radial cut: {abs(I):.2f} uA (target 100)")


if __name__ == "__main__":
    main()
