"""Vortex pinning landscapes and the Bean-Livingston entry barrier.

Computes the free energy of a probe vortex at EVERY interior mesh site of a
superconducting disk in one batched computation (`vortex_energy_landscape`:
one background solve + the response diagonal of the existing factorization),
then sweeps the applied field to watch the edge entry barrier collapse, and
tilts the landscape with a transport current.

The reference package (loganbvh/superscreen) can solve for pinned vortices
but has no energetics; here the landscape falls out of the same factorized
model that powers the solver.

Run: JAX_PLATFORMS=cpu python examples/vortex_barrier.py  (or on TPU)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import superscreen_tpu as sc
from superscreen_tpu import vortex_energy_landscape


def main():
    disk = sc.Device(
        "disk",
        layers=[sc.Layer("L", Lambda=0.5, z0=0)],
        films=[
            sc.Polygon(
                "disk", layer="L", points=sc.geometry.circle(4.0, points=120)
            )
        ],
        length_units="um",
        solve_dtype="float64",
    )
    disk.make_mesh(min_points=2000, smooth=5)
    from superscreen_tpu.solver import factorize_model

    model = factorize_model(device=disk, current_units="mA")

    print("Bean-Livingston barrier vs applied field (probe nPhi0 = +1):")
    print(f"{'H (mT)':>8} {'E(center) eV':>14} {'barrier eV':>12} {'r_max um':>9}")
    for H in [0.0, 0.05, 0.2, 1.0, 5.0]:
        ls = vortex_energy_landscape(
            model=model,
            applied_field=sc.sources.ConstantField(H),
            field_units="mT",
        )
        E = ls.total(1.0)
        r = np.linalg.norm(ls.sites, axis=1)
        k_center = int(np.argmin(r))
        # Barrier = highest radial-bin mean between edge and center.
        edges = np.linspace(0, 3.9, 25)
        prof = np.array(
            [E[(r >= a) & (r < b)].mean() for a, b in zip(edges[:-1], edges[1:])]
        )
        k_bar = int(np.argmax(prof))
        print(
            f"{H:8.2f} {E[k_center]:14.2f} {prof[k_bar]:12.2f} "
            f"{0.5 * (edges[k_bar] + edges[k_bar + 1]):9.2f}"
        )

    # Vortex-vortex repulsion: force on a +1 probe from a frozen +1 vortex.
    ls = vortex_energy_landscape(
        disk,
        vortices=[sc.Vortex(x=0.8, y=0.0, film="disk")],
        field_units="mT",
        current_units="mA",
    )
    for d in [0.5, 1.0, 2.0]:
        F = ls.force(np.array([[0.8 + d, 0.0]]), units="fN")[0]
        print(
            f"probe at {d:.1f} um from a frozen +1 vortex: "
            f"F = ({F[0]:+.3f}, {F[1]:+.3f}) fN (radially outward = repulsion)"
        )


if __name__ == "__main__":
    main()
