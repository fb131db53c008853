"""BASELINE config 5: trapped vortex + source-position sweep, batched as a
single device computation (a scanning-SQUID response map).

Run: python examples/scanning_map.py
"""

import time

import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import superscreen_tpu as sc
from superscreen_tpu.sweep import solve_many


def main():
    layer = sc.Layer("base", Lambda=0.8, z0=0)
    film = sc.Polygon("film", layer="base", points=sc.geometry.circle(5))
    hole = sc.Polygon("hole", layer="base", points=sc.geometry.circle(1.2))
    device = sc.Device("scan", layers=[layer], films=[film], holes=[hole])
    device.make_mesh(max_edge_length=0.3)

    vortex = sc.Vortex(x=2.5, y=0.0, film="film", nPhi0=1)
    model = sc.factorize_model(
        device=device, current_units="uA", vortices=[vortex]
    )

    # A grid of source positions, solved as ONE batched computation.
    n_grid = 8
    xs = np.linspace(-3, 3, n_grid)
    positions = [(x, y) for y in xs for x in xs]
    fields = [
        sc.sources.MonopoleField(r0=(x, y, 1.0)) for (x, y) in positions
    ]
    t0 = time.perf_counter()
    result = solve_many(
        model=model, applied_fields=fields, field_units="mT", iterations=0
    )
    dt = time.perf_counter() - t0
    print(
        f"solved {len(result)} source positions in {dt:.2f}s "
        f"({dt / len(result) * 1e3:.1f} ms/position)"
    )

    # Response map: hole fluxoid vs source position.
    response = np.array(
        [
            sum(result.solution(i).hole_fluxoid("hole")).to("Phi_0").magnitude
            for i in range(len(positions))
        ]
    ).reshape(n_grid, n_grid)
    print("response map (Phi_0):")
    for row in response:
        print("  " + " ".join(f"{v:7.4f}" for v in row))


if __name__ == "__main__":
    main()
