"""BASELINE config 3: a current-biased strip with source/drain terminals
(transport current constraints).

Run: python examples/transport_strip.py
"""

import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import superscreen_tpu as sc


def main():
    width, height = 2, 6
    layer = sc.Layer("base", Lambda=0.5)
    strip = sc.Polygon(
        "strip", layer="base", points=sc.geometry.box(width, height, points=120)
    )
    source = sc.Polygon(
        "source",
        points=sc.geometry.box(width, height / 100, center=(0, height / 2)),
    )
    drain = sc.Polygon(
        "drain",
        points=sc.geometry.box(width, height / 100, center=(0, -height / 2)),
    )
    device = sc.Device(
        "strip",
        layers=[layer],
        films=[strip],
        terminals={"strip": [source, drain]},
    )
    # Terminal films require boundary-preserving meshes.
    device.make_mesh(max_edge_length=0.15)

    solution = sc.solve(
        device,
        terminal_currents={"strip": {"source": "1 mA", "drain": "-1 mA"}},
        current_units="mA",
        field_units="mT",
        progress_bar=False,
    )[-1]

    # Current conservation: the full bias current crosses any section.
    for y in (-2.0, 0.0, 2.0):
        xs = np.linspace(-1.2, 1.2, 401)
        path = np.stack([xs, np.full_like(xs, y)], axis=1)
        I = solution.current_through_path(
            path, film="strip", units="mA", with_units=False
        )
        print(f"current through y = {y:+.1f}: {abs(I):.4f} mA (expect 1)")


if __name__ == "__main__":
    main()
