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


def london_limit():
    """Current distribution across a wide strip vs the analytic London-limit
    theory J_y(x) = I / (pi sqrt((W/2)^2 - x^2)) (cf. the reference's
    docs/notebooks/wire.ipynb)."""
    width, height = 10.0, 20.0
    layer = sc.Layer("base", Lambda=0.02)
    strip = sc.Polygon(
        "strip", layer="base", points=sc.geometry.box(width, height, points=401)
    )
    source = sc.Polygon(
        "source", points=sc.geometry.box(width, height / 100, center=(0, height / 2))
    )
    drain = sc.Polygon(
        "drain", points=sc.geometry.box(width, height / 100, center=(0, -height / 2))
    )
    device = sc.Device(
        "wide_strip",
        layers=[layer],
        films=[strip],
        terminals={"strip": [source, drain]},
        length_units="um",
    )
    device.make_mesh(max_edge_length=0.4)
    solution = sc.solve(
        device,
        terminal_currents={"strip": {"source": "1 mA", "drain": "-1 mA"}},
        current_units="mA",
        field_units="mT",
        progress_bar=False,
    )[-1]
    xs = np.linspace(-4.0, 4.0, 9)
    positions = np.stack([xs, np.zeros_like(xs)], axis=1)
    J = solution.interp_current_density(
        positions, film="strip", units="mA/um", with_units=False
    )
    J_mag = np.linalg.norm(J, axis=1)
    J_theory = 1.0 / (np.pi * np.sqrt((width / 2) ** 2 - xs**2))
    print("\n x      |J| solved   |J| theory")
    for x, a, b in zip(xs, J_mag, J_theory):
        print(f"{x:+.1f}    {a:.4f}       {b:.4f}")


if __name__ == "__main__":
    main()
    london_limit()
