"""BASELINE config 1: a superconducting disk in a uniform perpendicular
field (Meissner screening).

Run: python examples/quickstart.py
"""

import numpy as np

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import superscreen_tpu as sc


def main():
    length_units = "um"
    # Effective penetration depth Lambda = lambda^2 / d = 0.1 um.
    layer = sc.Layer("base", london_lambda=0.1, thickness=0.1, z0=0)
    disk = sc.Polygon("disk", layer="base", points=sc.geometry.circle(5))
    device = sc.Device(
        "disk", layers=[layer], films=[disk], length_units=length_units
    )
    device.make_mesh(max_edge_length=0.2)
    print("mesh:", device.meshes["disk"].stats())

    solution = sc.solve(
        device,
        applied_field=sc.sources.ConstantField(1.0),
        field_units="mT",
        current_units="uA",
        progress_bar=False,
    )[-1]

    fs = solution.film_solutions["disk"]
    center = device.meshes["disk"].closest_site((0, 0))
    print(f"applied field at center: {fs.applied_field[center]:.4f} mT")
    print(f"total field at center:   {fs.total_field[center]:.4f} mT")
    # Fluxoid of any contour inside a simply-connected film is ~0.
    fluxoid = solution.polygon_fluxoid(
        sc.geometry.circle(2, points=201), film="disk"
    )
    print(f"fluxoid (should be ~0): {sum(fluxoid).to('Phi_0'):~P}")
    # Field above the disk.
    B = solution.field_at_position(
        np.array([[0.0, 0.0]]), zs=1.0, with_units=False
    )
    print(f"field 1 um above center: {np.squeeze(B):.4f} mT")


if __name__ == "__main__":
    main()
