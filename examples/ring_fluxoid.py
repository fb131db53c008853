"""BASELINE config 2: a superconducting ring -- fluxoid quantization and
self-inductance.

Run: python examples/ring_fluxoid.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import superscreen_tpu as sc


def main():
    layer = sc.Layer("base", london_lambda=0.2, thickness=0.05, z0=0)
    ring = sc.Polygon("ring", layer="base", points=sc.geometry.circle(4))
    hole = sc.Polygon("hole", layer="base", points=sc.geometry.circle(2))
    device = sc.Device("ring", layers=[layer], films=[ring], holes=[hole])
    device.make_mesh(max_edge_length=0.25)

    # Self-inductance: L = Phi_f / I for current circulating the hole.
    solution = sc.solve(
        device,
        circulating_currents={"hole": "1 mA"},
        current_units="mA",
        field_units="mT",
        progress_bar=False,
    )[-1]
    fluxoid = solution.hole_fluxoid("hole")
    L = sum(fluxoid) / sc.ureg("1 mA")
    print(f"ring self-inductance: {L.to('pH'):.4~P}")

    # Fluxoid quantization: find the circulating current that puts exactly
    # n flux quanta in the ring.
    model = sc.factorize_model(device=device, current_units="mA")
    for n in (0, 1, 2):
        sol = sc.find_fluxoid_solution(
            model, fluxoids={"hole": n}, progress_bar=False
        )
        realized = sum(sol.hole_fluxoid("hole")).to("Phi_0").magnitude
        I = sol.circulating_currents["hole"]
        print(f"target {n} Phi_0: realized {realized:+.6f} Phi_0 "
              f"with I_circ = {I * 1e3:+.4f} uA")


if __name__ == "__main__":
    main()
