"""Batched transport (IV-style) bias sweeps: route current between the
four terminals of a plus-shaped film, every drive in ONE batched device
program.

``solve_many(terminal_currents=[...])`` exploits the affine structure of
the transport bootstrap (reference ``solver/solve_film.py:308-390``): the
whole sweep costs ``n_terminals`` host-side unit bootstrap solutions per
film plus a single batched linear solve, independent of the number of
sweep points.

Run: python examples/bias_sweep.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import superscreen_tpu as sc


def make_plus_device():
    layer = sc.Layer("base", Lambda=1)
    bar = sc.Polygon("plus", points=sc.geometry.box(10, 2))
    plus = bar.union(bar.rotate(90)).resample(251)
    plus.name = "plus"
    plus.layer = "base"
    terminal = sc.Polygon(points=sc.geometry.box(2, 0.1, center=(0, -5)))
    terminals = []
    for i, name in enumerate(["south", "east", "north", "west"]):
        term = terminal.rotate(i * 90)
        term.name = name
        terminals.append(term)
    device = sc.Device(
        "plus",
        films=[plus],
        layers=[layer],
        terminals={"plus": terminals},
        length_units="um",
    )
    device.make_mesh(max_edge_length=0.4)
    return device


def main():
    device = make_plus_device()
    model = sc.factorize_model(device=device, current_units="uA")

    # Sweep 1: an IV-style bias ramp south -> north.
    biases = np.linspace(-10, 10, 9)
    ramp = [
        {"plus": {"south": float(b), "north": float(-b)}} for b in biases
    ]
    # Sweep 2 (same batch): route a fixed 10 uA through each terminal pair.
    pairs = [("south", "north"), ("south", "east"), ("east", "west"),
             ("west", "north")]
    routing = [{"plus": {a: 10.0, b: -10.0}} for a, b in pairs]

    drives = ramp + routing
    result = sc.solve_many(
        model=model,
        applied_fields=[sc.sources.ConstantField(0.0)] * len(drives),
        terminal_currents=drives,
        current_units="uA",
        field_units="uT",
    )

    # Verify each materialized solution carries its bias: the current
    # crossing a cut in front of the 'south' terminal must equal the
    # south drive. Path normals are the edge vectors rotated -90 degrees
    # (``geometry.path_vectors``), so walk the cut right-to-left to make
    # the normal point INTO the film (+y): positive I_cut = current
    # injected at the south terminal.
    xs = np.linspace(1.8, -1.8, 201)
    cut = np.stack([xs, -3.0 * np.ones_like(xs)], axis=1)
    print("drive -> current through the south cut:")
    for i, drive in enumerate(drives):
        sol = result.solution(i)
        I = sol.current_through_path(cut, film="plus", units="uA")
        target = drive["plus"].get("south", 0.0)
        print(
            f"  {str(drive['plus']):55s} I_cut = {I.magnitude:+7.3f} uA "
            f"(target {target:+.1f})"
        )
        assert abs(I.magnitude - target) < 0.05 * max(10.0, abs(target))
    print(f"{len(drives)} transport drives solved in one batched program.")


if __name__ == "__main__":
    main()
