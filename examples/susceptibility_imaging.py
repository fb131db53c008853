"""Scanning-SQUID susceptibility imaging of a sample, batched on device.

A susceptometer (field coil + pickup loop) is rastered over a
superconducting film containing a circular hole. At each pixel the sample's
screening response changes the pickup-loop flux; the resulting map images
the hole. The whole row of pixels is ONE batched device computation
(`superscreen_tpu.squids.susceptibility_scan`); the reference package would
run a separate solve + host post-processing per pixel.

Run: python examples/susceptibility_imaging.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import superscreen_tpu as sc
from superscreen_tpu.squids import susceptibility_scan


def make_probe():
    """A minimal susceptometer: driven field-coil ring + pickup loop.

    The real layouts (squids.ibm / huber / hypres) drop in the same way --
    solve them with their fc terminal currents and pass the solution here.
    """
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


def make_sample():
    """A 10x10 um superconducting film with a 1.5-um hole at (1.5, 0)."""
    sample = sc.Device(
        "sample",
        layers=[sc.Layer("s", Lambda=0.2, z0=0)],
        films=[
            sc.Polygon("film", layer="s", points=sc.geometry.box(10, 10, points=160))
        ],
        holes=[
            sc.Polygon(
                "defect",
                layer="s",
                points=sc.geometry.circle(1.5, points=60, center=(1.5, 0)),
            )
        ],
        length_units="um",
        solve_dtype="float64",
    )
    sample.make_mesh(min_points=3500, smooth=5)
    return sample


def main():
    probe = make_probe()
    sample = make_sample()
    model = sc.factorize_model(device=sample, current_units="uA")

    n = 9
    xs = np.linspace(-4, 4, n)
    image = np.zeros((n, n))
    t0 = time.perf_counter()
    for j, y in enumerate(xs):
        positions = np.column_stack([xs, np.full(n, y)])
        image[j] = susceptibility_scan(
            sample_model=model,
            squid_solution=probe,
            positions=positions,
            squid_height=1.0,
            pickup_loop="pl",
            I_fc="1 mA",
        )
    dt = time.perf_counter() - t0
    print(f"{n * n} pixels in {dt:.1f}s ({1e3 * dt / n**2:.0f} ms/pixel)")

    # The hole screens less -> weaker diamagnetic response on top of it.
    flat = image.min()
    print("susceptibility map (Phi_0/A), rows = y:")
    for j in range(n - 1, -1, -1):
        print("  " + " ".join(f"{v:7.2f}" for v in image[j]))
    i_peak = np.unravel_index(np.argmax(image[:, :]), image.shape)
    x_peak, y_peak = xs[i_peak[1]], xs[i_peak[0]]
    print(
        f"weakest screening at ({x_peak:+.1f}, {y_peak:+.1f}) um "
        "(hole center: (+1.5, +0.0) um); "
        f"contrast {image.max() - flat:.2f} Phi_0/A"
    )

    # chi(z) approach curve over a clean spot, one batched computation.
    heights = np.geomspace(0.5, 8.0, 10)
    chi = susceptibility_scan(
        sample_model=model,
        squid_solution=probe,
        positions=np.tile([-2.5, 0.0], (len(heights), 1)),
        squid_height=heights,
        pickup_loop="pl",
        I_fc="1 mA",
    )
    print("approach curve chi(z) at (-2.5, 0):")
    for z, c in zip(heights, chi):
        print(f"  z = {z:5.2f} um : {c:8.3f} Phi_0/A")


if __name__ == "__main__":
    main()
