"""Working with polygons (parity with the reference's
``docs/notebooks/polygons.ipynb``): transforms, boolean operations, buffer,
resample — all via the self-contained boolean engine (no shapely/GEOS).

Run: python examples/polygon_booleans.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import superscreen_tpu as sc


def main():
    width, height = 10, 2
    hbar = sc.Polygon(points=sc.geometry.box(width, height))
    print(f"hbar area = {hbar.area:.2f}")

    # Transforms return new polygons.
    vbar = hbar.rotate(90)
    shifted = hbar.translate(dx=2.0, dy=1.0)
    scaled = hbar.scale(xfact=0.5, yfact=2.0)
    print(
        "areas (rot, shift, scale):",
        f"{vbar.area:.2f}, {shifted.area:.2f}, {scaled.area:.2f}",
    )

    # Booleans: a plus sign from two bars, a frame from a box minus a box.
    plus = hbar.union(vbar)
    print(f"plus area = {plus.area:.2f} (expect {2 * hbar.area - height * height})")

    # Classmethod constructors mirror the reference API.
    plus2 = sc.Polygon.from_union([hbar, vbar], name="plus", layer="base")
    assert np.isclose(plus.area, plus2.area)

    cross_section = hbar.intersection(vbar)
    print(f"intersection area = {cross_section.area:.2f} (expect {height * height})")

    notched = hbar.difference(
        sc.geometry.box(1, 1, center=(0, height / 2))
    )
    print(f"notched area = {notched.area:.2f}")

    # Buffer (offset) and uniform boundary resampling.
    rounded = plus.buffer(0.5)
    print(f"buffered area = {rounded.area:.2f} > {plus.area:.2f}")
    ring = sc.Polygon(points=sc.geometry.circle(3)).resample(401)
    seg = np.linalg.norm(np.diff(ring.points, axis=0), axis=1)
    print(f"resampled circle: {len(ring.points)} pts, spacing CV = "
          f"{seg.std() / seg.mean():.3f}")

    # Invalid geometry is refused, not silently mangled.
    bow = np.array([[0.0, 0.0], [1.0, 1.0], [1.0, 0.0], [0.0, 1.0]])
    try:
        hbar.union(bow)
    except ValueError as err:
        print("self-intersecting input rejected:", str(err)[:60], "...")


if __name__ == "__main__":
    main()
