"""Scanning-SQUID magnetometry of a trapped Pearl vortex.

A single vortex is trapped in a superconducting strip; a washer SQUID
(pickup loop inside a superconducting body) is rastered over it with
``squids.magnetometry_scan``.  The whole image is computed in batched
device programs: the sample-current flux readout is one dispatch per scan
chunk, and with ``screening=True`` the SQUID body's response at every
pixel is one batched sweep sharing a single factorization -- the washer's
flux focusing visibly sharpens/rescales the vortex image vs the bare-loop
scan (reference workflows, e.g. ``docs/notebooks/scanning-squid.ipynb``,
re-solve per pixel on the host for this).

Run: python examples/vortex_imaging.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import superscreen_tpu as sc
from superscreen_tpu.squids import magnetometry_scan


def make_sample():
    device = sc.Device(
        "strip",
        layers=[sc.Layer("s", Lambda=0.5, z0=0)],
        films=[sc.Polygon("strip", layer="s", points=sc.geometry.box(12, 6))],
        length_units="um",
    )
    device.make_mesh(min_points=2500, smooth=5)
    return device


def make_squid():
    squid = sc.Device(
        "washer",
        layers=[sc.Layer("sq", Lambda=0.3, z0=0)],
        films=[
            sc.Polygon("body", layer="sq", points=sc.geometry.circle(1.5, points=80))
        ],
        holes=[
            sc.Polygon(
                "pl_hole", layer="sq", points=sc.geometry.circle(0.6, points=40)
            )
        ],
        abstract_regions=[
            sc.Polygon("pl", layer="sq", points=sc.geometry.circle(0.4, points=48))
        ],
        length_units="um",
    )
    squid.make_mesh(min_points=1200, smooth=5)
    return squid


def fwhm(xs, profile):
    half = profile.max() / 2
    above = xs[profile >= half]
    return above.max() - above.min() if len(above) else np.nan


def main():
    sample = make_sample()
    squid = make_squid()
    solution = sc.solve(
        sample,
        applied_field=sc.sources.ConstantField(0),
        vortices=[sc.Vortex(x=1.0, y=0.0, film="strip")],
        field_units="mT",
        current_units="mA",
        progress_bar=False,
    )[-1]

    height = 0.8
    xs = np.linspace(-3, 5, 33)
    line = np.column_stack([xs, np.zeros_like(xs)])

    bare = magnetometry_scan(
        solution,
        positions=line,
        squid_height=height,
        pickup_loop="pl",
        squid_device=squid,
        units="mPhi_0",
    )
    focused = magnetometry_scan(
        solution,
        positions=line,
        squid_height=height,
        pickup_loop="pl",
        squid_device=squid,
        screening=True,
        units="mPhi_0",
    )

    print(f"linecut through the vortex at (1, 0), height {height} um:")
    print(
        f"  bare loop: peak {bare.max():8.3f} mPhi_0 at x = "
        f"{xs[np.argmax(bare)]:+.2f} um, FWHM {fwhm(xs, bare):.2f} um"
    )
    print(
        f"  + washer screening: peak {focused.max():8.3f} mPhi_0 at x = "
        f"{xs[np.argmax(focused)]:+.2f} um, FWHM {fwhm(xs, focused):.2f} um"
    )
    ratio = focused.max() / bare.max()
    print(f"  flux-focusing factor at the peak: {ratio:.3f}")

    # A small 2D image around the vortex, all pixels in one batch.
    gx = np.linspace(-1, 3, 17)
    gy = np.linspace(-2, 2, 17)
    X, Y = np.meshgrid(gx, gy)
    img = magnetometry_scan(
        solution,
        positions=np.column_stack([X.ravel(), Y.ravel()]),
        squid_height=height,
        pickup_loop="pl",
        squid_device=squid,
        units="mPhi_0",
    ).reshape(X.shape)
    iy, ix = np.unravel_index(np.argmax(img), img.shape)
    print(
        f"2D image ({img.size} pixels, one batch): peak {img.max():.3f} "
        f"mPhi_0 at ({gx[ix]:+.2f}, {gy[iy]:+.2f}) um"
    )
    assert abs(gx[ix] - 1.0) < 0.3 and abs(gy[iy]) < 0.3


if __name__ == "__main__":
    main()
