"""Gallery of applied-field sources (parity with the reference's
``docs/notebooks/field-sources.ipynb``): ConstantField, MonopoleField /
VortexField, PearlVortexField, DipoleField, and SheetCurrentField — plus
how to combine sources by addition and feed one solution's sheet currents
into another model.

Run: python examples/field_sources.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import superscreen_tpu as sc


def main():
    x, y = np.meshgrid(np.linspace(-2, 2, 5), np.linspace(-2, 2, 5))
    x, y = x.ravel(), y.ravel()
    z = np.full_like(x, 0.5)

    # Uniform out-of-plane field.
    const = sc.sources.ConstantField(5)
    print("ConstantField(5) at 25 points:", np.unique(const(x, y, z)))

    # Flux monopole with charge nPhi0 * Phi_0 (VortexField is an alias).
    assert sc.sources.VortexField is sc.sources.MonopoleField
    mono = sc.sources.MonopoleField(r0=(0, 0, 0), nPhi0=1)
    hz = mono(x, y, z)
    print("MonopoleField peak Hz:", float(np.max(hz)))

    # Pearl vortex in a film with penetration depth Lambda (FFT method).
    pearl = sc.sources.PearlVortexField(
        r0=(0, 0, 0), Lambda=1.0, xs=np.linspace(-4, 4, 256), ys=np.linspace(-4, 4, 256)
    )
    print("PearlVortexField peak Hz:", float(np.max(pearl(x, y, z))))

    # A point dipole distribution (e.g. magnetic particles).
    dip = sc.sources.DipoleField(
        dipole_positions=(0.0, 0.0, -0.5), dipole_moments=(0, 0, 1.0)
    )
    print("DipoleField peak Hz:", float(np.max(dip(x, y, z))))

    # Sources form a vector space: add and scale them.
    combo = const + 0.5 * mono
    print("combined source at origin-ish:", float(combo(x, y, z)[12]))

    # SheetCurrentField: the field of a solved film drives another model.
    layer = sc.Layer("base", Lambda=1.0, z0=0.0)
    disk = sc.Polygon("disk", layer="base", points=sc.geometry.circle(3)).resample(101)
    device = sc.Device("d", layers=[layer], films=[disk], length_units="um")
    device.make_mesh(max_edge_length=0.35)
    solution = sc.solve(
        device,
        applied_field=sc.sources.ConstantField(1.0),
        field_units="mT",
        progress_bar=False,
    )[-1]
    fs = solution.film_solutions["disk"]
    sheet = sc.sources.SheetCurrentField(
        sheet_positions=np.asarray(device.meshes["disk"].sites),
        current_densities=np.asarray(fs.current_density),
        z0=0.0,
        length_units="um",
        current_units="mA",
    )
    print("SheetCurrentField (from solution) at z=1:", float(sheet(0.0, 0.0, 1.0)))


if __name__ == "__main__":
    main()
