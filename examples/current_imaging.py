"""Current imaging: reconstruct a circulating current distribution from a
magnetometry map.

Solve a superconducting ring with a constriction carrying a circulating
current, "measure" Bz on a plane above it, then invert the map for the
stream function and sheet current with `superscreen_tpu.imaging`
(Fourier deconvolution, Roth et al. 1989) -- the standard analysis
applied to scanning-SQUID / NV magnetometry data.

(Net transport current is invisible to a periodic Fourier inversion --
the stream function of a through-going current is not periodic -- so the
classic demonstration is a circulating geometry: the ring's current and
its crowding at the constriction are fully recoverable.)

Run: python examples/current_imaging.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import superscreen_tpu as sc
from superscreen_tpu import imaging


def main():
    ring = sc.Polygon(
        "ring", layer="base", points=sc.geometry.circle(4.0, points=100)
    )
    # A notch constricting the annulus near x = +4.
    notch = sc.Polygon(points=sc.geometry.circle(1.2, points=50, center=(4.0, 0)))
    ring = ring.difference(notch).set_name("ring").set_layer("base")
    device = sc.Device(
        "ring",
        layers=[sc.Layer("base", Lambda=0.4, z0=0)],
        films=[ring],
        holes=[
            sc.Polygon(
                "hole", layer="base", points=sc.geometry.circle(1.8, points=50)
            )
        ],
        length_units="um",
        solve_dtype="float64",
    )
    device.make_mesh(min_points=3000, smooth=5)
    solution = sc.solve(
        device,
        applied_field=sc.sources.ConstantField(0),
        circulating_currents={"hole": "1 mA"},
        field_units="mT",
        current_units="mA",
        progress_bar=False,
    )[-1]

    # "Measure" Bz at z = 0.5 um on a padded grid.
    n, L, z = 192, 24.0, 0.5
    xs = np.linspace(-L / 2, L / 2, n, endpoint=False)
    dx = float(xs[1] - xs[0])
    X, Y = np.meshgrid(xs, xs)
    pts = np.column_stack([X.ravel(), Y.ravel()])
    bz = np.asarray(
        solution.field_at_position(pts, zs=z, units="mT", with_units=False)
    ).reshape(n, n)
    print(f"measured |Bz| max: {np.abs(bz).max():.4f} mT at z = {z} um")

    g, jx, jy = imaging.invert_field_map(
        bz, dx, dx, z, field_units="mT", length_units="um", current_units="mA"
    )
    g = g - g[0, 0]  # gauge: g = 0 far outside

    # The circulating current is the stream-function step from outside to
    # the hole center: I = g(hole) - g(outside).
    i0, j0 = n // 2, n // 2
    I_rec = g[i0, j0]
    print(f"reconstructed circulating current: {I_rec:.3f} mA (drive: 1 mA)")

    # Current crowding: the same 1 mA squeezes through the narrower
    # channel left by the notch, so the peak |J| there exceeds the intact
    # side's, while the notch void itself carries ~no current.
    Jmag = np.hypot(jx, jy)
    left = (np.abs(Y) < 0.8) & (X > -3.7) & (X < -2.1)  # intact annulus
    channel = (np.abs(Y) < 0.5) & (X > 1.9) & (X < 2.8)  # constriction
    void = (X - 4.0) ** 2 + Y**2 < 0.7**2  # inside the notch
    print(
        f"peak |J| intact side: {Jmag[left].max():.4f} mA/um; "
        f"constriction: {Jmag[channel].max():.4f} mA/um; "
        f"notch void mean: {Jmag[void].mean():.4f} mA/um"
    )
    assert abs(I_rec - 1.0) < 0.05
    assert Jmag[channel].max() > 1.2 * Jmag[left].max()
    assert Jmag[void].mean() < 0.3 * Jmag[channel].max()
    print("current image recovers the drive and resolves the constriction")


if __name__ == "__main__":
    main()
