"""Vortex-entry critical current of a transport strip from ONE landscape.

In the linear London model the probe-vortex energy is linear in the
transport drive: E(r; I) = E_self(r) + I * E_int(r; 1 mA).  The
Bean-Livingston entry condition -- the edge barrier vanishes along the
entry path -- therefore reduces to a per-site ratio with NO sweep at all:

    I_c = max over entry-path sites of  E_self(r) / (-E_int(r; 1 mA)),

computed from a single `vortex_energy_landscape` call (one background
solve + the response diagonal of the existing factorization).  The same
linearity gives the full barrier-vs-drive curve for free.

The absolute I_c is mesh-regularized (the mesh scale plays the role of the
coherence length cutting off the vortex core, as xi does in the
Bean-Livingston theory), so treat the numbers as regularized estimates;
RATIOS across geometries/Lambda at fixed mesh density are meaningful.

Run: JAX_PLATFORMS=cpu python examples/critical_current.py  (or on TPU)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import superscreen_tpu as sc
from superscreen_tpu import vortex_energy_landscape


def make_strip(width, Lambda, max_edge=0.4):
    strip = sc.Device(
        "strip",
        layers=[sc.Layer("L", Lambda=Lambda, z0=0)],
        films=[
            sc.Polygon(
                "strip",
                layer="L",
                points=sc.geometry.box(width, 10.0, points=401),
            )
        ],
        terminals={
            "strip": [
                sc.Polygon(
                    "source", points=sc.geometry.box(width, 0.1, center=(0, 5.0))
                ),
                sc.Polygon(
                    "drain", points=sc.geometry.box(width, 0.1, center=(0, -5.0))
                ),
            ]
        },
        length_units="um",
        solve_dtype="float64",
    )
    strip.make_mesh(max_edge_length=max_edge, smooth=5, preserve_boundary=True)
    return strip


def entry_current(strip, width, band=0.4, edge_depth=None):
    """I_c (mA) for vortex entry along the midline band |y| < band.

    The Bean-Livingston barrier lives within ~a core size of the edge, so
    the entry condition is evaluated over sites within ``edge_depth`` of
    the entry edge: the barrier is gone when E = E_self + I*E_int <= 0
    throughout that band, i.e. I_c = max E_self / (-E_int) there.  (Deeper
    sites are excluded: toward the strip center the transport stream -> 0,
    so E_int -> 0 and the ratio diverges -- but a vortex past the edge
    barrier stops at force balance; it does not need E < 0 at the center.)
    """
    ls = vortex_energy_landscape(
        strip,
        terminal_currents={"strip": {"source": "1 mA", "drain": "-1 mA"}},
        field_units="mT",
        current_units="mA",
    )
    if edge_depth is None:
        # Stay well clear of the centerline, where the transport stream
        # (hence E_int) crosses zero and the ratio diverges.
        edge_depth = width / 4
    mid = np.abs(ls.sites[:, 1]) < band
    # Entry side: where the Lorentz force pulls the vortex inward, i.e.
    # the interaction term is negative.
    attract = mid & (ls.interaction < 0)
    depth = width / 2 - np.abs(ls.sites[:, 0])
    edge_band = attract & (depth < edge_depth)
    ratios = ls.self_energy[edge_band] / (-ls.interaction[edge_band])
    return float(ratios.max()), ls


def main():
    print("Vortex-entry critical current (mesh-regularized London model):")
    print(f"{'W (um)':>7} {'Lambda (um)':>12} {'I_c (mA)':>9} {'J_edge,c (mA/um)':>17}")
    for width, Lambda in [(2.0, 0.5), (4.0, 0.5), (4.0, 2.0)]:
        strip = make_strip(width, Lambda)
        Ic, ls = entry_current(strip, width)
        # Edge sheet-current density at the critical drive.
        edge_pts = np.array([[width / 2 - 0.15, 0.0]])
        J = np.asarray(
            ls.background.interp_current_density(
                edge_pts, film="strip", units="mA/um", with_units=False
            )
        )[0]
        print(
            f"{width:7.1f} {Lambda:12.2f} {Ic:9.2f} "
            f"{Ic * np.linalg.norm(J):17.2f}"
        )
    print(
        "\nExpect: I_c grows with width (a wider strip carries less edge "
        "current per mA) and falls with Lambda (the vortex self-energy "
        "barrier ~ Phi_0^2/Lambda shrinks in a dirtier film, so it admits "
        "vortices at lower drive)."
    )


if __name__ == "__main__":
    main()
