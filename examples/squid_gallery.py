"""Draw every real SQUID susceptometer layout in the device library
(analog of the reference's ``docs/notebooks/squids/show_all.py``).

Renders the seven registered layouts (hypres 400 nm / 250 nm, IBM
small->xlarge, Huber) in one row of panels and saves a PNG.

Run: python examples/squid_gallery.py [--no-terminals] [--out gallery.png]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

from superscreen_tpu.squids import SQUID_LAYOUTS


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--no-terminals", action="store_true")
    parser.add_argument("--out", default="squid_gallery.png")
    args = parser.parse_args()

    names = list(SQUID_LAYOUTS)
    fig, axes = plt.subplots(
        1, len(names), figsize=(3 * len(names), 3), constrained_layout=True
    )
    for ax, name in zip(axes, names):
        device = SQUID_LAYOUTS[name](with_terminals=not args.no_terminals)
        device.plot_polygons(ax=ax, legend=False)
        ax.set_title(name)
        ax.set_aspect("equal")
    fig.savefig(args.out, dpi=200)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
