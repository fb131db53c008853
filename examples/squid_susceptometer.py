"""BASELINE config 4: a two-coil scanning-SQUID susceptometer -- field
coil / pickup loop mutual inductance with self-consistent inter-layer
screening.

Run: python examples/squid_susceptometer.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from superscreen_tpu import squids


def main():
    for preset in ("small", "large"):
        device = squids.make_squid(preset, with_terminals=True)
        device.make_mesh(max_edge_length=0.1 * squids.SQUID_PRESETS[preset].ro_fc)
        sizes = {k: len(m.sites) for k, m in device.meshes.items()}
        M = squids.squid_mutual_inductance(device, iterations=4)
        print(
            f"{preset}: mesh {sizes} -> "
            f"M(fc -> pl) = {M:.2f~P} = {M.to('pH'):.4~P}"
        )


if __name__ == "__main__":
    main()
