"""Pickup-loop / field-coil mutual inductance of the real IBM SQUID
susceptometer layouts (the reference's validation workload,
``docs/notebooks/squids/mutuals.py``).

For each layout the field coil is cut open, a transport current is driven
source -> drain through it, and the mutual is the pickup-loop fluxoid per
unit current.  ``--scale`` coarsens the reference meshing targets for a
quick run (1.0 reproduces the reference workload scale).

Run: python examples/ibm_squid_mutuals.py [--scale 3.0] [--iterations 4]
     [--layouts ibm-small ibm-large huber]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--scale", type=float, default=3.0)
    parser.add_argument("--iterations", type=int, default=4)
    parser.add_argument("--smooth", type=int, default=20)
    parser.add_argument("--layouts", nargs="*", default=["ibm-small", "ibm-medium"])
    args = parser.parse_args()

    from superscreen_tpu.squids import compute_mutuals

    t0 = time.time()
    mutuals = compute_mutuals(
        names=args.layouts,
        iterations=args.iterations,
        smooth=args.smooth,
        max_edge_scale=args.scale,
    )
    for name, mutual in mutuals.items():
        print(f"{name}: {mutual.magnitude:.2f} Phi_0/A "
              f"({mutual.to('pH').magnitude:.2f} pH)")
    print(f"total {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
