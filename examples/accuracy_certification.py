"""Certify (and polish) the accuracy of a batched sweep at full scale.

The reference package offers a per-solve inversion self-check
(``check_inversion``, reference ``solver/solve_film.py:533-539``) that
re-multiplies the solved stream function through the system matrix.  This
example shows the benchmark-scale TPU-native analog:

1. ``certify_sweep`` computes float64 relative residuals
   ``||A g + h|| / ||h||`` for every film and sweep point with the system
   matrix staying ON DEVICE (blocked f64 matvec, f32 row blocks upcast on
   the fly), plus an independent host-NumPy f64 spot check on a few
   hundred gathered matrix rows.
2. ``solve_many(final_refine=2)`` applies a float64 final polish to the
   delivered streams: the in-sweep f32 refinement floors at ~5e-5
   relative residual at 100k-vertex scale; two f64 polish steps reach the
   ~1e-8 floor for a few seconds of extra wall time.  Polished sweeps
   DELIVER float64 arrays by default, so the residual certified below is
   the polish floor on what the user actually holds (pass
   ``result_dtype="float32"`` to keep f32 storage).

Run: python examples/accuracy_certification.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import superscreen_tpu as sc
from superscreen_tpu.certify import certify_sweep
from superscreen_tpu.sweep import _get_sweep_data, solve_many


def make_device():
    layers = [
        sc.Layer("bottom", Lambda=0.8, z0=0),
        sc.Layer("top", Lambda=0.4, z0=0.8),
    ]
    films = [
        sc.Polygon("big", layer="bottom", points=sc.geometry.circle(6.0, points=100)),
        sc.Polygon("small", layer="top", points=sc.geometry.circle(4.0, points=80)),
    ]
    holes = [
        sc.Polygon("hole", layer="bottom", points=sc.geometry.circle(2.5, points=50)),
    ]
    device = sc.Device(
        "stack", layers=layers, films=films, holes=holes, length_units="um"
    )
    device.make_mesh(max_edge_length=0.35)
    return device


def main():
    device = make_device()
    print("mesh sizes:", {k: len(m.sites) for k, m in device.meshes.items()})
    model = sc.factorize_model(device=device, current_units="uA")

    fields = np.linspace(0.2, 1.0, 4)
    result = solve_many(
        model=model,
        applied_fields=[sc.sources.ConstantField(v) for v in fields],
        field_units="mT",
        iterations=3,
        final_refine=2,  # f64 polish of the final systems
    )
    rep = result.final_refine_report
    print(
        "polish: residual "
        f"{rep['residual_rel_max_before']:.2e} -> "
        f"{rep['residual_rel_max_after']:.2e} (f64 iterate)"
    )

    # Independent certification of the DELIVERED streams (float64 here,
    # since final_refine>0 defaults to f64 delivery).
    # certify_sweep works in SOLVER units (current/length): convert the
    # mT applied fields and the stored other_fields (field_units) back.
    from superscreen_tpu.solver.utils import field_conversion_factor

    conv = field_conversion_factor(
        "mT",
        model.current_units,
        length_units=device.length_units,
        ureg=device.ureg,
    ).magnitude
    film_data = _get_sweep_data(model)
    dtype = device.solve_dtype
    Hz = {
        name: (
            conv * fields[:, None] * np.ones(film_data[name].n)[None, :]
        ).astype(dtype)
        for name in device.films
    }
    streams = {k: v for k, v in result.streams.items()}
    others = {k: conv * v for k, v in result.other_fields.items()}
    report = certify_sweep(
        film_data, streams, others, Hz, refine_steps=2, n_sample_rows=128
    )
    print("delivered residual_rel_max:", f"{report['residual_rel_max']:.2e}")
    print(
        "f64-refined stream delta:",
        f"{report['refined_stream_delta_max']:.2e}",
    )
    print(
        "device-vs-host f64 agreement on sampled rows:",
        f"{report['sampled_row_rel_disagreement']:.2e}",
    )


if __name__ == "__main__":
    main()
