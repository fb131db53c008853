"""Benchmark: batched self-consistent two-layer solve, TPU vs CPU baseline.

Workload (BASELINE.json config 4/5 shape): a two-layer device (two coaxial
rings with holes), one LU factorization, then a sweep of B applied-field
amplitudes solved self-consistently (``iterations`` rounds of inter-film
Biot-Savart coupling), executed as a single jitted batched computation on
the default JAX backend (TPU under axon).

The baseline is a faithful single-core NumPy/LAPACK implementation of the
same algorithm (the reference CPU package's hot path is LAPACK LU plus
numba pairwise kernels, which NumPy broadcasting approximates well).  The
baseline is measured on ``B_CPU`` sweep points and scaled linearly to B.

Prints one JSON line:
``{"metric": ..., "value": ..., "unit": "s", "vs_baseline": speedup}``.

Environment knobs: BENCH_MAX_EDGE (mesh density), BENCH_B (sweep size),
BENCH_ITER (coupling rounds), BENCH_CPU_POINTS (baseline sweep points).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def build_device(max_edge_length: float, dtype: str):
    import superscreen_tpu as sc

    layers = [
        sc.Layer("layer0", Lambda=1.0, z0=0),
        sc.Layer("layer1", Lambda=0.5, z0=1),
    ]
    films = [
        sc.Polygon(
            "big_ring", layer="layer0", points=sc.geometry.circle(7.5, points=120)
        ),
        sc.Polygon(
            "little_ring", layer="layer1", points=sc.geometry.circle(5, points=100)
        ),
    ]
    holes = [
        sc.Polygon(
            "big_hole", layer="layer0", points=sc.geometry.circle(3.75, points=70)
        ),
        sc.Polygon(
            "little_hole", layer="layer1", points=sc.geometry.circle(2.5, points=60)
        ),
    ]
    device = sc.Device(
        "two_rings", layers=layers, films=films, holes=holes, solve_dtype=dtype
    )
    device.make_mesh(max_edge_length=max_edge_length)
    return device


def tpu_workload(model, B, iterations, field_values):
    """The jitted batched sweep on the default backend."""
    import jax

    from superscreen_tpu.sweep import _film_sweep_data, _run_sweep

    films = list(model.device.films)
    film_data = {name: _film_sweep_data(model, name) for name in films}
    dtype = model.device.solve_dtype
    Hz = {
        name: np.asarray(field_values, dtype=dtype)[:, None]
        * np.ones(film_data[name].n, dtype=dtype)[None, :]
        for name in films
    }
    I_circ = {
        name: np.zeros((B, len(film_data[name].hole_names)), dtype=dtype)
        for name in films
    }
    vortex_flux = 1645.5

    def run():
        out = _run_sweep(film_data, Hz, I_circ, vortex_flux, iterations, 1)
        jax.block_until_ready(out)
        return out

    return run


def cpu_baseline(model, field_values, iterations):
    """Single-core NumPy/LAPACK version of the same sweep (per sweep point),
    mirroring the reference CPU algorithm."""
    import scipy.linalg as sla

    device = model.device
    films = list(device.films)
    data = {}
    for name in films:
        info = model.film_info[name]
        system = model.film_systems[name]
        mesh = device.meshes[name]
        lu_piv = sla.lu_factor(-system.A)
        gx = mesh.operators.gradient_x.to_dense(dtype=system.A.dtype)
        gy = mesh.operators.gradient_y.to_dense(dtype=system.A.dtype)
        data[name] = dict(
            info=info,
            interior=system.indices,
            lu_piv=lu_piv,
            Q=info.kernel,
            w=info.weights,
            gx=gx,
            gy=gy,
            sites=mesh.sites,
            z0=device.layers[info.layer].z0,
        )

    def biot_savart(src, dst, J):
        s = data[src]
        d = data[dst]
        dz2 = (d["z0"] - s["z0"]) ** 2
        out = np.zeros(len(d["sites"]))
        chunk = 1024
        for i in range(0, len(d["sites"]), chunk):
            P = d["sites"][i : i + chunk]
            dx = P[:, 0:1] - s["sites"][None, :, 0]
            dy = P[:, 1:2] - s["sites"][None, :, 1]
            r3 = (dx * dx + dy * dy + dz2) ** -1.5
            out[i : i + chunk] = (
                (s["w"][None, :] * (J[:, 0][None, :] * dy - J[:, 1][None, :] * dx) * r3)
                .sum(axis=1)
                / (4 * np.pi)
            )
        return out

    def solve_one(Hz_val):
        g = {}
        J = {}
        for name in films:
            d = data[name]
            n = len(d["sites"])
            h = np.full(len(d["interior"]), Hz_val, dtype=d["Q"].dtype)
            gf = sla.lu_solve(d["lu_piv"], h)
            gv = np.zeros(n)
            gv[d["interior"]] = gf
            g[name] = gv
            J[name] = np.stack([d["gy"] @ gv, -(d["gx"] @ gv)], axis=1)
        for _ in range(iterations):
            others = {name: np.zeros(len(data[name]["sites"])) for name in films}
            for srcf in films:
                for dstf in films:
                    if srcf != dstf:
                        others[dstf] += biot_savart(srcf, dstf, J[srcf])
            for name in films:
                d = data[name]
                h = (Hz_val + others[name])[d["interior"]]
                gf = sla.lu_solve(d["lu_piv"], h)
                gv = np.zeros(len(d["sites"]))
                gv[d["interior"]] = gf
                g[name] = gv
                J[name] = np.stack([d["gy"] @ gv, -(d["gx"] @ gv)], axis=1)
        # Self-field matvec, as in the reference post-solve.
        for name in films:
            d = data[name]
            _ = d["Q"] @ (d["w"] * g[name])
        return g

    t0 = time.perf_counter()
    for val in field_values:
        solve_one(val)
    return time.perf_counter() - t0


def main():
    max_edge = float(os.environ.get("BENCH_MAX_EDGE", "0.16"))
    B = int(os.environ.get("BENCH_B", "16"))
    iterations = int(os.environ.get("BENCH_ITER", "5"))
    b_cpu = int(os.environ.get("BENCH_CPU_POINTS", "2"))
    dtype = os.environ.get("BENCH_DTYPE", "float32")

    import jax

    import superscreen_tpu as sc

    backend = jax.default_backend()
    device = build_device(max_edge, dtype)
    sizes = {k: len(m.sites) for k, m in device.meshes.items()}
    n_total = sum(sizes.values())

    t0 = time.perf_counter()
    model = sc.factorize_model(device=device, current_units="uA")
    factorize_s = time.perf_counter() - t0

    field_values = np.linspace(0.1, 1.0, B)
    run = tpu_workload(model, B, iterations, field_values)

    t0 = time.perf_counter()
    run()
    compile_and_first_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    run()
    warm_s = time.perf_counter() - t0

    cpu_s_partial = cpu_baseline(model, field_values[:b_cpu], iterations)
    cpu_s = cpu_s_partial * (B / b_cpu)

    result = {
        "metric": (
            f"two-layer self-consistent sweep wall-clock "
            f"(B={B}, iters={iterations}, n={n_total}, {dtype}, {backend})"
        ),
        "value": round(warm_s, 4),
        "unit": "s",
        "vs_baseline": round(cpu_s / warm_s, 2),
        "detail": {
            "mesh_sizes": sizes,
            "factorize_s": round(factorize_s, 3),
            "compile_and_first_run_s": round(compile_and_first_s, 3),
            "warm_run_s": round(warm_s, 4),
            "cpu_baseline_s_scaled": round(cpu_s, 3),
            "cpu_points_measured": b_cpu,
            "backend": backend,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
