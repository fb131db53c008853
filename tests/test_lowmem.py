"""The low-memory (matrix-free kernel) factorization path must agree with
the dense path to machine precision."""

import numpy as np
import pytest

import superscreen_tpu as sc
import superscreen_tpu.geometry as geo
from superscreen_tpu.solver import utils as solver_utils


@pytest.fixture(scope="module")
def device():
    layers = [sc.Layer("layer1", Lambda=2, z0=0)]
    films = [sc.Polygon("ring", layer="layer1", points=geo.circle(4, points=80))]
    holes = [sc.Polygon("hole", layer="layer1", points=geo.circle(2, points=50))]
    device = sc.Device(
        "ring", layers=layers, films=films, holes=holes, solve_dtype="float64"
    )
    device.make_mesh(max_edge_length=0.4)
    return device


def _solve(device, **kwargs):
    return sc.solve(
        device=device,
        applied_field=sc.sources.ConstantField(0.5),
        circulating_currents={"hole": "500 uA"},
        field_units="mT",
        current_units="uA",
        progress_bar=False,
        **kwargs,
    )[-1]


def test_lowmem_matches_dense(device, monkeypatch):
    dense = _solve(device)
    monkeypatch.setattr(solver_utils, "MAX_DENSE_KERNEL_SIZE", 10)
    lowmem = _solve(device)
    a = dense.film_solutions["ring"]
    b = lowmem.film_solutions["ring"]
    scale = np.abs(a.stream).max()
    assert np.abs(a.stream - b.stream).max() < 1e-9 * scale
    assert np.allclose(a.self_field, b.self_field, rtol=1e-8, atol=1e-12)
    assert np.allclose(
        a.current_density, b.current_density, rtol=1e-8, atol=1e-12
    )


def test_lowmem_sweep_matches_dense(device, monkeypatch):
    from superscreen_tpu.sweep import solve_many

    model_dense = sc.factorize_model(device=device, current_units="uA")
    monkeypatch.setattr(solver_utils, "MAX_DENSE_KERNEL_SIZE", 10)
    model_lowmem = sc.factorize_model(device=device, current_units="uA")
    assert model_lowmem.film_info["ring"].kernel is None
    fields = [sc.sources.ConstantField(v) for v in (0.2, 1.0)]
    circ = [{"hole": 100.0}] * 2
    r_dense = solve_many(
        model=model_dense,
        applied_fields=fields,
        circulating_currents=circ,
        field_units="mT",
    )
    r_lowmem = solve_many(
        model=model_lowmem,
        applied_fields=fields,
        circulating_currents=circ,
        field_units="mT",
    )
    for i in range(2):
        a = r_dense.streams["ring"][i]
        b = r_lowmem.streams["ring"][i]
        assert np.abs(a - b).max() < 1e-9 * np.abs(a).max()
        assert np.allclose(
            r_dense.self_fields["ring"][i],
            r_lowmem.self_fields["ring"][i],
            rtol=1e-8,
            atol=1e-12,
        )


def test_lowmem_model_hdf5_roundtrip(device, monkeypatch, tmp_path):
    import h5py

    monkeypatch.setattr(solver_utils, "MAX_DENSE_KERNEL_SIZE", 10)
    model = sc.factorize_model(
        device=device, current_units="uA", circulating_currents={"hole": 1.0}
    )
    path = tmp_path / "model.h5"
    with h5py.File(path, "x") as f:
        model.to_hdf5(f)
    with h5py.File(path, "r") as f:
        loaded = sc.FactorizedModel.from_hdf5(f)
    assert loaded.film_info["ring"].kernel is None
    sol = sc.solve(
        model=loaded,
        applied_field=sc.sources.ConstantField(0.5),
        field_units="mT",
        progress_bar=False,
    )[-1]
    assert np.all(np.isfinite(sol.film_solutions["ring"].stream))


def test_cg_matches_dense(device, monkeypatch):
    """The matrix-free CG path (no materialized system at all) agrees with
    the dense path; exercises solve() end-to-end and the sweep engine."""
    dense = _solve(device)
    monkeypatch.setattr(solver_utils, "MAX_DENSE_KERNEL_SIZE", 10)
    monkeypatch.setenv("SUPERSCREEN_TPU_LARGE_FACTOR", "cg")
    model = sc.factorize_model(
        device=device,
        circulating_currents={"hole": "500 uA"},
        current_units="uA",
    )
    assert model.film_systems["ring"].A is None
    assert model.film_systems["ring"].lu_piv[0] == "cg"
    cg = sc.solve(
        model=model,
        applied_field=sc.sources.ConstantField(0.5),
        field_units="mT",
        progress_bar=False,
    )[-1]
    a = dense.film_solutions["ring"]
    b = cg.film_solutions["ring"]
    scale = np.abs(a.stream).max()
    assert np.abs(a.stream - b.stream).max() < 1e-5 * scale
    sf_scale = np.abs(a.self_field).max()
    assert np.abs(a.self_field - b.self_field).max() < 1e-5 * sf_scale


def test_cg_model_hdf5_roundtrip(device, monkeypatch, tmp_path):
    monkeypatch.setattr(solver_utils, "MAX_DENSE_KERNEL_SIZE", 10)
    monkeypatch.setenv("SUPERSCREEN_TPU_LARGE_FACTOR", "cg")
    model = sc.factorize_model(
        device=device,
        circulating_currents={"hole": "500 uA"},
        current_units="uA",
    )
    import h5py

    path = tmp_path / "cg_model.h5"
    with h5py.File(path, "w") as f:
        model.to_hdf5(f)
    with h5py.File(path, "r") as f:
        loaded = sc.FactorizedModel.from_hdf5(f)
    assert loaded.film_systems["ring"].lu_piv[0] == "cg"
    a = sc.solve(
        model=model,
        applied_field=sc.sources.ConstantField(0.5),
        field_units="mT",
        progress_bar=False,
    )[-1]
    b = sc.solve(
        model=loaded,
        applied_field=sc.sources.ConstantField(0.5),
        field_units="mT",
        progress_bar=False,
    )[-1]
    fa = a.film_solutions["ring"].stream
    fb = b.film_solutions["ring"].stream
    assert np.abs(fa - fb).max() < 1e-10 * np.abs(fa).max()


def _inhomogeneous_device(device):
    dev = device.copy(with_mesh=True)
    dev.solve_dtype = device.solve_dtype

    def linear(x, y, offset=2.0):
        return offset + 0.05 * (x + y)

    dev.layers["layer1"].Lambda = sc.Parameter(linear)
    return dev


def test_lowmem_inhomogeneous_lambda_matches_dense(device, monkeypatch):
    """VERDICT r1 item 6: position-dependent Lambda must work in low-memory
    mode (materialized-system path) and match the dense factorization."""
    dev = _inhomogeneous_device(device)
    dense = _solve(dev)
    monkeypatch.setattr(solver_utils, "MAX_DENSE_KERNEL_SIZE", 10)
    lowmem = _solve(dev)
    a = dense.film_solutions["ring"]
    b = lowmem.film_solutions["ring"]
    scale = np.abs(a.stream).max()
    assert np.abs(a.stream - b.stream).max() < 1e-9 * scale
    assert np.allclose(a.self_field, b.self_field, rtol=1e-8, atol=1e-12)


def test_lowmem_inhomogeneous_lambda_bicgstab(device, monkeypatch):
    """The fully matrix-free path must dispatch BiCGStab for the
    non-symmetric inhomogeneous-Lambda operator and agree with dense."""
    dev = _inhomogeneous_device(device)
    dense = _solve(dev)
    monkeypatch.setattr(solver_utils, "MAX_DENSE_KERNEL_SIZE", 10)
    monkeypatch.setenv("SUPERSCREEN_TPU_LARGE_FACTOR", "cg")
    model = sc.factorize_model(
        device=dev,
        current_units="uA",
        circulating_currents={"hole": "500 uA"},
    )
    sysm = model.film_systems["ring"]
    assert sysm.lu_piv[0] == "cg"
    assert int(np.asarray(sysm.lu_piv[1]["nonsym"])) == 1
    lowmem = sc.solve(
        model=model,
        applied_field=sc.sources.ConstantField(0.5),
        field_units="mT",
        progress_bar=False,
    )[-1]
    sa = dense.film_solutions["ring"].stream
    sb = lowmem.film_solutions["ring"].stream
    assert np.abs(sa - sb).max() < 1e-4 * np.abs(sa).max()
    assert np.allclose(
        dense.film_solutions["ring"].self_field,
        lowmem.film_solutions["ring"].self_field,
        rtol=1e-3,
        atol=1e-8,
    )


def test_fused_assembly_matches_legacy(device, monkeypatch):
    """The single-dispatch fused assembly (pad_n path) must reproduce the
    per-piece legacy assembly and hole vectors to round-off."""
    import importlib

    sf = importlib.import_module("superscreen_tpu.solver.solve_film")

    monkeypatch.setattr(solver_utils, "MAX_DENSE_KERNEL_SIZE", 10)
    model = sc.factorize_model(device=device, current_units="uA")
    info = model.film_info["ring"]
    ix = model.film_systems["ring"].indices
    n = len(info.weights)
    pad_to = -(-len(ix) // 2048) * 2048
    pad_n = -(-n // 2048) * 2048
    A_fused = np.asarray(
        sf._build_system_2d_lowmem(info, ix, pad_to, pad_n=pad_n)
    )
    A_legacy = np.asarray(
        sf._build_system_2d_lowmem(info, ix, pad_to, pad_n=None)
    )
    scale = np.abs(A_legacy).max()
    assert np.abs(A_fused - A_legacy).max() < 1e-12 * scale
    # The batched hole program (device Q part + host sparse part) must
    # match the eager per-hole vector.
    import jax.numpy as jnp

    hole_ix = info.hole_indices["hole"]
    dtype = np.asarray(info.weights).dtype
    sites_pad, w_pad, nfilm = sf._padded_film_arrays(info, pad_n, dtype)
    mask = np.zeros(nfilm, dtype=dtype)
    mask[hole_ix] = 1.0
    vec_mask = np.zeros(pad_n, dtype=dtype)
    vec_mask[:nfilm] = mask
    Qvs = np.asarray(
        sf._holes_Q_batched_jit()(
            jnp.asarray(sites_pad[None]),
            jnp.asarray(w_pad[None]),
            jnp.asarray(np.array([nfilm], dtype=np.int32)),
            jnp.asarray(np.array([0], dtype=np.int32)),
            jnp.asarray(vec_mask[None]),
        )
    )
    v_batched = Qvs[0][:nfilm] - sf._hole_host_part(info, mask)
    v_eager = sf._hole_effective_field_vector_lowmem(info, hole_ix)
    vscale = np.abs(v_eager).max()
    assert np.abs(v_batched - v_eager).max() < 1e-12 * vscale


def test_hole_vector_stays_consumable(device, monkeypatch):
    """Hole-system vectors may be device arrays (zero-readback
    factorization); every consumer np.asarray()s them on demand."""
    monkeypatch.setattr(solver_utils, "MAX_DENSE_KERNEL_SIZE", 10)
    model = sc.factorize_model(device=device, current_units="uA")
    A = model.hole_systems["ring"]["hole"].A
    assert np.ndim(A) == 1
    vec = np.asarray(A)
    assert np.all(np.isfinite(vec))
    # A solve with a circulating current consumes the vector.
    model.set_circulating_currents({"hole": 1.0})
    solutions = sc.solve(
        model=model,
        applied_field=sc.sources.ConstantField(0.0),
        progress_bar=False,
    )
    assert np.isfinite(solutions[-1].film_solutions["ring"].stream).all()


def test_c_vector_masked_matches_unmasked(device):
    from superscreen_tpu.ops import kernels

    sites = device.meshes["ring"].sites.astype(np.float64)
    n = len(sites)
    pad_n = n + 137
    sites_pad = np.zeros((pad_n, 2))
    sites_pad[:n] = sites
    mask = np.arange(pad_n) < n
    C_masked = np.asarray(
        kernels.C_vector_masked(sites_pad, mask, n, dtype="float64")
    )[:n]
    C_plain = np.asarray(kernels.C_vector(sites, dtype="float64"))
    assert np.abs(C_masked - C_plain).max() < 1e-14 * np.abs(C_plain).max()
