"""Tests for vortex energetics (superscreen_tpu.vortices).

Oracles: the solver's own vortex path (the landscape's self-energy is the
response diagonal the vortex solve uses, so a one-site cross-check against
``solve(vortices=[...])`` is exact), finite differences of the landscape,
and the sign physics of the London model (image attraction to edges,
trapping by aligned screening currents, vortex-vortex repulsion, Lorentz
force from a transport current).
"""

import numpy as np
import pytest

import superscreen_tpu as sc
from superscreen_tpu import vortex_energy_landscape
from superscreen_tpu.units import ureg


@pytest.fixture(scope="module")
def disk():
    dev = sc.Device(
        "disk",
        layers=[sc.Layer("L", Lambda=0.5, z0=0)],
        films=[
            sc.Polygon(
                "disk", layer="L", points=sc.geometry.circle(4.0, points=120)
            )
        ],
        length_units="um",
        solve_dtype="float64",
    )
    dev.make_mesh(min_points=1600, smooth=5)
    return dev


@pytest.fixture(scope="module")
def zero_field_landscape(disk):
    return vortex_energy_landscape(disk, field_units="mT", current_units="mA")


def test_self_energy_consistent_with_solver(disk, zero_field_landscape):
    """E_self at a site equals (1/2) Phi_0 times the core stream of an
    actual solve() with a vortex at that site -- same response column."""
    ls = zero_field_landscape
    # A site well inside the film.
    k = int(np.argmin(np.linalg.norm(ls.sites - [1.0, 0.5], axis=1)))
    xy = ls.sites[k]
    sol = sc.solve(
        disk,
        applied_field=sc.sources.ConstantField(0),
        vortices=[sc.Vortex(x=float(xy[0]), y=float(xy[1]), film="disk")],
        field_units="mT",
        current_units="mA",
        progress_bar=False,
    )[-1]
    g_core = float(
        np.asarray(sol.film_solutions["disk"].stream)[ls.indices[k]]
    )
    expected = 0.5 * ureg(f"{g_core} Phi_0 * mA").to("eV").magnitude
    assert ls.self_energy[k] == pytest.approx(expected, rel=1e-10)
    # Zero background: no interaction term.
    np.testing.assert_allclose(ls.interaction, 0.0, atol=1e-12)
    # total() scaling: quadratic in nPhi0 for pure self-energy.
    np.testing.assert_allclose(
        ls.total(2.0), 4.0 * ls.total(1.0), rtol=1e-12
    )


def test_image_attraction_to_edge(zero_field_landscape):
    """Self-energy is positive and falls monotonically toward the film
    edge (image attraction), sampled along a radius."""
    ls = zero_field_landscape
    assert (ls.self_energy > 0).all()
    r = np.linalg.norm(ls.sites, axis=1)
    # Bin by radius; mean energy should decrease outward.
    edges = np.linspace(0, 3.8, 9)
    means = [
        ls.self_energy[(r >= a) & (r < b)].mean()
        for a, b in zip(edges[:-1], edges[1:])
    ]
    assert all(x > y for x, y in zip(means[:-1], means[1:]))
    # The energy scale is Phi_0^2 / mu_0 ~ eV-to-keV for um films.
    assert 1.0 < ls.self_energy.max() < 1e5


def test_trapping_by_screening_currents(disk):
    """An aligned (+1) probe in a +z-field-cooled disk is pulled toward
    the center (E_int minimal there); an antivortex (-1) is expelled."""
    ls = vortex_energy_landscape(
        disk,
        applied_field=sc.sources.ConstantField(0.2),
        field_units="mT",
        current_units="mA",
    )
    r = np.linalg.norm(ls.sites, axis=1)
    k_center = int(np.argmin(r))
    # Diamagnetic background stream -> negative interaction for +1.
    assert ls.interaction[k_center] < 0
    assert ls.interaction[k_center] == pytest.approx(ls.interaction.min())
    # Antivortex: interaction flips sign, so the center is a maximum of
    # the linear term.
    E_anti = ls.total(-1.0)
    E_vort = ls.total(+1.0)
    assert E_anti[k_center] > E_vort[k_center]


def test_bean_livingston_barrier(disk):
    """At moderate field the total energy along a radius has an interior
    maximum (the entry barrier) separating the edge from the trapped
    minimum; at high field the barrier collapses and the center is
    globally favorable (E < 0)."""

    def radial_profile(H_mT):
        ls = vortex_energy_landscape(
            disk,
            applied_field=sc.sources.ConstantField(H_mT),
            field_units="mT",
            current_units="mA",
        )
        r = np.linalg.norm(ls.sites, axis=1)
        edges = np.linspace(0, 3.9, 20)
        prof = np.array(
            [
                ls.total(1.0)[(r >= a) & (r < b)].mean()
                for a, b in zip(edges[:-1], edges[1:])
            ]
        )
        return prof  # index 0 = center, last = edge

    low = radial_profile(0.05)
    high = radial_profile(5.0)
    # Low field: still a barrier -- the profile rises moving inward from
    # the edge before any trapping gain (max not at the outermost bin),
    # and the center is NOT energetically favorable vs outside.
    assert np.argmax(low) < len(low) - 1
    assert low[0] > 0
    # High field: deep trapping at the center.
    assert high[0] < 0
    assert high[0] == pytest.approx(high.min())


def test_vortex_vortex_repulsion(disk):
    """A frozen +1 vortex raises the landscape for a +1 probe nearby:
    interaction decays with distance (repulsion), and the pair energy
    matches Phi_0 times the frozen vortex's screened stream (reciprocity
    with the solver)."""
    frozen_xy = (0.8, 0.0)
    ls = vortex_energy_landscape(
        disk,
        vortices=[sc.Vortex(x=frozen_xy[0], y=frozen_xy[1], film="disk")],
        field_units="mT",
        current_units="mA",
    )
    d = np.linalg.norm(ls.sites - frozen_xy, axis=1)
    near = ls.interaction[(d > 0.3) & (d < 0.6)].mean()
    far = ls.interaction[(d > 2.0) & (d < 2.5)].mean()
    assert near > far > 0
    # Reciprocity: E_int(k) == Phi_0 * g_frozen(site k), exactly, since
    # the background IS the frozen vortex's solve.
    g = np.asarray(
        ls.background.film_solutions["disk"].stream
    )[ls.indices]
    np.testing.assert_allclose(
        ls.interaction, ureg("1 Phi_0 * mA").to("eV").magnitude * g,
        rtol=1e-12,
    )


def test_force_is_minus_gradient(disk):
    """force() equals -grad(total energy): cross-check against a finite
    difference of the landscape interpolated along x, and against the
    Lorentz force Phi_0 (J x z) computed from the background currents."""
    ls = vortex_energy_landscape(
        disk,
        applied_field=sc.sources.ConstantField(1.0),
        field_units="mT",
        current_units="mA",
    )
    p = np.array([1.5, 0.3])
    F = ls.force(p[None], nPhi0=1.0, units="pN")[0]
    assert np.isfinite(F).all()

    # Lorentz part: Phi_0 (J_b x z) = Phi_0 (J_y, -J_x) at p.
    J = np.asarray(
        ls.background.interp_current_density(
            p[None], film="disk", units="mA/um", with_units=False
        )
    )[0]
    F_lorentz = (
        ureg("1 Phi_0 * mA / um").to("pN").magnitude
        * np.array([J[1], -J[0]])
    )
    # Image part: finite difference of the self-energy interpolated on the
    # mesh (coarse -- compare at 15%).
    from superscreen_tpu.ops import interp as _interp

    mesh = disk.meshes["disk"]
    idx = _interp.build_triangle_index(
        np.asarray(mesh.sites, dtype=float), np.asarray(mesh.elements)
    )
    E_full = ls.energy_map(1.0)
    eps = 0.15
    dEx = (
        np.asarray(_interp.interp_linear(idx, E_full, p[None] + [eps, 0]))[0]
        - np.asarray(
            _interp.interp_linear(idx, E_full, p[None] - [eps, 0])
        )[0]
    ) / (2 * eps)
    dEy = (
        np.asarray(_interp.interp_linear(idx, E_full, p[None] + [0, eps]))[0]
        - np.asarray(
            _interp.interp_linear(idx, E_full, p[None] - [0, eps])
        )[0]
    ) / (2 * eps)
    F_fd = -np.array([dEx, dEy]) * ureg("1 eV/um").to("pN").magnitude
    scale = max(np.abs(F_fd).max(), np.abs(F).max())
    np.testing.assert_allclose(F, F_fd, atol=0.15 * scale)
    # The Lorentz part dominates at 1 mT here; direction must agree.
    cos = F @ F_lorentz / (
        np.linalg.norm(F) * np.linalg.norm(F_lorentz)
    )
    assert cos > 0.9
    # Outside the film: NaN.
    F_out = ls.force(np.array([[10.0, 0.0]]))
    assert np.isnan(F_out).all()
    # with_units plumbing.
    Fq = ls.force(p[None], units="fN", with_units=True)
    assert Fq.to("pN").magnitude[0, 0] == pytest.approx(F[0], rel=1e-10)


def test_transport_tilt():
    """A transport current tilts the landscape: the Lorentz force pushes a
    +1 vortex toward one strip edge (force sign fixed by F = J x Phi_0 z;
    uniform +y current -> force along +x)."""
    strip = sc.Device(
        "strip",
        layers=[sc.Layer("L", Lambda=0.5, z0=0)],
        films=[
            sc.Polygon(
                "strip",
                layer="L",
                points=sc.geometry.box(4.0, 10.0, points=401),
            )
        ],
        terminals={
            "strip": [
                sc.Polygon("source", points=sc.geometry.box(4.0, 0.1, center=(0, 5.0))),
                sc.Polygon("drain", points=sc.geometry.box(4.0, 0.1, center=(0, -5.0))),
            ]
        },
        length_units="um",
        solve_dtype="float64",
    )
    strip.make_mesh(min_points=1600, smooth=5, preserve_boundary=True)
    ls = vortex_energy_landscape(
        strip,
        terminal_currents={"strip": {"source": "-1 mA", "drain": "1 mA"}},
        field_units="mT",
        current_units="mA",
    )
    # Current flows -y (source at +y injects -1). J = (0, -J0) ->
    # F = Phi_0 (J_y, -J_x) = (-Phi_0 J0, 0): force along -x. Flip drive
    # sign symmetry instead of trusting the sign bookkeeping: compare the
    # two drives.
    ls2 = vortex_energy_landscape(
        strip,
        terminal_currents={"strip": {"source": "1 mA", "drain": "-1 mA"}},
        field_units="mT",
        current_units="mA",
    )
    p = np.array([[0.0, 0.0]])
    Fx1 = ls.force(p)[0, 0]
    Fx2 = ls2.force(p)[0, 0]
    # Antisymmetric up to the terminal-bootstrap path asymmetry (~1e-3).
    assert Fx1 == pytest.approx(-Fx2, rel=1e-2)
    assert abs(Fx1) > 0
    # Magnitude: |F| ~= Phi_0 * |J| at the center (image force ~ 0 by
    # symmetry).
    J = np.asarray(
        ls.background.interp_current_density(
            p, film="strip", units="mA/um", with_units=False
        )
    )[0]
    F_expected = ureg("1 Phi_0 * mA / um").to("pN").magnitude * np.array(
        [J[1], -J[0]]
    )
    np.testing.assert_allclose(
        ls.force(p)[0], F_expected, rtol=0.1
    )


def test_pinning_at_lambda_weak_spot(disk):
    """The classic pinning-landscape use case: a defect with locally
    suppressed superfluid density has an ENHANCED Lambda = lambda^2/d
    (larger penetration depth), which lowers the probe's self-energy there
    (thin-film vortex energy ~ Phi_0^2/Lambda): a pinning well."""
    spot = (1.2, -0.8)

    def weak_lambda(x, y, *, x0, y0):
        x = np.asarray(x, dtype=float)
        y = np.asarray(y, dtype=float)
        bump = 1.5 * np.exp(-(((x - x0) ** 2 + (y - y0) ** 2) / (2 * 0.35**2)))
        return 0.5 + bump

    weak = sc.Device(
        "weak",
        layers=[
            sc.Layer(
                "L",
                Lambda=sc.Parameter(weak_lambda, x0=spot[0], y0=spot[1]),
                z0=0,
            )
        ],
        films=[
            sc.Polygon(
                "disk", layer="L", points=sc.geometry.circle(4.0, points=120)
            )
        ],
        length_units="um",
        solve_dtype="float64",
    )
    weak.make_mesh(min_points=1600, smooth=5)
    ls = vortex_energy_landscape(weak, field_units="mT", current_units="mA")
    d = np.linalg.norm(ls.sites - spot, axis=1)
    at_spot = ls.self_energy[d < 0.25].mean()
    ring = ls.self_energy[(d > 0.8) & (d < 1.2)].mean()
    # The defect lowers the probe energy locally: a pinning well.
    assert at_spot < 0.85 * ring
    # The minimum energy site sits at the defect.
    k_min_r = np.linalg.norm(
        ls.sites[np.argmin(ls.self_energy + np.where(
            np.linalg.norm(ls.sites, axis=1) > 3.0, np.inf, 0.0
        ))] - spot
    )
    assert k_min_r < 0.3


def test_hdf5_roundtrip_and_plot(tmp_path, disk, zero_field_landscape):
    import h5py
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from superscreen_tpu.vortices import VortexLandscape

    ls = zero_field_landscape
    path = tmp_path / "landscape.h5"
    with h5py.File(path, "w") as f:
        ls.to_hdf5(f.create_group("landscape"))
    with h5py.File(path, "r") as f:
        ls2 = VortexLandscape.from_hdf5(f["landscape"])
    assert ls2.film == ls.film and ls2.units == ls.units
    np.testing.assert_array_equal(ls2.indices, ls.indices)
    np.testing.assert_allclose(ls2.self_energy, ls.self_energy)
    np.testing.assert_allclose(ls2.interaction, ls.interaction)
    # The restored landscape is fully functional (force path included).
    F = ls2.force(np.array([[1.0, 0.5]]))
    np.testing.assert_allclose(F, ls.force(np.array([[1.0, 0.5]])), rtol=1e-8)
    fig, ax = ls2.plot()
    plt.close(fig)


def test_validation(disk):
    with pytest.raises(ValueError, match="exactly one"):
        vortex_energy_landscape()
    with pytest.raises(ValueError, match="exactly one"):
        from superscreen_tpu.solver import factorize_model

        m = factorize_model(device=disk, current_units="mA")
        vortex_energy_landscape(disk, model=m)
    with pytest.raises(ValueError, match="baked into the model"):
        from superscreen_tpu.solver import factorize_model

        m = factorize_model(device=disk, current_units="mA")
        vortex_energy_landscape(
            model=m, vortices=[sc.Vortex(x=0, y=0, film="disk")]
        )
    with pytest.raises(KeyError, match="not in device"):
        vortex_energy_landscape(disk, film="nope")


@pytest.fixture(scope="module")
def small_disk():
    """A coarse disk so the matrix-free exact diagonal (one probe solve
    per site) stays cheap."""
    dev = sc.Device(
        "small_disk",
        layers=[sc.Layer("L", Lambda=0.5, z0=0)],
        films=[
            sc.Polygon(
                "disk", layer="L", points=sc.geometry.circle(4.0, points=60)
            )
        ],
        length_units="um",
        solve_dtype="float64",
    )
    dev.make_mesh(min_points=400, smooth=5)
    return dev


def test_matrix_free_landscape_matches_dense(small_disk, monkeypatch):
    """VERDICT r2 item 7: the landscape works for films in low-memory
    (matrix-free) mode and matches the dense result on a small control."""
    from superscreen_tpu.solver import utils as solver_utils

    field = sc.sources.ConstantField(0.5)
    dense = vortex_energy_landscape(
        small_disk, applied_field=field, field_units="mT"
    )
    monkeypatch.setattr(solver_utils, "MAX_DENSE_KERNEL_SIZE", 10)
    monkeypatch.setenv("SUPERSCREEN_TPU_LARGE_FACTOR", "cg")
    model = sc.factorize_model(device=small_disk, current_units="mA")
    assert model.film_systems["disk"].lu_piv[0] == "cg"
    mf = vortex_energy_landscape(
        model=model, applied_field=field, field_units="mT",
        diag_method="exact",
    )
    assert np.array_equal(dense.indices, mf.indices)
    scale = np.abs(dense.self_energy).max()
    assert np.abs(dense.self_energy - mf.self_energy).max() < 1e-5 * scale
    i_scale = np.abs(dense.interaction).max()
    assert np.abs(dense.interaction - mf.interaction).max() < 1e-5 * i_scale


def test_matrix_free_landscape_probing_estimator(small_disk, monkeypatch):
    """The colored-Hutchinson probing diagonal is unbiased: with enough
    repeats and a wide separation it tracks the exact diagonal site-wise
    to a few percent on this small control."""
    from superscreen_tpu.solver import utils as solver_utils

    dense = vortex_energy_landscape(small_disk, field_units="mT")
    monkeypatch.setattr(solver_utils, "MAX_DENSE_KERNEL_SIZE", 10)
    monkeypatch.setenv("SUPERSCREEN_TPU_LARGE_FACTOR", "cg")
    probe = vortex_energy_landscape(
        small_disk,
        field_units="mT",
        diag_method="probing",
        diag_options={"separation": 2.0, "repeats": 8, "seed": 1},
    )
    rel = np.abs(probe.self_energy - dense.self_energy) / np.abs(
        dense.self_energy
    )
    # Unbiased estimator: median site error small, worst site bounded by
    # the documented same-color response bound.
    assert np.median(rel) < 0.05
    assert rel.max() < 0.35
