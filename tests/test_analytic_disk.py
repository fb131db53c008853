"""Analytic validation: magnetic moment of a superconducting disk.

For a thin disk of radius ``a`` in a uniform perpendicular field ``H``:

* Ideal-screening limit (Lambda -> 0): ``m_z = -(8/3) a^3 H`` and the
  sheet-current magnitude is ``|J|(r) = 4 H r / (pi sqrt(a^2 - r^2))``
  (Landau/Brandt thin-disk results; the reference package has no
  counterpart test -- this validates the same physics its Brandt solver
  encodes, cf. /root/reference/docs/background.rst:20-133).
* Weak-screening limit (Lambda >> a): the kernel term is negligible, so
  ``Lambda grad^2 g = -H`` with ``g = 0`` on the boundary gives
  ``g = H (a^2 - r^2) / (4 Lambda)`` and ``m_z = -pi a^4 H / (8 Lambda)``.

The magnetic moment is computed two independent ways: ``m_z = sum(g w)``
(the stream function IS the local dipole density) and
``m_z = 1/2 sum((r x J)_z w)``; their agreement is a tight internal
consistency check of the ``J = curl(g zhat)`` convention.
"""

import numpy as np
import pytest

import superscreen_tpu as sc

A_UM = 5.0
H_APPLIED = 1.0  # A/m


@pytest.fixture(scope="module")
def disk_device():
    device = sc.Device(
        "disk",
        layers=[sc.Layer("base", Lambda=1.0, z0=0)],
        films=[
            sc.Polygon(
                "disk", layer="base", points=sc.geometry.circle(A_UM, points=200)
            )
        ],
        length_units="um",
        solve_dtype="float64",
    )
    device.make_mesh(min_points=4000, smooth=10)
    return device


def _solve_disk(disk_device, Lambda):
    device = disk_device.copy(with_mesh=True)
    device.layers["base"].Lambda = Lambda
    solution = sc.solve(
        device,
        applied_field=sc.sources.ConstantField(H_APPLIED),
        field_units="A/m",
        current_units="uA",
        progress_bar=False,
    )[-1]
    mesh = device.meshes["disk"]
    film = solution.film_solutions["disk"]
    return mesh, np.asarray(film.stream), np.asarray(film.current_density)


def _moments(mesh, g, J):
    w = mesh.vertex_areas
    sites = mesh.sites
    m_from_g = float(np.sum(g * w))
    m_from_J = 0.5 * float(
        np.sum((sites[:, 0] * J[:, 1] - sites[:, 1] * J[:, 0]) * w)
    )
    return m_from_g, m_from_J


def test_ideal_screening_moment_and_profile(disk_device):
    mesh, g, J = _solve_disk(disk_device, Lambda=0.05)
    m_from_g, m_from_J = _moments(mesh, g, J)

    # Internal consistency of the two moment definitions (mesh-exact
    # identity up to the vertex-gradient quadrature).
    assert abs(m_from_J - m_from_g) <= 2e-3 * abs(m_from_g)

    # Ideal diamagnet: m = -(8/3) a^3 H. Finite Lambda=a/100 and the
    # unresolved penetration boundary layer leave a few-percent excess.
    m_ideal = -(8.0 / 3.0) * A_UM**3 * H_APPLIED
    assert m_from_g / m_ideal == pytest.approx(1.0, abs=0.06)

    # Current profile away from the center hole and the edge singularity.
    r = np.linalg.norm(mesh.sites, axis=1)
    sel = (r > 1.0) & (r < 3.5)
    J_mag = np.linalg.norm(J[sel], axis=1)
    J_ideal = 4 * H_APPLIED * r[sel] / (np.pi * np.sqrt(A_UM**2 - r[sel] ** 2))
    rel = np.abs(J_mag - J_ideal) / J_ideal
    assert np.median(rel) < 0.05
    assert np.percentile(rel, 90) < 0.12

    # Diamagnetic sign and azimuthal flow direction: J is CW for +z field
    # (r x J points in -z).
    assert m_from_g < 0


def test_weak_screening_moment_and_stream(disk_device):
    Lambda = 20.0
    mesh, g, J = _solve_disk(disk_device, Lambda=Lambda)
    m_from_g, m_from_J = _moments(mesh, g, J)
    assert abs(m_from_J - m_from_g) <= 2e-3 * abs(m_from_g)

    m_weak = -np.pi * A_UM**4 * H_APPLIED / (8 * Lambda)
    assert m_from_g / m_weak == pytest.approx(1.0, abs=0.025)

    # Pointwise stream function: g = -H (a^2 - r^2) / (4 Lambda) up to the
    # O(a/Lambda) kernel correction. The mesh extends past the film into
    # the default 5% vacuum margin (where g = 0 by construction), so only
    # compare on the film proper.
    r = np.linalg.norm(mesh.sites, axis=1)
    on_film = r <= 0.99 * A_UM
    g_weak = -H_APPLIED * (A_UM**2 - r**2) / (4 * Lambda)
    scale = np.max(np.abs(g_weak[on_film]))
    assert np.max(np.abs(g - g_weak)[on_film]) < 0.05 * scale
