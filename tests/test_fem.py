import numpy as np
import pytest

import superscreen_tpu as sc
from superscreen_tpu import fem
from superscreen_tpu.device import generate_mesh
from superscreen_tpu.ops import fem as fem_ops


@pytest.fixture(scope="module")
def mesh():
    points, triangles = generate_mesh(
        sc.geometry.circle(1, points=100), min_points=1200
    )
    return sc.Mesh.from_triangulation(points, triangles)


def poly_and_grads(points, rng, degree):
    """A random polynomial of the given degree and its exact gradients."""
    x, y = points.T
    f = np.zeros_like(x)
    fx = np.zeros_like(x)
    fy = np.zeros_like(x)
    for i in range(degree + 1):
        for j in range(degree + 1 - i):
            c = rng.normal()
            f += c * x**i * y**j
            if i > 0:
                fx += c * i * x ** (i - 1) * y**j
            if j > 0:
                fy += c * j * x**i * y ** (j - 1)
    return f, fx, fy


@pytest.mark.parametrize("degree", [0, 1, 2])
def test_gradient_triangles_polynomials(mesh, degree):
    rng = np.random.default_rng(degree)
    f, fx, fy = poly_and_grads(mesh.sites, rng, degree)
    Gx = mesh.operators.gradient_tri_x
    Gy = mesh.operators.gradient_tri_y
    gx = np.asarray(Gx.matvec(f))
    gy = np.asarray(Gy.matvec(f))
    # Exact gradient at centroids for linear fields; approximate for deg 2.
    cent = mesh.triangle_centroids
    _, fx_c, fy_c = poly_and_grads(cent, np.random.default_rng(degree), degree)
    if degree <= 1:
        assert np.allclose(gx, fx_c, atol=1e-10)
        assert np.allclose(gy, fy_c, atol=1e-10)
    else:
        scale = max(np.abs(fx_c).max(), np.abs(fy_c).max())
        assert np.abs(gx - fx_c).max() < 0.05 * scale
        assert np.abs(gy - fy_c).max() < 0.05 * scale


@pytest.mark.parametrize("degree", [0, 1, 2])
def test_gradient_vertices_polynomials(mesh, degree):
    rng = np.random.default_rng(degree + 10)
    f, fx, fy = poly_and_grads(mesh.sites, rng, degree)
    gx = np.asarray(mesh.operators.gradient_x.matvec(f))
    gy = np.asarray(mesh.operators.gradient_y.matvec(f))
    interior = np.setdiff1d(np.arange(len(mesh.sites)), mesh.boundary_indices)
    if degree <= 1:
        assert np.allclose(gx[interior], fx[interior], atol=1e-10)
        assert np.allclose(gy[interior], fy[interior], atol=1e-10)
    else:
        scale = max(np.abs(fx).max(), np.abs(fy).max())
        assert np.abs(gx - fx)[interior].max() < 0.1 * scale
        assert np.abs(gy - fy)[interior].max() < 0.1 * scale


def test_grad_lambda_identity(mesh):
    """The (grad Lambda) . grad operator equals the diag-scaled form used in
    factorization (the reference validates this via an einsum identity,
    test_device.py:344-442)."""
    n = len(mesh.sites)
    rng = np.random.default_rng(0)
    Lambda = 1 + rng.random(n)
    gx = mesh.operators.gradient_x.to_dense()
    gy = mesh.operators.gradient_y.to_dense()
    grad = np.array([gx, gy])
    term_einsum = np.einsum("ijk, ijk -> jk", grad @ Lambda[:, None], grad)
    term_diag = (gx @ Lambda)[:, None] * gx + (gy @ Lambda)[:, None] * gy
    assert np.allclose(term_einsum, term_diag)


def test_laplacian_quadratic(mesh):
    x, y = mesh.sites.T
    f = x**2 + y**2
    lap = np.asarray(mesh.operators.laplacian.matvec(f))
    interior = np.setdiff1d(np.arange(len(mesh.sites)), mesh.boundary_indices)
    # Cotangent Laplacian is exact for quadratics away from the boundary
    # on most vertices; check the median and a loose max.
    err = np.abs(lap[interior] - 4)
    assert np.median(err) < 1e-8
    assert np.percentile(err, 90) < 0.5


@pytest.mark.parametrize("method", ["uniform", "inv_euclidean", "half_cotangent"])
def test_weight_methods(mesh, method):
    W = fem.calculate_weights(mesh.sites, mesh.elements, method)
    assert W.shape == (len(mesh.sites),) * 2
    assert np.allclose(W, W.T)
    L = fem.laplace_operator(mesh.sites, mesh.elements, weight_method=method)
    # Constant fields are in the null space.
    assert np.allclose(L @ np.ones(len(mesh.sites)), 0, atol=1e-9)
    with pytest.raises(ValueError):
        fem.calculate_weights(mesh.sites, mesh.elements, "invalid")


def test_q_matrix_vs_direct(mesh):
    pts = mesh.sites[:400]
    w = mesh.vertex_areas[:400]
    Q = sc.distance.q_matrix(pts)
    d = np.linalg.norm(pts[:, None] - pts[None], axis=-1)
    mask = ~np.eye(len(pts), dtype=bool)
    expected = np.zeros_like(d)
    expected[mask] = 1 / (4 * np.pi * d[mask] ** 3)
    assert np.allclose(Q, expected, rtol=1e-12)


def test_cdist():
    rng = np.random.default_rng(1)
    a = rng.random((50, 2))
    b = rng.random((40, 2))
    d = sc.distance.cdist(a, b)
    expected = np.linalg.norm(a[:, None] - b[None], axis=-1)
    assert np.allclose(d, expected)
    d2 = sc.distance.cdist(a, b, metric="sqeuclidean")
    assert np.allclose(d2, expected**2)
    a3 = rng.random((50, 3))
    b3 = rng.random((40, 3))
    d3 = sc.distance.cdist(a3, b3)
    assert np.allclose(d3, np.linalg.norm(a3[:, None] - b3[None], axis=-1))
    with pytest.raises(ValueError):
        sc.distance.cdist(a, b, metric="bad")
    with pytest.raises(ValueError):
        sc.distance.cdist(a, b3)


def test_vertex_areas_sum(mesh):
    # Vertex areas sum to the total mesh area.
    total = mesh.triangle_areas.sum()
    assert np.isclose(mesh.vertex_areas.sum(), total)
    assert np.all(mesh.vertex_areas > 0)


def test_in_polygon():
    poly = sc.geometry.circle(1, points=64)
    assert fem.in_polygon(poly, (0, 0))
    assert not fem.in_polygon(poly, (2, 0))
    pts = np.array([[0, 0], [0.5, 0], [1.5, 0]])
    assert fem.in_polygon(poly, pts).tolist() == [True, True, False]


def test_adjacency_matrix(mesh):
    adj = fem.adjacency_matrix(mesh.elements)
    assert adj.shape == (len(mesh.sites),) * 2
    assert np.array_equal(adj, adj.T)
    assert set(np.unique(adj)) <= {0, 1}
