import jax.numpy as jnp
import numpy as np
import pytest

from superscreen_tpu.ops import linalg


@pytest.fixture(scope="module")
def spd_system():
    """A Brandt-like system: A = P diag(w) with P SPD."""
    rng = np.random.default_rng(0)
    n = 300
    Q = rng.standard_normal((n, n))
    P = Q @ Q.T / n + 5 * np.eye(n)
    w = rng.random(n) + 0.5
    A = P * w[None, :]
    h = rng.standard_normal(n)
    return A, w, h


def test_schulz_inverse_matches_direct(spd_system):
    A, w, h = spd_system
    M = np.asarray(linalg._jax_spd_inverse(jnp.asarray(-A), jnp.asarray(w)))
    x = M @ h
    x_ref = np.linalg.solve(-A, h)
    assert np.abs(x - x_ref).max() < 1e-6 * np.abs(x_ref).max()


def test_inv_factorization_solve_paths(spd_system):
    A, w, h = spd_system
    M = linalg._jax_spd_inverse(jnp.asarray(-A), jnp.asarray(w))
    fac = ("inv", M, jnp.asarray(w))
    x_ref = np.linalg.solve(-A, h)
    x1 = linalg.lu_solve(fac, h)
    assert np.allclose(x1, x_ref, rtol=1e-6, atol=1e-10)
    x2 = linalg.lu_solve_refined(A, fac, h)
    assert np.allclose(x2, x_ref, rtol=1e-9, atol=1e-12)
    # Stacked right-hand sides.
    H = np.stack([h, 2 * h], axis=1)
    X = linalg.lu_solve(fac, H)
    assert np.allclose(X[:, 1], 2 * np.asarray(x1), rtol=1e-6)


def test_chol_factorization(spd_system):
    A, w, h = spd_system
    L = linalg._jax_chol_factor(jnp.asarray(-A), jnp.asarray(w))
    assert np.all(np.isfinite(np.asarray(L)))
    fac = ("chol", L, jnp.asarray(w))
    x_ref = np.linalg.solve(-A, h)
    x = linalg.lu_solve_refined(A, fac, h)
    assert np.allclose(x, x_ref, rtol=1e-9, atol=1e-12)


def test_padded_factorization_roundtrip(spd_system):
    """Identity-padded systems solve identically on the valid block."""
    A, w, h = spd_system
    n = A.shape[0]
    nip = n + 64
    A_pad = np.eye(nip, dtype=A.dtype)
    A_pad[:n, :n] = A
    w_pad = np.concatenate([w, np.ones(nip - n)])
    M = linalg._jax_spd_inverse(jnp.asarray(-A_pad), jnp.asarray(w_pad))
    fac = ("inv", M, jnp.asarray(w_pad))
    x_ref = np.linalg.solve(-A, h)
    x = linalg.lu_solve_refined(A_pad, fac, h)
    assert x.shape == (n,)
    assert np.allclose(x, x_ref, rtol=1e-8, atol=1e-12)
    x2 = linalg.lu_solve(fac, h)
    assert np.allclose(x2, x_ref, rtol=1e-5, atol=1e-9)


def test_chol_explicit_inverse_matches_direct():
    """The blocked Cholesky explicit inverse (the default TPU large-film
    factorization) inverts kernel-like SPD systems to machine precision,
    including non-block-multiple sizes."""
    import jax.numpy as jnp

    from superscreen_tpu.ops import linalg

    rng = np.random.default_rng(11)
    for n in (257, 1024, 1300):
        G = rng.standard_normal((n, 48))
        P = G @ G.T + n * np.eye(n)  # guaranteed SPD
        P = 0.5 * (P + P.T)
        w = rng.uniform(0.5, 1.5, size=n)
        A = P * w[None, :]  # system matrix: solves are against -A... A/w SPD
        M = np.asarray(
            linalg._jax_chol_explicit_inverse_from_A(
                jnp.asarray(A), jnp.asarray(w), block=256
            )
        )
        h = rng.standard_normal(n)
        x = M @ h
        assert np.abs(-(A @ x) - h).max() < 1e-10 * np.abs(h).max()
        M_schulz = np.asarray(
            linalg._jax_spd_inverse(jnp.asarray(-A), jnp.asarray(w))
        )
        assert np.allclose(M, M_schulz, rtol=1e-8, atol=1e-12)


def test_lu_factor_batched_matches_sequential():
    import jax.numpy as jnp

    from superscreen_tpu.ops import linalg

    rng = np.random.default_rng(12)
    n, F = 192, 3
    As, ws = [], []
    for _ in range(F):
        G = rng.standard_normal((n, 48))
        P = G @ G.T + n * np.eye(n)  # guaranteed SPD
        w = rng.uniform(0.5, 1.5, size=n)
        As.append(0.5 * (P + P.T) * w[None, :])
        ws.append(w)
    facs = linalg.lu_factor_batched(np.stack(As), np.stack(ws))
    assert len(facs) == F
    for A, w, fac in zip(As, ws, facs):
        h = rng.standard_normal(n)
        x = linalg.lu_solve(fac, h)
        assert np.abs(-(A @ x) - h).max() < 1e-9 * np.abs(h).max()


def test_refine_safeguarded_never_worse_than_unrefined():
    """A solution operator with one badly wrong mode makes plain
    refinement diverge (the bad mode is re-amplified every step); the
    safeguarded refinement must return the minimum-residual iterate."""
    import jax.numpy as jnp

    from superscreen_tpu.ops import linalg

    rng = np.random.default_rng(5)
    n = 96
    G = rng.standard_normal((n, 32))
    P = G @ G.T + n * np.eye(n)
    A = 0.5 * (P + P.T)  # SPD system, solve (-A) x = h
    M_good = -np.linalg.inv(A)
    # Corrupt one eigen-direction: E = I + A M has an eigenvalue ~ -3.
    v = rng.standard_normal(n)
    v /= np.linalg.norm(v)
    M_bad = M_good + 3.0 * np.outer(v, v) @ M_good
    h = rng.standard_normal((n, 4))
    x_ref = np.linalg.solve(-A, h)

    x0 = M_bad @ h
    err0 = np.linalg.norm(x0 - x_ref, axis=0)

    # Plain refinement diverges on this operator.
    x_plain = x0.copy()
    for _ in range(3):
        x_plain = x_plain + M_bad @ (h + A @ x_plain)
    assert (np.linalg.norm(x_plain - x_ref, axis=0) > 5 * err0).all()

    x_safe = np.asarray(
        linalg._refine_safeguarded(
            lambda r: jnp.asarray(M_bad) @ r,
            jnp.asarray(A),
            jnp.asarray(h),
            jnp.asarray(x0),
            3,
        )
    )
    r_safe = np.linalg.norm(h + A @ x_safe, axis=0)
    r0 = np.linalg.norm(h + A @ x0, axis=0)
    assert (r_safe <= r0 * (1 + 1e-12)).all()


def test_factor_precision_knob():
    from superscreen_tpu.ops import linalg

    assert linalg.FACTOR_PRECISION in (
        "bfloat16", "bfloat16_3x", "tensorfloat32", "float32", "highest"
    )


def test_prewarm_factorization_executable(monkeypatch):
    """The background-compiled AOT factorization must be picked up by
    factor_system and agree with the jit path."""
    import numpy as np

    from superscreen_tpu.ops import linalg

    monkeypatch.setattr(linalg, "LU_MAX_N_TPU", 16)
    monkeypatch.setattr(linalg, "_on_cpu", lambda: False)
    rng = np.random.default_rng(0)
    n = 96
    X = rng.standard_normal((n, n))
    P = X @ X.T + n * np.eye(n)
    w = rng.uniform(0.5, 1.5, size=n)
    # Brandt convention: A / w is SPD and solves run against -A.
    A = P * w[None, :]
    method = linalg._large_factor_method()
    linalg.prewarm_factorization(n, A.dtype)
    exe = linalg._prewarmed_executable(n, A.dtype, method)
    assert exe is not None
    kind, M, w_out = linalg.factor_system(A, w)
    assert kind == "inv"
    ref_fn = (
        linalg._jax_chol_explicit_inverse_from_A
        if method == "inv"
        else linalg._jax_schur_explicit_inverse_from_A
    )
    M_jit = np.asarray(ref_fn(A, w))
    assert np.allclose(np.asarray(M), M_jit, rtol=1e-10, atol=1e-12)
    x = np.asarray(M) @ np.ones(n)
    assert np.allclose(-A @ x, np.ones(n), rtol=1e-8, atol=1e-10)


def test_phase_bounds_partition():
    """Phase boundaries tile [0, nb) exactly, never exceed the requested
    phase count, and collapse cleanly when nb < n_phases."""
    for nb in (1, 2, 3, 4, 5, 9, 16, 37):
        for phases in (1, 2, 4, 8):
            bounds = linalg._phase_bounds(nb, phases)
            assert bounds[0] == 0 and bounds[-1] == nb
            assert all(b1 >= b0 for b0, b1 in zip(bounds, bounds[1:]))
            assert len(bounds) - 1 == max(1, min(phases, nb))


def test_phase_split_loops_match_dense():
    """The phase-split Cholesky / triangular-inverse loops reproduce the
    dense factors bit-for-bit in intent (f64 CPU, machine precision) for
    every phase count, including nb == 1 and nb not divisible by phases."""
    rng = np.random.default_rng(7)
    b = 128
    for nb, phases in [(1, 4), (2, 4), (3, 2), (5, 4), (9, 4), (4, 1)]:
        n = nb * b
        G = rng.standard_normal((n, 32))
        P = G @ G.T + n * np.eye(n)
        P = 0.5 * (P + P.T)
        L_ref = np.linalg.cholesky(P)
        L = np.asarray(linalg._blocked_cholesky_loop(jnp.asarray(P), b, phases))
        assert np.allclose(L, L_ref, rtol=1e-12, atol=1e-10 * n)
        X = np.asarray(linalg._tril_inverse_loop(jnp.asarray(L_ref), b, phases))
        assert np.allclose(X @ L_ref, np.eye(n), atol=1e-9)
        # Upper triangles are untouched up to the epsilon-level residue of
        # the diagonal-block panel solve (S_d @ Ld^{-T} = Ld only exactly).
        assert np.abs(np.triu(L, 1)).max() < 1e-12 * np.abs(L).max()
        assert np.abs(np.triu(X, 1)).max() < 1e-12 * np.abs(X).max()


def test_schur_explicit_inverse_matches_chol_and_lu():
    """The matmul-only Schur inverse (the single-device default) must
    agree with the Cholesky explicit-inverse pipeline and solve the
    Brandt-convention system to refinement-free accuracy."""
    import numpy as np

    from superscreen_tpu.ops import linalg

    rng = np.random.default_rng(3)
    for n in (96, 320):  # non-multiple and multiple of the 64 leaf below
        X = rng.standard_normal((n, n))
        P = X @ X.T + n * np.eye(n)
        w = rng.uniform(0.5, 1.5, size=n)
        A = P * w[None, :]
        M_schur = np.asarray(
            linalg._jax_schur_explicit_inverse_from_A(A, w, leaf=64)
        )
        M_chol = np.asarray(linalg._jax_chol_explicit_inverse_from_A(A, w))
        assert np.allclose(M_schur, M_chol, rtol=1e-8, atol=1e-10)
        h = rng.standard_normal(n)
        x = M_schur @ h
        assert np.allclose(-A @ x, h, rtol=1e-8, atol=1e-9)
        # The neg_A entry point agrees with the fused-negation variant.
        M_neg = np.asarray(linalg._jax_schur_explicit_inverse(-A, w, leaf=64))
        assert np.allclose(M_neg, M_schur, rtol=1e-12, atol=1e-14)
