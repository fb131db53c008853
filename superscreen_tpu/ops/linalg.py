"""Dense linear algebra with backend dispatch.

On TPU, LU factorization and solves run on device via ``jax.scipy.linalg``
(XLA). On the CPU backend (tests, machines without accelerators), they fall
back to scipy/LAPACK, which is much faster than XLA's CPU lowering of LU.

All solves use fixed-count iterative refinement so float32 TPU solves reach
near machine-precision backward error (the residual matmul runs in the same
dtype; 2 rounds typically gains ~2 digits).
"""

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["lu_factor", "lu_solve", "lu_solve_refined"]


def _on_cpu() -> bool:
    return jax.default_backend() == "cpu"


@jax.jit
def _jax_lu_factor(neg_A):
    return jax.scipy.linalg.lu_factor(neg_A)


@partial(jax.jit, static_argnames=("refine_steps",))
def _jax_lu_solve_refined(A, lu, piv, h, refine_steps: int = 2):
    x = jax.scipy.linalg.lu_solve((lu, piv), h)
    for _ in range(refine_steps):
        r = h + A @ x  # residual of (-A) x = h
        x = x + jax.scipy.linalg.lu_solve((lu, piv), r)
    return x


@jax.jit
def _jax_lu_solve(lu, piv, h):
    return jax.scipy.linalg.lu_solve((lu, piv), h)


def lu_factor(neg_A) -> Tuple:
    """LU-factorizes ``-A`` (the matrix passed in is already negated).

    Returns ``(lu, piv)`` as device arrays on TPU or numpy arrays on CPU.
    """
    if _on_cpu():
        import scipy.linalg as sla

        lu, piv = sla.lu_factor(np.asarray(neg_A))
        return lu, piv
    out = _jax_lu_factor(jnp.asarray(neg_A))
    return tuple(out)

def lu_solve(lu_piv: Tuple, h):
    """Solves ``(-A) x = h`` given ``lu_piv = lu_factor(-A)``.
    ``h`` may be a vector or a matrix of stacked right-hand sides."""
    lu, piv = lu_piv
    if isinstance(lu, np.ndarray):
        import scipy.linalg as sla

        return sla.lu_solve((lu, piv), np.asarray(h))
    return np.asarray(_jax_lu_solve(lu, piv, jnp.asarray(h)))


def lu_solve_refined(A, lu_piv: Tuple, h, refine_steps: int = 2):
    """Solves ``(-A) x = h`` with ``refine_steps`` rounds of iterative
    refinement (``x += lu_solve(h + A @ x)``)."""
    lu, piv = lu_piv
    if isinstance(lu, np.ndarray):
        import scipy.linalg as sla

        A = np.asarray(A)
        h = np.asarray(h)
        x = sla.lu_solve((lu, piv), h)
        for _ in range(refine_steps):
            r = h + A @ x
            x = x + sla.lu_solve((lu, piv), r)
        return x
    return np.asarray(
        _jax_lu_solve_refined(
            jnp.asarray(A), lu, piv, jnp.asarray(h), refine_steps=refine_steps
        )
    )
