"""Solver layer: model factorization, self-consistent solves, film systems.

The split mirrors the physics, not the reference's module layout:

- ``solve.py`` — orchestration: :func:`factorize_model` builds a reusable
  :class:`FactorizedModel` (all dense operators resident on device),
  :func:`solve` runs the self-consistent inter-film iteration as jitted
  device rounds.
- ``solve_film.py`` — per-film linear systems: fused one-compile assembly
  of the Brandt system, batched factorization, terminal-current streams.
- ``utils.py`` — :class:`FilmInfo`/:class:`LambdaInfo` construction and
  unit conversion helpers.
- ``refine.py`` — optional f64-residual iterative refinement
  (``high_precision=True``) layered over the f32 TPU factorizations.

API parity: reference ``superscreen/solver/__init__.py``.
"""

from .solve import FactorizedModel, factorize_model, solve
from .solve_film import (
    LinearSystem,
    TerminalSystems,
    factorize_linear_systems,
    solve_film,
    solve_for_terminal_current_stream,
)
from .utils import (
    FilmInfo,
    LambdaInfo,
    convert_field,
    current_to_float,
    currents_to_floats,
    field_conversion_factor,
    make_film_info,
    stream_from_current_density,
    stream_from_terminal_current,
)
