"""superscreen_tpu: a TPU-native (JAX/XLA/Pallas) framework for simulating
the magnetic response of 2D superconducting devices.

Implements Brandt's stream-function method for the coupled London + Maxwell
equations on triangular meshes, with the full capability set of the
reference `loganbvh/superscreen` package re-architected for TPU:
dense kernels assembled on device, linear systems factorized/solved with
XLA LU, self-consistent multi-film coupling and parameter sweeps as
batched device computations.
"""

import os as _os


def _honor_platform_request() -> None:
    """Makes an explicit ``JAX_PLATFORMS`` environment request stick.

    Some out-of-tree PJRT plugins (e.g. tunneled TPU backends) rewrite
    ``jax_platforms`` at import to put themselves first (``"cpu"`` ->
    ``"axon,cpu"``), so a user who exported ``JAX_PLATFORMS=cpu`` can
    still end up initializing -- and blocking on -- the plugin.  Restore
    the env request ONLY when the current config is exactly the request
    with extra platform names prepended (the plugin-rewrite signature);
    anything else -- env unset, config already honored, or a value set
    programmatically after import (e.g. a test harness forcing CPU) --
    is left alone.
    """
    request = _os.environ.get("JAX_PLATFORMS", "")
    if not request:
        return
    try:
        import jax

        current = jax.config.jax_platforms or ""
        req_list = [p for p in request.split(",") if p]
        cur_list = [p for p in current.split(",") if p]
        if len(cur_list) > len(req_list) and cur_list[-len(req_list):] == req_list:
            jax.config.update("jax_platforms", request)
    except Exception:  # pragma: no cover - best-effort
        pass


def _enable_compile_cache() -> None:
    """Enables JAX's persistent compilation cache by default.

    Factorizing a model compiles O(10) XLA programs per distinct film shape;
    on TPU those compiles dominate wall-clock (~1 s each).  The persistent
    cache makes repeat factorizations (sweep scripts, notebook re-runs,
    benchmark reruns) skip compilation entirely.  Opt out or redirect with
    ``SUPERSCREEN_TPU_COMPILE_CACHE=0`` / ``=/path/to/cache``.
    """
    setting = _os.environ.get("SUPERSCREEN_TPU_COMPILE_CACHE", "")
    if setting in ("0", "off", "none"):
        return
    path = setting or _os.path.join(
        _os.path.expanduser("~"), ".cache", "superscreen_tpu", "xla"
    )
    try:
        import jax

        if jax.config.jax_compilation_cache_dir is None:
            jax.config.update("jax_compilation_cache_dir", path)
            # Cache down to 50 ms compiles: a multi-film factorization is
            # ~130 distinct sub-second programs (assembly gathers, hole
            # vectors, per-shape solves) whose compiles dominate the cold
            # wall -- measured on the huber susceptometer, a fresh-process
            # factorize falls 160 s -> 15 s when they are cache-served.
            # The 1 s threshold this replaces silently excluded nearly all
            # of them (each ~0.1-1 s) while the few big programs it did
            # cache were a minority of the wall.  A user-set value is
            # never overridden (we only get here when no cache dir was
            # configured at all).
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.05
            )
    except Exception:  # pragma: no cover - cache is best-effort
        pass


def _pin_matmul_precision() -> None:
    """Pins JAX's default matmul precision to true float32.

    On TPU, ``precision=DEFAULT`` lowers f32 matmuls to a SINGLE bf16 MXU
    pass (~3e-3 relative error).  The numerical core uses explicitly
    disciplined dots (:data:`ops.kernels.MATMUL_PRECISION`), but pinning
    the global default protects every remaining contraction (interp,
    post-processing, user code running against solver outputs) from a
    silent 8-bit-mantissa downgrade.  A user-set value is honored; opt out
    with ``SUPERSCREEN_TPU_PIN_PRECISION=0``.
    """
    if _os.environ.get("SUPERSCREEN_TPU_PIN_PRECISION", "") in ("0", "off"):
        return
    try:
        import jax

        if jax.config.jax_default_matmul_precision is None:
            jax.config.update("jax_default_matmul_precision", "float32")
    except Exception:  # pragma: no cover - best-effort
        pass


_honor_platform_request()
_enable_compile_cache()
_pin_matmul_precision()

from . import distance, fem, geometry, imaging, sources  # noqa: E402
from .about import version_dict, version_table
from .adjoint import AdjointModel, build_adjoint_model
from .device import Device, EdgeMesh, Layer, Mesh, MeshOperators, Polygon
from .device.mesh_generation import generate_mesh, smooth_mesh
from .fluxoid import find_fluxoid_solution, make_fluxoid_polygons
from .vortices import VortexLandscape, vortex_energy_landscape
from .parameter import CompositeParameter, Constant, Parameter
from .solution import FilmSolution, Fluxoid, Solution, Vortex
from .solver import FactorizedModel, convert_field, factorize_model, solve
from .sweep import SweepResult, solve_many
from .units import ureg
from .version import __version__, __version_info__
from .visualization import (
    auto_grid,
    cross_section,
    grids_to_vecs,
    non_gui_backend,
    plot_currents,
    plot_field_at_positions,
    plot_fields,
    plot_mutual_inductance,
    plot_polygon_flux,
    plot_streams,
)
