"""Tracing and timing utilities.

The reference has no profiling support beyond ``logging`` and tqdm
(SURVEY §5.1); on TPU, profile captures are the primary performance tool.
:func:`profile_trace` wraps ``jax.profiler.trace`` (view the result with
TensorBoard or Perfetto); :class:`Timer`/:func:`timed` give lightweight
wall-clock timing with proper ``block_until_ready`` semantics for device
work.
"""

import logging
import time
from contextlib import contextmanager
from functools import wraps
from typing import Dict, Optional

logger = logging.getLogger("profiling")

__all__ = ["profile_trace", "Timer", "timed"]


@contextmanager
def profile_trace(log_dir: str, create_perfetto_link: bool = False):
    """Captures a JAX profiler trace of the enclosed block.

    Args:
        log_dir: Directory for the trace (open with TensorBoard's profile
            plugin or ui.perfetto.dev).
        create_perfetto_link: Also emit a Perfetto URL.
    """
    import jax

    with jax.profiler.trace(log_dir, create_perfetto_link=create_perfetto_link):
        yield


class Timer:
    """Accumulating wall-clock timer for named stages.

    Example::

        timer = Timer()
        with timer("factorize"):
            model = factorize_model(device=device, current_units="uA")
        print(timer.summary())
    """

    def __init__(self):
        self.times: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextmanager
    def __call__(self, name: str, block_on: Optional[object] = None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                import jax

                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.times[name] = self.times.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> str:
        lines = []
        for name, total in sorted(self.times.items(), key=lambda kv: -kv[1]):
            count = self.counts[name]
            lines.append(f"{name}: {total:.4f}s ({count} calls)")
        return "\n".join(lines)


def timed(fn):
    """Decorator logging the wall-clock time of each call (device results
    are blocked on before stopping the clock)."""

    @wraps(fn)
    def wrapper(*args, **kwargs):
        import jax

        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        try:
            jax.block_until_ready(out)
        except Exception:
            pass
        logger.info(f"{fn.__name__}: {time.perf_counter() - t0:.4f}s")
        return out

    return wrapper
