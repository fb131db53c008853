"""Transfer-channel warmup for tunneled / remote TPU backends.

On a directly-attached TPU the first device-to-host transfer costs
microseconds of setup.  On a *tunneled* backend (the TPU reached over a
network proxy, as in remote-attach setups) the FIRST device-to-host
readback of the process additionally establishes the data channel, which
on a contended, time-shared tunnel has been measured here at anywhere
from ~25 s to ~370 s of wall time -- for an 8-float array.  Every later
readback then runs at channel bandwidth (~35 MB/s measured) plus ~30 ms
latency.

That establishment cost is a property of the *process*, not of any
particular program: it is paid exactly once, by whichever readback
happens first.  Left alone, it lands in the middle of the user's first
solve or factorization and gets mis-attributed to compilation or compute
(this is precisely what round-2 benchmarks recorded as an ~80 s "cold
assembly compile wall" -- the XLA compiles measured separately total
~16 s and are served from the persistent compilation cache on every
process after the first).

:func:`warm_transfer_channel` pays the cost EARLY and CONCURRENTLY: a
daemon thread issues a tiny readback the moment the solver knows a
device backend will be used, so channel establishment overlaps meshing,
operator assembly, and factorization dispatch (all of which are
host-side or async device work with no readback of their own).  The
channel serializes transfers, so any genuine readback issued before the
warmup finishes simply queues behind it -- the thread never adds time,
it only moves the wait off the critical path.

Disable with ``SUPERSCREEN_TPU_TUNNEL_WARMUP=0``.  No-op on the CPU
backend (no channel to warm).
"""

import logging
import os
import threading
import time
from typing import Optional

logger = logging.getLogger("tunnel")

_lock = threading.Lock()
_thread: Optional[threading.Thread] = None
_result = {}


def _do_warmup():
    try:
        import jax
        import jax.numpy as jnp
        import numpy as np

        t0 = time.perf_counter()
        np.asarray(jnp.zeros((8,), jnp.float32))
        _result["first_readback_s"] = time.perf_counter() - t0
        logger.debug(
            "transfer channel warm in %.2fs", _result["first_readback_s"]
        )
    except Exception as exc:  # pragma: no cover - backend init failure
        _result["error"] = repr(exc)
        logger.info(f"transfer-channel warmup failed: {exc!r}")


def warm_transfer_channel(
    block: bool = False, timeout: Optional[float] = None
) -> Optional[float]:
    """Starts (once per process) a daemon thread whose tiny device->host
    readback establishes the transfer channel of a tunneled TPU backend.

    Idempotent and cheap to call from any entry point that is about to do
    device work (``factorize_model`` calls it first thing).  With
    ``block=True``, waits for the warmup (up to ``timeout`` seconds, or
    forever if None) and returns the measured first-readback seconds
    (None if disabled, on CPU, failed, or still in flight at timeout) --
    used by benchmarks to report channel establishment separately from
    compile/compute.
    """
    global _thread
    if os.environ.get("SUPERSCREEN_TPU_TUNNEL_WARMUP", "1") == "0":
        return None
    try:
        import jax

        if jax.default_backend() == "cpu":
            return None
    except Exception:  # pragma: no cover - no backend at all
        return None
    with _lock:
        if _thread is None:
            _thread = threading.Thread(target=_do_warmup, daemon=True)
            _thread.start()
    if block:
        _thread.join(timeout)
        return _result.get("first_readback_s")
    return _result.get("first_readback_s")
