import numpy as np

from superscreen_tpu.utils import tunnel


def test_warm_transfer_channel_cpu_noop():
    """On the CPU backend there is no channel to warm: returns None and
    starts no thread."""
    assert tunnel.warm_transfer_channel() is None
    assert tunnel.warm_transfer_channel(block=True) is None
    assert tunnel._thread is None


def test_warm_transfer_channel_disabled(monkeypatch):
    monkeypatch.setenv("SUPERSCREEN_TPU_TUNNEL_WARMUP", "0")
    assert tunnel.warm_transfer_channel(block=True) is None


def test_warmup_thread_runs_and_is_idempotent(monkeypatch):
    """Force the non-CPU branch (the readback itself is backend-agnostic):
    the thread runs once, records a duration, and repeat calls reuse it."""
    import jax

    monkeypatch.setattr(tunnel, "_thread", None)
    monkeypatch.setattr(tunnel, "_result", {})
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    first = tunnel.warm_transfer_channel(block=True)
    assert first is not None and first >= 0
    t = tunnel._thread
    assert tunnel.warm_transfer_channel(block=True) == first
    assert tunnel._thread is t


