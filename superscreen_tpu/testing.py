"""Run the package test suite from an installation
(reference: ``superscreen/testing.py``)."""

import os
import subprocess
import sys

__all__ = ["run"]


def run() -> int:
    """Runs the superscreen_tpu test suite via pytest (Agg backend)."""
    env = os.environ.copy()
    env["MPLBACKEND"] = "Agg"
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    test_dir = os.path.join(repo_root, "tests")
    return subprocess.call(
        [sys.executable, "-m", "pytest", test_dir, "-q"], env=env
    )
