"""Version and environment provenance.

Reference: ``superscreen/about.py``.  Instead of BLAS vendor detection, the
relevant accelerator provenance on TPU is the JAX backend and device kind.
"""

import platform
import sys
from typing import Dict, Optional

__all__ = ["version_dict", "version_table"]


def version_dict() -> Dict[str, str]:
    """A dictionary of dependency versions and hardware provenance,
    embedded into every :class:`superscreen_tpu.Solution`."""
    from .version import __version__

    versions = {
        "superscreen_tpu": __version__,
        "python": sys.version,
        "OS": f"{platform.system()} {platform.release()}",
        "machine": platform.machine(),
    }
    for mod_name in ("jax", "jaxlib", "numpy", "scipy", "matplotlib", "h5py"):
        try:
            mod = __import__(mod_name)
            versions[mod_name] = getattr(mod, "__version__", "unknown")
        except ImportError:
            versions[mod_name] = "not installed"
    try:
        import jax

        devices = jax.devices()
        versions["jax_backend"] = devices[0].platform if devices else "none"
        versions["jax_devices"] = ", ".join(str(d) for d in devices)
        versions["jax_device_count"] = str(len(devices))
    except Exception as err:  # pragma: no cover
        versions["jax_backend"] = f"error: {err}"
    return versions


def version_table(
    version_info: Optional[Dict[str, str]] = None, verbose: bool = False
):
    """An HTML table of dependency versions (for notebooks)."""
    html = [
        "<table>",
        "<tr><th>Software</th><th>Version</th></tr>",
    ]
    if version_info is None:
        version_info = version_dict()
    for name, version in version_info.items():
        if not verbose and name in ("OS", "machine"):
            continue
        html.append(f"<tr><td>{name}</td><td>{version}</td></tr>")
    html.append("</table>")
    html = "".join(html)
    try:
        from IPython.display import HTML

        return HTML(html)
    except ImportError:  # pragma: no cover
        return html
