"""Package version (kept importable with zero dependencies: ``about.py``
and ``setup.py`` both read it before JAX is imported)."""

__version_info__ = (0, 1, 0)
__version__ = ".".join(map(str, __version_info__))
