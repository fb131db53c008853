"""Uniform applied field source (reference: ``superscreen/sources/constant.py``)."""

from typing import Union

import numpy as np

from ..parameter import Parameter

__all__ = ["ConstantField"]


def constant(
    x: Union[int, float, np.ndarray],
    y: Union[int, float, np.ndarray],
    z: Union[int, float, np.ndarray],
    value: Union[int, float] = 0,
) -> Union[int, float, np.ndarray]:
    """Constant field at all positions."""
    return value * np.ones_like(np.asarray(x, dtype=float))


def ConstantField(value: float = 0) -> Parameter:
    """A Parameter returning ``value`` at all ``(x, y, z)``.

    Args:
        value: The constant value of the field.
    """
    return Parameter(constant, value=float(value))
