"""Position-dependent parameters.

API parity with the reference ``superscreen/parameter.py``: a ``Parameter``
wraps a function ``f(x, y[, z], **kwargs)``; arithmetic between Parameters
and numbers builds ``CompositeParameter`` expression trees.  Evaluation is
NumPy/JAX-agnostic -- the wrapped function may consume and return either
``numpy`` or ``jax.numpy`` arrays, so Parameters can be evaluated inside
jitted computations (e.g. vmapped applied-field sweeps).
"""

import inspect
import numbers
import operator
from typing import Callable, Optional, Union

import numpy as np

__all__ = ["Parameter", "CompositeParameter", "Constant"]


class _FakeArgSpec:
    def __init__(
        self,
        args=None,
        varargs=None,
        varkw=None,
        defaults=None,
        kwonlyargs=None,
        kwonlydefaults=None,
        annotations=None,
    ):
        self.args = args
        self.varargs = varargs
        self.varkw = varkw
        self.defaults = defaults
        self.kwonlyargs = kwonlyargs
        self.kwonlydefaults = kwonlydefaults
        self.annotations = annotations


def function_repr(func, argspec=None) -> str:
    """Human-readable string representation for a function signature."""
    if argspec is None:
        argspec = inspect.getfullargspec(func)
    args = [str(arg) for arg in (argspec.args or [])]
    if argspec.defaults:
        for i, val in enumerate(argspec.defaults[::-1]):
            args[-(i + 1)] = args[-(i + 1)] + f"={val!r}"
    if argspec.varargs:
        args.append("*" + argspec.varargs)
    if argspec.kwonlyargs:
        if not argspec.varargs:
            args.append("*")
        args.extend(argspec.kwonlyargs)
    if argspec.kwonlydefaults:
        for i, name in enumerate(args):
            if name in argspec.kwonlydefaults:
                args[i] = args[i] + f"={argspec.kwonlydefaults[name]!r}"
    if argspec.varkw:
        args.append("**" + argspec.varkw)
    return func.__name__ + "(" + ", ".join(args) + ")"


class Parameter:
    """A callable computing a scalar or vector quantity as a function of
    position coordinates ``x, y`` (and optionally ``z``).

    Supports ``+ - * / **`` with other Parameters and real numbers, producing
    :class:`CompositeParameter` expression trees.

    Args:
        func: The function evaluating the parameter.  Its first positional
            arguments must be ``x, y`` (and optionally ``z`` third); all other
            arguments must be keyword arguments.
        kwargs: Keyword arguments bound to ``func``.
    """

    __slots__ = ("func", "kwargs")

    def __init__(self, func: Callable, **kwargs):
        argspec = inspect.getfullargspec(func)
        args = argspec.args
        num_args = 2
        if args[:num_args] != ["x", "y"]:
            raise ValueError(
                "The first function arguments must be x and y, "
                f"not {', '.join(args[:num_args])!r}."
            )
        if "z" in args:
            if args.index("z") != num_args:
                raise ValueError(
                    "If the function takes an argument z, "
                    "it must be the third argument (x, y, z)."
                )
            num_args = 3
        defaults = argspec.defaults or []
        if len(defaults) != len(args) - num_args:
            raise ValueError(
                "All arguments other than x, y, z must be keyword arguments."
            )
        defaults_dict = dict(zip(args[num_args:], defaults))
        kwonlyargs = set(kwargs) - set(argspec.args[num_args:])
        if not kwonlyargs.issubset(set(argspec.kwonlyargs or [])):
            raise ValueError(
                f"Provided keyword-only arguments ({kwonlyargs!r}) "
                f"do not match the function signature: {function_repr(func)}."
            )
        defaults_dict.update(argspec.kwonlydefaults or {})
        self.func = func
        self.kwargs = defaults_dict
        self.kwargs.update(kwargs)

    def __call__(
        self,
        x: Union[int, float, np.ndarray],
        y: Union[int, float, np.ndarray],
        z: Optional[Union[int, float, np.ndarray]] = None,
    ):
        kwargs = self.kwargs.copy()
        x, y = np.atleast_1d(np.squeeze(x), np.squeeze(y))
        if z is not None:
            kwargs["z"] = np.atleast_1d(np.squeeze(z))
        result = np.asarray(self.func(x, y, **kwargs)).squeeze()
        if result.ndim == 0:
            result = result.item()
        return result

    def _get_argspec(self) -> _FakeArgSpec:
        if not self.kwargs:
            return _FakeArgSpec(args=[], defaults=[])
        kwargs, kwarg_values = list(zip(*self.kwargs.items()))
        return _FakeArgSpec(args=list(kwargs), defaults=kwarg_values)

    def __repr__(self) -> str:
        func_repr = function_repr(self.func, argspec=self._get_argspec())
        return f"{self.__class__.__name__}<{func_repr}>"

    def __add__(self, other):
        return CompositeParameter(self, other, operator.add)

    def __radd__(self, other):
        return CompositeParameter(other, self, operator.add)

    def __sub__(self, other):
        return CompositeParameter(self, other, operator.sub)

    def __rsub__(self, other):
        return CompositeParameter(other, self, operator.sub)

    def __mul__(self, other):
        return CompositeParameter(self, other, operator.mul)

    def __rmul__(self, other):
        return CompositeParameter(other, self, operator.mul)

    def __truediv__(self, other):
        return CompositeParameter(self, other, operator.truediv)

    def __rtruediv__(self, other):
        return CompositeParameter(other, self, operator.truediv)

    def __pow__(self, other):
        return CompositeParameter(self, other, operator.pow)

    def __rpow__(self, other):
        return CompositeParameter(other, self, operator.pow)

    def __eq__(self, other) -> bool:
        if other is self:
            return True
        if not isinstance(other, Parameter):
            return False
        if self.func.__code__ != other.func.__code__:
            return False

        def _eq(a, b):
            try:
                return bool(np.all(np.asarray(a) == np.asarray(b)))
            except Exception:
                return a == b

        return set(self.kwargs) == set(other.kwargs) and all(
            _eq(v, other.kwargs[k]) for k, v in self.kwargs.items()
        )


class CompositeParameter(Parameter):
    """The result of arithmetic between Parameters and/or real numbers.

    Args:
        left: Left operand (number, Parameter, or CompositeParameter).
        right: Right operand.
        op: The binary operator (or its string form, one of ``+ - * / **``).
    """

    VALID_OPERATORS = {
        operator.add: "+",
        operator.sub: "-",
        operator.mul: "*",
        operator.truediv: "/",
        operator.pow: "**",
    }

    __slots__ = ("left", "right", "operator")

    def __init__(self, left, right, op):
        valid_types = (int, float, Parameter, CompositeParameter)
        if not isinstance(left, valid_types):
            raise TypeError(
                f"Left must be a number, Parameter, or CompositeParameter, "
                f"not {type(left)!r}."
            )
        if not isinstance(right, valid_types):
            raise TypeError(
                f"Right must be a number, Parameter, or CompositeParameter, "
                f"not {type(right)!r}."
            )
        if isinstance(left, numbers.Real) and isinstance(right, numbers.Real):
            raise TypeError(
                "Either left or right must be a Parameter or CompositeParameter."
            )
        if isinstance(op, str):
            operators = {v: k for k, v in self.VALID_OPERATORS.items()}
            op = operators.get(op.strip(), None)
        if op not in self.VALID_OPERATORS:
            raise ValueError(
                f"Unknown operator, {op!r}. "
                f"Valid operators are {list(self.VALID_OPERATORS.values())!r}."
            )
        self.left = left
        self.right = right
        self.operator = op

    def __call__(self, x, y, z=None):
        left_val = (
            self.left if isinstance(self.left, numbers.Real) else self.left(x, y, z)
        )
        right_val = (
            self.right
            if isinstance(self.right, numbers.Real)
            else self.right(x, y, z)
        )
        return self.operator(left_val, right_val)

    def _bare_repr(self) -> str:
        op_str = self.VALID_OPERATORS[self.operator]

        def _repr(side):
            if isinstance(side, CompositeParameter):
                return side._bare_repr()
            if isinstance(side, Parameter):
                return function_repr(side.func, side._get_argspec())
            return str(side)

        return f"({_repr(self.left)} {op_str} {_repr(self.right)})"

    def __repr__(self) -> str:
        return f"{self.__class__.__name__}<{self._bare_repr()}>"

    def __eq__(self, other) -> bool:
        if other is self:
            return True
        if not isinstance(other, type(self)):
            return False
        return (
            self.left == other.left
            and self.right == other.right
            and self.operator is other.operator
        )


class Constant(Parameter):
    """A Parameter whose value does not depend on position."""

    def __init__(self, value, dimensions: int = 2):
        if dimensions not in (2, 3):
            raise ValueError(f"Dimensions must be 2 or 3, got {dimensions}.")
        if dimensions == 2:

            def constant(x, y, value=0):
                return value * np.ones_like(np.asarray(x, dtype=float))

        else:

            def constant(x, y, z, value=0):
                return value * np.ones_like(np.asarray(x, dtype=float))

        super().__init__(constant, value=value)
