import numpy as np
import pytest

from superscreen_tpu import Constant, Parameter
from superscreen_tpu.parameter import CompositeParameter


def test_parameter_validation():
    with pytest.raises(ValueError):
        Parameter(lambda a, b: a + b)

    def f(x, y, scale=1):
        return scale * (x + y)

    p = Parameter(f, scale=2)
    assert np.allclose(p(np.array([1.0, 2]), np.array([3.0, 4])), [8, 12])

    def g(x, y, z, scale=1):
        return scale * (x + y + z)

    p3 = Parameter(g)
    assert np.isclose(p3(1, 2, 3), 6)

    # z must be the third argument
    with pytest.raises(ValueError):
        Parameter(lambda x, y, scale, z: x)

    # Non-keyword extra args rejected
    with pytest.raises(ValueError):
        Parameter(lambda x, y, w: x + w)


def test_parameter_algebra():
    def f(x, y):
        return x + y

    def g(x, y):
        return x * y

    pf = Parameter(f)
    pg = Parameter(g)
    x = np.array([1.0, 2.0])
    y = np.array([3.0, 4.0])
    assert np.allclose((pf + pg)(x, y), (x + y) + x * y)
    assert np.allclose((pf - pg)(x, y), (x + y) - x * y)
    assert np.allclose((pf * 2)(x, y), 2 * (x + y))
    assert np.allclose((2 * pf)(x, y), 2 * (x + y))
    assert np.allclose((pf / pg)(x, y), (x + y) / (x * y))
    assert np.allclose((pf**2)(x, y), (x + y) ** 2)
    assert isinstance(pf + pg, CompositeParameter)
    with pytest.raises(TypeError):
        CompositeParameter(1, 2, "+")
    with pytest.raises(ValueError):
        CompositeParameter(pf, pg, "%")


def test_parameter_equality():
    def f(x, y, a=1):
        return a * x * y

    p1 = Parameter(f, a=2)
    p2 = Parameter(f, a=2)
    p3 = Parameter(f, a=3)
    assert p1 == p2
    assert p1 != p3
    c = p1 + p2
    d = p1 + p2
    assert c == d


def test_constant():
    c = Constant(3.5)
    assert np.allclose(c(np.zeros(5), np.ones(5)), 3.5)
    c3 = Constant(2.0, dimensions=3)
    assert np.allclose(c3(np.zeros(4), np.ones(4), np.ones(4)), 2.0)
    with pytest.raises(ValueError):
        Constant(1.0, dimensions=4)


def test_parameter_repr():
    def f(x, y, a=1):
        return a * x

    p = Parameter(f, a=2)
    assert "Parameter" in repr(p)
    comp = p + 1
    assert "+" in repr(comp)


def test_function_repr():
    import inspect

    from superscreen_tpu.parameter import function_repr

    def f(x, y, z=0.0, *args, scale=2, **kw):
        return x + y

    expected = "f(x, y, z=0.0, *args, scale=2, **kw)"
    assert function_repr(f) == expected
    assert function_repr(f, argspec=inspect.getfullargspec(f)) == expected

    def g(x, y):
        return x * y

    assert function_repr(g) == "g(x, y)"


def test_hypres_make_polygons():
    pytest.importorskip("numpy")
    from superscreen_tpu.squids import hypres

    films, holes = hypres.make_polygons()
    assert sorted(films) == ["fc", "fc_shield", "pl", "pl_shield"]
    assert sorted(holes) == ["fc_center", "pl_center"]
    assert all(p.points.shape[1] == 2 for p in films.values())


def test_parameter_pickle():
    import dill

    def f(x, y, a=1):
        return a * (x + y)

    p = Parameter(f, a=2) * 3 + 1
    q = dill.loads(dill.dumps(p))
    x = np.array([1.0, 2.0])
    assert np.allclose(q(x, x), p(x, x))
