import numpy as np
import pytest

import superscreen_tpu as sc
from superscreen_tpu import squids


def test_presets():
    assert set(squids.SQUID_PRESETS) >= {"small", "medium", "large", "xlarge"}
    for name in squids.SQUID_PRESETS:
        dev = squids.make_squid(name, with_terminals=False)
        assert isinstance(dev, sc.Device)
        assert set(dev.films) == {"fc", "pl", "pl_shield"}
        assert set(dev.holes) == {"pl_center", "fc_center"}
    with pytest.raises(ValueError):
        squids.make_squid("unknown")


def test_loop_with_leads():
    pts = squids.loop_with_leads(2.0, 0.5, 3.0)
    from superscreen_tpu import polygon_ops as pops

    assert pops.is_simple_polygon(pts)
    # Bottom of the contour is below the arc by the lead length.
    assert pts[:, 1].min() < -(2.0 + 2.0)


def test_geometry_scaling():
    g = squids.SusceptometerGeometry()
    g2 = g.scaled(2.0)
    assert g2.ri_pl == 2 * g.ri_pl
    assert g2.d_be == g.d_be


@pytest.fixture(scope="module")
def meshed_squid_pair():
    closed = squids.make_squid("large", with_terminals=False)
    closed.solve_dtype = "float64"
    closed.make_mesh(max_edge_length=0.8, smooth=10)
    opened = squids.make_squid("large", with_terminals=True)
    opened.solve_dtype = "float64"
    opened.make_mesh(max_edge_length=0.8, smooth=10)
    return closed, opened


def test_squid_mutual_inductance_consistency(meshed_squid_pair):
    """The fc-pl mutual from a circulating current around the closed coil
    matches the transport-current value within coarse-mesh tolerance."""
    closed, opened = meshed_squid_pair
    M_closed = squids.squid_mutual_inductance(closed, iterations=2)
    M_open = squids.squid_mutual_inductance(opened, iterations=2)
    assert abs(M_closed.magnitude) > 0
    assert np.isclose(
        abs(M_closed.magnitude), abs(M_open.magnitude), rtol=0.15
    )
