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


# ---------------------------------------------------------------------------
# Real device-library layouts (VERDICT r1 item 7).
# ---------------------------------------------------------------------------


def test_ibm_layouts_build():
    from superscreen_tpu.squids import ibm

    for size, ns in [
        ("small", ibm.small),
        ("medium", ibm.medium),
        ("large", ibm.large),
        ("xlarge", ibm.xlarge),
    ]:
        closed = ns.make_squid(with_terminals=False)
        assert set(closed.holes) == {"pl_center", "fc_center"}
        assert set(closed.films) == {
            "fc", "fc_shield", "pl", "pl_shield1", "pl_shield2"
        }
        assert [la.name for la in closed.layers.values()] == ["W2", "W1", "BE"]
        opened = ns.make_squid(with_terminals=True)
        assert set(opened.holes) == {"pl_center"}
        assert [t.name for t in opened.terminals["fc"]] == ["source", "drain"]
    with pytest.raises(ValueError):
        ibm.make_squid("gigantic")


def test_ibm_layer_stack_matches_reference():
    """Layer z-positions mirror the reference ibm/layers.py:36-47."""
    from superscreen_tpu.squids import ibm_squid_layers

    for align, expected in [
        ("middle", [0.10, 0.28, 0.51]),
        ("bottom", [0.0, 0.33, 0.58]),
        ("top", [0.20, 0.43, 0.74]),
    ]:
        zs = [round(la.z0, 6) for la in ibm_squid_layers(align=align)]
        assert zs == pytest.approx(expected), align


def test_huber_layout_builds():
    from superscreen_tpu.squids import huber

    closed = huber.make_squid(with_terminals=False)
    assert set(closed.holes) == {"pl_center", "fc_center"}
    opened = huber.make_squid(with_terminals=True)
    assert set(opened.holes) == {"pl_center"}
    assert "fc" in opened.terminals


def test_hypres_layouts_build():
    """Both hypres layouts build from the bundled digitized coordinates
    (reference hypres/small.py and hypres/xsmall.py)."""
    from superscreen_tpu.squids import hypres

    closed = hypres.make_squid(with_terminals=False)
    assert closed.name == "hypres_400nm"
    assert set(closed.films) == {"fc", "fc_shield", "pl", "pl_shield"}
    assert set(closed.holes) == {"pl_center", "fc_center"}
    opened = hypres.make_squid(with_terminals=True)
    assert set(opened.holes) == {"pl_center"}
    assert [t.name for t in opened.terminals["fc"]] == ["source", "drain"]

    closed = hypres.make_squid_xsmall(with_terminals=False)
    assert closed.name == "hypres_250nm"
    assert set(closed.films) == {
        "fc", "fc_shield", "pl", "pl_shield", "pl_shield2"
    }
    assert set(closed.holes) == {"pl_center", "fc_center"}
    # The closed coil's boundary still contains the inner winding; the
    # fc_center hole must sit strictly inside it.
    fc = closed.films["fc"]
    hole = closed.holes["fc_center"]
    assert fc.contains_points(hole.points.mean(axis=0)[None, :]).all()

    opened = hypres.make_squid_xsmall(with_terminals=True)
    assert set(opened.holes) == {"pl_center"}
    assert [t.name for t in opened.terminals["fc"]] == ["source", "drain"]


def test_hypres_missing_data_message():
    from superscreen_tpu.squids import hypres

    with pytest.raises(FileNotFoundError, match="no-such"):
        hypres.load_polygons("no-such-file.npz")


def test_ibm_small_mutual_workload():
    """The mutuals validation workload (reference squids/mutuals.py) on a
    coarsened ibm-small mesh: closed- and open-coil mutuals agree."""
    from superscreen_tpu.squids import SQUID_LAYOUTS, pickup_loop_mutual

    closed = SQUID_LAYOUTS["ibm-small"](with_terminals=False)
    closed.solve_dtype = "float64"
    closed.make_mesh(max_edge_length=0.35, smooth=20)
    M_closed = pickup_loop_mutual(closed, iterations=3)

    opened = SQUID_LAYOUTS["ibm-small"](with_terminals=True)
    opened.solve_dtype = "float64"
    opened.make_mesh(max_edge_length=0.35, smooth=20)
    M_open = pickup_loop_mutual(opened, iterations=3)

    assert M_closed.units == sc.ureg("Phi_0 / A").units
    assert abs(M_closed.magnitude) > 10  # hundreds of Phi_0/A expected
    assert np.isclose(
        abs(M_closed.magnitude), abs(M_open.magnitude), rtol=0.25
    )
