import superscreen_tpu as sc


def test_version_dict():
    info = sc.version_dict()
    assert "superscreen_tpu" in info
    assert "jax" in info
    assert "numpy" in info
    assert "jax_backend" in info


def test_version_table():
    table = sc.version_table()
    assert table is not None


def test_version():
    assert sc.__version__
    assert len(sc.__version_info__) == 3
