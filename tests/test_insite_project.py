"""InSite project generation: a loadable project from rt_params alone.

The generator must ship no user template: .setup, project XML, and .txrx
are all built from rt_params (full automation parity with the reference's
XmlGenerator/SetupEditor, reference pipelines/wireless_insite/WI_interface/
XmlGenerator.py:22-120, SetupEditor.py:72-330). "Loadable" is asserted by
round-tripping the emitted files through BOTH converters' parsers.
"""

import os

import numpy as np
import pytest

from deepmimo_tpu.pipelines.insite_project import (
    write_insite_project, infer_grid, build_setup_nodes)
from deepmimo_tpu.converter.insite.tokenfmt import (parse_insite_text,
                                                    serialize_insite_text)

RT_PARAMS = {
    "name": "autogen",
    "frequency": 28e9,
    "bandwidth": 50e6,
    "max_reflections": 3,
    "max_diffractions": 1,
    "max_transmissions": 0,
    "ray_spacing": 0.2,
    "origin_lat": 33.42,
    "origin_lon": -111.93,
    "zmin": -2.0,
    "zmax": 120.0,
}

TX = np.array([[0.0, -10.0, 25.0]])


def _grid_rx(nx=4, ny=3, sp=2.0, z=1.5):
    xs, ys = np.meshgrid(np.arange(nx) * sp, np.arange(ny) * sp)
    return np.stack([xs.ravel(), ys.ravel(), np.full(nx * ny, z)], axis=1)


def test_setup_serialization_roundtrip():
    nodes = build_setup_nodes(RT_PARAMS)
    text = serialize_insite_text(nodes)
    back = parse_insite_text(text)
    assert back[0].kind == "project"
    model = back[0].find_all("model")[0]
    assert model["max_reflections"] == 3
    assert model["ray_spacing"] == 0.2
    wave = back[0].find_all("Waveform")[0]
    assert wave["CarrierFrequency"] == 28e9
    boundary = back[0].find_all("boundary")[0]
    assert len(boundary.data) == boundary["nVertices"] == 4


def test_project_parses_with_our_converter(tmp_path):
    out = str(tmp_path / "proj")
    setup_path = write_insite_project("row", out, TX, _grid_rx(), RT_PARAMS,
                                      feature_files=("city.city",))
    assert os.path.exists(setup_path)

    # .setup -> rt params via the converter's reader
    from deepmimo_tpu.converter.insite.rt_params import read_rt_params
    rt = read_rt_params(out)
    assert rt["frequency"] == 28e9
    assert rt["max_reflections"] == 3
    assert rt["max_diffractions"] == 1
    assert rt["raw_params"]["model"]["ray_spacing"] == 0.2

    # project XML -> txrx sets via the converter's reader
    from deepmimo_tpu.converter.insite.txrx import read_txrx
    txrx_dict, locations = read_txrx(out)
    sets = list(txrx_dict.values())
    tx_sets = [s for s in sets if s["is_tx"]]
    rx_sets = [s for s in sets if s["is_rx"]]
    assert len(tx_sets) == 1 and len(rx_sets) == 1
    assert rx_sets[0]["num_points"] == 12      # grid expands to 4x3
    rx_idx = sets.index(rx_sets[0])            # locations keyed by set index
    np.testing.assert_allclose(locations[rx_idx], _grid_rx(), atol=1e-9)


def test_project_parses_with_upstream_converter(tmp_path):
    """The upstream package's own parsers accept the generated project."""
    import sys
    if not os.path.isdir("/root/reference/deepmimo"):
        pytest.skip("reference unavailable")

    out = str(tmp_path / "proj")
    write_insite_project("row", out, TX, _grid_rx(), RT_PARAMS)

    sys.path.insert(0, "/root/reference")
    try:
        for mod in list(sys.modules):
            if mod == "deepmimo" or mod.startswith("deepmimo."):
                del sys.modules[mod]
        from deepmimo.converter.wireless_insite.insite_rt_params import (
            read_rt_params as up_read_rt)
        from deepmimo.converter.wireless_insite.insite_txrx import (
            read_txrx as up_read_txrx)

        rt = up_read_rt(out)
        assert rt["frequency"] == 28e9
        assert rt["max_reflections"] == 3

        txrx_dict = up_read_txrx(out)
        rx = [s for s in txrx_dict.values()
              if isinstance(s, dict) and s.get("is_rx")]
        tx = [s for s in txrx_dict.values()
              if isinstance(s, dict) and s.get("is_tx")]
        assert len(rx) == 1 and len(tx) == 1
        assert rx[0]["num_points"] == 12
    finally:
        sys.path.remove("/root/reference")
        for mod in list(sys.modules):
            if mod == "deepmimo" or mod.startswith("deepmimo."):
                del sys.modules[mod]


def test_infer_grid():
    rx = _grid_rx(5, 4, 1.5)
    origin, lx, ly, sp = infer_grid(rx)
    np.testing.assert_allclose(origin, [0, 0, 1.5])
    assert (lx, ly, sp) == (6.0, 4.5, 1.5)
    assert infer_grid(np.random.RandomState(0).uniform(0, 1, (8, 3))) is None


def test_point_list_fallback(tmp_path):
    """Irregular RX positions fall back to an explicit point set."""
    out = str(tmp_path / "proj")
    rx = np.array([[0, 0, 1.5], [3, 1, 1.5], [7, 2, 2.0]])
    write_insite_project("row", out, TX, rx, RT_PARAMS)

    from deepmimo_tpu.converter.insite.txrx import read_txrx
    txrx_dict, locations = read_txrx(out)
    sets = list(txrx_dict.values())
    rx_sets = [s for s in sets if s["is_rx"]]
    assert rx_sets[0]["num_points"] == 3
    np.testing.assert_allclose(locations[sets.index(rx_sets[0])], rx,
                               atol=1e-9)
