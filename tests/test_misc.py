"""Tests: upload validators, CLI scripts, config, utils, summary, scene."""

import json
import os
import zipfile

import numpy as np
import pytest

import deepmimo_tpu as dm
from deepmimo_tpu import consts as c
from deepmimo_tpu.api_validators import (validate_extensions,
                                         validate_structure,
                                         validate_scenario_zip)
from scenario_utils import write_synthetic_scenario


@pytest.fixture()
def scenario_zip(tmp_path):
    folder = str(tmp_path / "zipscen")
    write_synthetic_scenario(folder, n_ue=8, max_paths=4, seed=1,
                             grid=(4, 2))
    return dm.zip(folder)


def test_validators_accept_good_scenario(scenario_zip):
    assert validate_extensions(scenario_zip)["valid"]
    assert validate_structure(scenario_zip)["valid"]
    assert validate_scenario_zip(scenario_zip)["valid"]


def test_validators_reject_bad_extension(tmp_path):
    z = str(tmp_path / "bad.zip")
    with zipfile.ZipFile(z, "w") as zf:
        zf.writestr("evil.exe", b"x")
    res = validate_scenario_zip(z)
    assert not res["valid"] and "evil.exe" in res["error"]


def test_validators_reject_missing_params(tmp_path):
    z = str(tmp_path / "nop.zip")
    with zipfile.ZipFile(z, "w") as zf:
        zf.writestr("power_t000_tx000_r001.mat", b"x")
    res = validate_structure(z)
    assert not res["valid"] and "params.json" in res["error"]


def test_validator_cli(scenario_zip, capsys):
    from deepmimo_tpu.api_validators import main
    assert main([scenario_zip]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["valid"]


def test_stats_cli(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    folder = str(tmp_path / "deepmimo_scenarios" / "stats_scen")
    write_synthetic_scenario(folder, n_ue=8, max_paths=4, seed=2,
                             grid=(4, 2))
    from deepmimo_tpu.scripts.stats_cli import main
    assert main(["stats_scen", "--json"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out[0]["n_ue"] == 8
    assert out[0]["frequency_ghz"] == 3.5


def test_zip_unzip_roundtrip(tmp_path, monkeypatch):
    folder = str(tmp_path / "rt_scen")
    write_synthetic_scenario(folder, n_ue=8, max_paths=4, seed=3,
                             grid=(4, 2))
    zpath = dm.zip(folder)
    import shutil
    shutil.rmtree(folder)
    extracted = dm.unzip(zpath)
    ds = dm.load(os.path.join(extracted, "rt_scen"))
    assert ds.n_ue == 8


def test_config_singleton():
    from deepmimo_tpu.config import DeepMIMOConfig
    assert DeepMIMOConfig() is dm.config
    old = dm.config.get("user_block")
    dm.config.set("user_block", 1234)
    assert dm.config("user_block") == 1234
    dm.config.set("user_block", old)
    with pytest.raises(KeyError):
        dm.config.set("not_a_key", 1)


def test_summary_text(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    folder = str(tmp_path / "deepmimo_scenarios" / "sum_scen")
    write_synthetic_scenario(folder, n_ue=8, max_paths=4, seed=4,
                             grid=(4, 2))
    text = dm.summary("sum_scen", print_summary=False)
    assert "sum_scen" in text
    assert "3.500 GHz" in text
    assert "users" in text


def test_scene_roundtrip(tmp_path):
    from deepmimo_tpu.scene import Scene, Face, PhysicalElement
    scene = Scene()
    cube = [
        Face([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], material_idx=2),
        Face([[0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]], material_idx=2),
    ]
    scene.add_object(PhysicalElement(cube, label="buildings", name="bldg"))
    meta = scene.export_data(str(tmp_path))
    assert meta[c.SCENE_PARAM_N_OBJECTS] == 1
    assert meta[c.SCENE_PARAM_N_TRIANGULAR_FACES] == 4

    loaded = Scene.from_data(str(tmp_path))
    assert len(loaded.objects) == 1
    obj = loaded.objects[0]
    assert obj.label == "buildings"
    assert obj.materials == {2}
    assert abs(obj.bounding_box.height - 1.0) < 1e-6
    group = loaded.get_objects(label="buildings")
    assert len(group) == 1
    assert len(loaded.get_objects(material=2)) == 1


def test_object_faces_fast_prism():
    from deepmimo_tpu.scene import get_object_faces
    rng = np.random.RandomState(0)
    # Box-ish 3D soup: unit-square footprint, 0..5m tall
    base = rng.uniform(0, 1, (40, 2))
    corners = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=float)
    pts2d = np.vstack([base, corners])
    z = rng.uniform(0, 5, (len(pts2d), 1))
    z[:4] = 0.0
    z[4:8] = 5.0
    verts = np.hstack([pts2d, z])
    faces = get_object_faces(verts, fast=True)
    # bottom + top + one quad per hull edge (hull = the 4 corners)
    assert len(faces) == 2 + 4
    zs = np.concatenate([f[:, 2] for f in faces])
    assert zs.min() == 0.0 and zs.max() == 5.0

    # Flat soup (road): single outline face at original height
    flat = np.hstack([pts2d * [100, 3], np.full((len(pts2d), 1), 1.5)])
    faces = get_object_faces(flat, fast=True)
    assert len(faces) == 1
    assert np.allclose(faces[0][:, 2], 1.5)

    # Degenerate (collinear) -> None, as in the reference
    line = np.column_stack([np.linspace(0, 9, 10), np.zeros(10), np.zeros(10)])
    assert get_object_faces(line, fast=True) is None


def test_object_faces_road_polygon():
    """Non-convex planar outline reconstructed as a simple polygon."""
    from deepmimo_tpu.scene import get_object_faces
    # L-shaped road outline, shuffled point order
    outline = np.array([[0, 0], [10, 0], [10, 4], [4, 4], [4, 10], [0, 10]],
                       dtype=float)
    rng = np.random.RandomState(3)
    perm = rng.permutation(len(outline))
    verts = np.hstack([outline[perm], np.zeros((len(outline), 1))])
    faces = get_object_faces(verts, fast=False)
    assert len(faces) == 1
    poly = faces[0][:, :2]
    assert len(poly) == 6  # all corners kept, no collinear extras
    assert len(np.unique(poly, axis=0)) == 6

    # The reconstruction must be a SIMPLE polygon (no edge crossings) ...
    def _crosses(p1, p2, q1, q2):
        def ccw(a, b, c):
            return (c[1] - a[1]) * (b[0] - a[0]) > (b[1] - a[1]) * (c[0] - a[0])
        return (ccw(p1, q1, q2) != ccw(p2, q1, q2)
                and ccw(p1, p2, q1) != ccw(p1, p2, q2))

    n = len(poly)
    edges = [(poly[i], poly[(i + 1) % n]) for i in range(n)]
    for i in range(n):
        for j in range(i + 2, n):
            if i == 0 and j == n - 1:
                continue  # adjacent via wraparound
            assert not _crosses(*edges[i], *edges[j]), (i, j)

    # ... and capture the non-convexity: strictly less area than the hull
    x, y = poly[:, 0], poly[:, 1]
    area = 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
    assert area < 100.0 - 1e-6  # hull (10x10 square) area is 100

    # An unambiguous outline IS recovered exactly: thin rectangle road
    rect = np.array([[0, 0], [50, 0], [50, 3], [0, 3]], dtype=float)
    mids = np.array([[10, 0], [20, 0], [30, 3], [40, 3]], dtype=float)
    pts = np.vstack([rect, mids])[rng.permutation(8)]
    verts = np.hstack([pts, np.full((8, 1), 0.5)])
    faces = get_object_faces(verts, fast=False)
    poly = faces[0][:, :2]
    x, y = poly[:, 0], poly[:, 1]
    area = 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
    assert abs(area - 150.0) < 1e-9  # collinear mid-edge points dropped
    assert len(poly) == 4


def test_txrx_pairs(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    folder = str(tmp_path / "deepmimo_scenarios" / "txrx_scen")
    write_synthetic_scenario(folder, n_ue=8, max_paths=4, seed=5,
                             grid=(4, 2))
    sets = dm.get_txrx_sets("txrx_scen")
    assert len(sets) == 2
    pairs = dm.get_txrx_pairs(sets)
    assert len(pairs) == 1
    assert pairs[0].tx.name == "bs"
    dm.print_available_txrx_pair_ids("txrx_scen")


def test_convert_cli_loop(tmp_path, monkeypatch, capsys):
    """Batch converter: converts good runs, collects errors, retries."""
    from deepmimo_tpu.scripts.convert_cli import main
    from test_sionna_converter import _make_sionna_export

    monkeypatch.chdir(tmp_path)
    base = tmp_path / "runs"
    _make_sionna_export(str(base / "run_a"))
    (base / "run_bad").mkdir(parents=True)  # nothing to sniff -> error

    log = str(tmp_path / "errs.json")
    rc = main([str(base), "--error-log", log])
    assert rc == 1  # one failure recorded
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["converted"] == ["run_a"]
    assert report["errors"][0][0] == "run_bad"
    with open(log) as f:
        assert json.load(f)[0][0] == "run_bad"

    # Retry mode only touches the failed folder; fix it first
    _make_sionna_export(str(base / "run_bad"))
    rc = main([str(base), "--retry", "--error-log", log])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["converted"] == ["run_bad"]
    assert not os.path.exists(log)  # cleared after successful retry


def test_csv_gen_cli(tmp_path, capsys):
    from deepmimo_tpu.scripts.csv_gen_cli import main
    from deepmimo_tpu.pipelines.runner import read_pipeline_csv
    from deepmimo_tpu.pipelines.geo_utils import bbox_size_meters

    cities = tmp_path / "worldcities.csv"
    cities.write_text(
        "city,city_ascii,lat,lng,population\n"
        "Tokyo,Tokyo,35.6897,139.6922,37977000\n"
        "Smallville,Smallville,40.0,-90.0,1200\n"
        "São Paulo,Sao Paulo,-23.5504,-46.6339,22046000\n")
    out = tmp_path / "pipeline.csv"
    rc = main([str(cities), str(out), "--box-m", "400", "--num-bs", "2",
               "--bs-height", "12"])
    assert rc == 0

    rows = read_pipeline_csv(str(out))
    assert len(rows) == 2  # population filter drops Smallville
    assert "tokyo" in rows[0].name and "sao_paulo" in rows[1].name
    for row in rows:
        w, h = bbox_size_meters(row.gps_bbox)
        assert abs(w - 400) < 5 and abs(h - 400) < 5
        assert len(row.bs_lats) == 2 and row.bs_heights == [12.0, 12.0]
        for blat, blon in zip(row.bs_lats, row.bs_lons):
            assert row.min_lat < blat < row.max_lat
            assert row.min_lon < blon < row.max_lon


def test_linear_path():
    rx_pos = np.column_stack([np.arange(100, dtype=float),
                              np.zeros(100), np.zeros(100)])
    lp = dm.LinearPath(rx_pos, [0.0, 0.0], [50.0, 0.0], res=5.0)
    assert lp.n == len(lp.idxs)
    assert lp.idxs[0] == 0
    assert np.all(np.diff(lp.idxs) > 0)


def test_idxs_with_limits():
    pos = np.array([[0, 0, 0], [5, 5, 0], [10, 10, 0]], dtype=float)
    idxs = dm.get_idxs_with_limits(pos, x_min=1, x_max=9)
    np.testing.assert_array_equal(idxs, [1])
    with pytest.raises(ValueError):
        dm.get_idxs_with_limits(pos, bad_key=1)


def test_info_prints(capsys):
    dm.info("power")
    out = capsys.readouterr().out
    assert "dBW" in out
    dm.info("pwr")  # alias
    assert "alias" not in capsys.readouterr().out  # info() resolves silently


def test_info_covers_reference_registry(capsys):
    # Every key the reference documents (info.py:11-159: fundamental +
    # computed matrices, scenario metadata, channel-param help) has an
    # entry here too.
    ref_keys = [
        "power", "phase", "delay", "aoa_az", "aoa_el", "aod_az", "aod_el",
        "rx_pos", "tx_pos", "inter", "inter_pos", "channel", "num_paths",
        "num_interactions", "power_linear", "pathloss", "distance", "los",
        "inter_str", "inter_int", "txrx_sets", "rt_params", "scene",
        "materials", "bs_antenna", "bs_antenna.shape", "bs_antenna.spacing",
        "bs_antenna.rotation", "bs_antenna.radiation_pattern", "ue_antenna",
        "ofdm", "ofdm.subcarriers", "ofdm.selected_subcarriers",
        "ofdm.bandwidth", "ofdm.rx_filter", "freq_domain", "enable_doppler",
        "enable_dual_polar",
    ]
    for key in ref_keys:
        dm.info(key)
        out = capsys.readouterr().out
        assert "No info available" not in out, f"missing info for {key!r}"


def test_checkpoint_resume(tmp_path, monkeypatch):
    """Interrupted generation resumes from persisted blocks."""
    folder = str(tmp_path / "ck_scen")
    write_synthetic_scenario(folder, n_ue=8, max_paths=4, seed=9,
                             grid=(4, 2))
    ds = dm.load(folder)
    old_block = dm.config.get("user_block")
    dm.config.set("user_block", 4)            # 2 blocks
    dm.config.set("checkpoint_dir", str(tmp_path / "ckpt"))
    try:
        ch1 = ds.compute_channels(dm.ChannelGenParameters())
        # chunks persisted
        from deepmimo_tpu.generator.checkpoint import ChunkStore
        import os as _os
        fps = _os.listdir(str(tmp_path / "ckpt"))
        assert len(fps) == 1
        store = ChunkStore(str(tmp_path / "ckpt"), fps[0])
        assert store.blocks() == [0, 4]

        # resume path: fresh dataset reuses the chunks (values identical)
        ds2 = dm.load(folder)
        ch2 = ds2.compute_channels(dm.ChannelGenParameters())
        np.testing.assert_allclose(ch1, ch2, atol=1e-7)
    finally:
        dm.config.set("user_block", old_block)
        dm.config.set("checkpoint_dir", None)
