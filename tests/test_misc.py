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
