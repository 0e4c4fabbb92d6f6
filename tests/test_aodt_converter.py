"""AODT parquet converter: synthetic-fixture round trip.

The upstream AODT converter is a 4-line print stub (reference
deepmimo/converter/aodt/aodt_converter.py:2-3); this build implements the
parquet export layout (raypaths/cirs/rus/ues/scenario tables), so these
tests build a tiny fixture with known geometry and check the full
convert -> dm.load -> compute_channels path.
"""

import os

import numpy as np
import pytest

pd = pytest.importorskip("pandas")
pytest.importorskip("pyarrow")

import deepmimo_tpu as dm
from deepmimo_tpu import consts as c

FC = 28e9


def _write_fixture(folder):
    os.makedirs(folder, exist_ok=True)
    open(os.path.join(folder, "sim.aodt"), "w").write("aodt export marker")

    ru = np.array([0.0, 0.0, 10.0])
    ue0 = np.array([50.0, 0.0, 1.5])
    ue1 = np.array([0.0, 30.0, 1.5])
    bounce = np.array([25.0, 10.0, 5.0])

    pd.DataFrame([{"id": 0, "x": ru[0], "y": ru[1], "z": ru[2]}]
                 ).to_parquet(os.path.join(folder, "rus.parquet"))
    pd.DataFrame([
        {"id": 0, "x": ue0[0], "y": ue0[1], "z": ue0[2]},
        {"id": 1, "x": ue1[0], "y": ue1[1], "z": ue1[2]},
    ]).to_parquet(os.path.join(folder, "ues.parquet"))

    rays = [
        # UE 0: LoS (emission -> reception)
        {"time_idx": 0, "ru_id": 0, "ue_id": 0, "path_id": 0,
         "points": np.concatenate([ru, ue0]).tolist(),
         "interaction_types": [0, 5]},
        # UE 0: single reflection
        {"time_idx": 0, "ru_id": 0, "ue_id": 0, "path_id": 1,
         "points": np.concatenate([ru, bounce, ue0]).tolist(),
         "interaction_types": [0, 1, 5]},
        # UE 1: reflection + diffraction
        {"time_idx": 0, "ru_id": 0, "ue_id": 1, "path_id": 0,
         "points": np.concatenate([ru, bounce, ue1]).tolist(),
         "interaction_types": [0, 1, 2, 5][:3]},
    ]
    pd.DataFrame(rays).to_parquet(os.path.join(folder, "raypaths.parquet"))

    amp0 = 1e-5 * np.exp(1j * np.deg2rad(30.0))
    amp1 = 3e-6 * np.exp(1j * np.deg2rad(-45.0))
    amp2 = 2e-6 * np.exp(1j * np.deg2rad(120.0))
    cirs = [
        {"time_idx": 0, "ru_id": 0, "ue_id": 0, "path_id": 0,
         "cir_re": amp0.real, "cir_im": amp0.imag,
         "cir_delay": np.linalg.norm(ue0 - ru) / 3e8},
        {"time_idx": 0, "ru_id": 0, "ue_id": 0, "path_id": 1,
         "cir_re": amp1.real, "cir_im": amp1.imag, "cir_delay": 3e-7},
        {"time_idx": 0, "ru_id": 0, "ue_id": 1, "path_id": 0,
         "cir_re": amp2.real, "cir_im": amp2.imag, "cir_delay": 2e-7},
    ]
    pd.DataFrame(cirs).to_parquet(os.path.join(folder, "cirs.parquet"))

    pd.DataFrame([{"carrier_frequency": FC, "max_depth": 2,
                   "version": "1.2"}]).to_parquet(
        os.path.join(folder, "scenario.parquet"))
    return ru, ue0, ue1, (amp0, amp1, amp2)


@pytest.fixture()
def converted(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)   # scenarios land under cwd
    rt = str(tmp_path / "aodt_sim")
    geo = _write_fixture(rt)
    name = dm.convert(rt, overwrite=True, scenario_name="aodt_fix")
    return name, geo


def test_convert_dispatch_and_load(converted):
    name, (ru, ue0, ue1, amps) = converted
    assert name == "aodt_fix"
    ds = dm.load(name)
    assert ds.n_ue == 2
    np.testing.assert_allclose(np.asarray(ds.tx_pos).ravel(), ru)
    np.testing.assert_allclose(np.asarray(ds.rx_pos)[0], ue0)

    # LoS path of UE 0: power/phase/delay from the cir amplitude
    p = np.asarray(ds.power)
    ph = np.asarray(ds.phase)
    np.testing.assert_allclose(p[0, 0], 20 * np.log10(abs(amps[0])),
                               rtol=1e-5)
    np.testing.assert_allclose(ph[0, 0], 30.0, atol=1e-4)
    # angles of the LoS segment: ue0 is along +x, slightly below the RU
    aod_az = np.asarray(ds.aod_az)[0, 0]
    aod_el = np.asarray(ds.aod_el)[0, 0]
    d = ue0 - ru
    np.testing.assert_allclose(aod_az, 0.0, atol=1e-4)
    np.testing.assert_allclose(
        aod_el, np.degrees(np.arccos(d[2] / np.linalg.norm(d))), atol=1e-4)
    # arrival = reversed segment
    np.testing.assert_allclose(np.asarray(ds.aoa_az)[0, 0], 180.0,
                               atol=1e-4)

    # interaction codes: LoS=0, reflection=1, reflection+diffraction=12
    inter = np.asarray(ds.inter)
    assert inter[0, 0] == 0 and inter[0, 1] == 1 and inter[1, 0] == 12
    los = np.asarray(ds.los)
    assert los[0] == 1 and los[1] == 0


def test_converted_scenario_renders(converted):
    name, _ = converted
    ds = dm.load(name)
    params = dm.ChannelGenParameters()
    params["ofdm"]["selected_subcarriers"] = np.arange(8)
    params["num_paths"] = 4
    h = ds.compute_channels(params)
    assert h.shape == (2, 1, 8, 8)
    assert np.isfinite(h).all() and np.abs(h).max() > 0
