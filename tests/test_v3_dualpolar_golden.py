"""Golden dual-polarization parity vs the ACTUAL upstream v3 generator.

v3 generates one channel per polarization pair by running the same MIMO
construction on per-polarization path dicts (reference deepmimo_v3/
generator/python/generator.py:71-78). Our Dataset does the equivalent with
per-polarization power/phase matrices sharing angles/delays. These tests
feed both stacks the same data and compare the VV/VH/HH/HV quadruple
number-for-number (VERDICT round 1, weak #4).
"""

import os

import numpy as np
import pytest

import deepmimo_tpu as dm
from deepmimo_tpu.config import config
from oracle import make_synthetic_paths
from v3_harness import (import_v3, raydata_from_matrices, v3_params, v3_ant,
                        REFERENCE_PATH)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE_PATH, "deepmimo_v3")),
    reason="reference deepmimo_v3 package not available")

N_UE = 24
MAX_PATHS = 6
BW = 10e6
POLS = ("VV", "VH", "HH", "HV")


@pytest.fixture(scope="module")
def data():
    base = make_synthetic_paths(n_ue=N_UE, max_paths=MAX_PATHS, seed=41)
    rng = np.random.RandomState(17)
    nanmask = np.isnan(base["power"])
    per_pol = {}
    for pol in POLS:
        per_pol[pol] = {
            "power": np.where(nanmask, np.nan,
                              rng.uniform(-120, -70, base["power"].shape)),
            "phase": np.where(nanmask, np.nan,
                              rng.uniform(-180, 180, base["power"].shape)),
        }
    return base, per_pol


@pytest.mark.parametrize("mode,tol", [("production", 4e-4), ("f64", 3e-5)])
def test_dual_polar_quadruple_matches_v3(data, mode, tol):
    base, per_pol = data
    cd = import_v3()

    params = v3_params(n_subcarriers=64, selected=np.arange(8),
                       bandwidth_hz=BW, num_paths=MAX_PATHS)

    v3_ch = {}
    for pol in POLS:
        d = dict(base)
        d["power"] = per_pol[pol]["power"]
        d["phase"] = per_pol[pol]["phase"]
        raydata = raydata_from_matrices(d)
        ch, _ = cd.generate_MIMO_channel(raydata, params, v3_ant((2, 2)),
                                         v3_ant((2, 1), n_ue=N_UE))
        v3_ch[pol] = np.asarray(ch)

    ds_data = {k: np.asarray(base[k], dtype=np.float32)
               for k in ("power", "phase", "delay", "aoa_az", "aoa_el",
                         "aod_az", "aod_el")} | \
        {"rx_pos": np.zeros((N_UE, 3), dtype=np.float32),
         "tx_pos": np.zeros((1, 3), dtype=np.float32)}
    for pol in POLS:
        ds_data[f"power_{pol.lower()}"] = np.asarray(
            per_pol[pol]["power"], dtype=np.float32)
        ds_data[f"phase_{pol.lower()}"] = np.asarray(
            per_pol[pol]["phase"], dtype=np.float32)
    ds = dm.Dataset(ds_data)

    p = dm.ChannelGenParameters()
    p["enable_dual_polar"] = 1
    p["bs_antenna"]["shape"] = np.array([2, 2])
    p["ue_antenna"]["shape"] = np.array([2, 1])
    p["ofdm"]["subcarriers"] = 64
    p["ofdm"]["selected_subcarriers"] = np.arange(8)
    p["ofdm"]["bandwidth"] = BW
    p["num_paths"] = MAX_PATHS

    old_dt = config.get("compute_dtype")
    config.set("compute_dtype",
               "complex64" if mode == "production" else "complex128")
    try:
        ours = ds.compute_channels(p)
    finally:
        config.set("compute_dtype", old_dt)

    assert set(ours.keys()) == set(POLS)
    for pol in POLS:
        scale = max(np.abs(v3_ch[pol]).max(), 1e-30)
        np.testing.assert_allclose(ours[pol], v3_ch[pol], atol=tol * scale,
                                   err_msg=f"polarization {pol}")


def test_dual_polar_requires_matrices():
    base = make_synthetic_paths(n_ue=4, max_paths=3, seed=1)
    ds = dm.Dataset({k: np.asarray(base[k], dtype=np.float32)
                     for k in ("power", "phase", "delay", "aoa_az",
                               "aoa_el", "aod_az", "aod_el")} |
                    {"rx_pos": np.zeros((4, 3), dtype=np.float32),
                     "tx_pos": np.zeros((1, 3), dtype=np.float32)})
    p = dm.ChannelGenParameters()
    p["enable_dual_polar"] = 1
    with pytest.raises(ValueError, match="polarization"):
        ds.compute_channels(p)
