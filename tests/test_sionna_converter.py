"""Sionna converter tests: synthetic pickles -> scenario -> channels."""

import os
import pickle

import numpy as np
import pytest

import deepmimo_tpu as dm
from deepmimo_tpu import consts as c
from deepmimo_tpu.converter.sionna.sionna_paths import sionna_types_to_codes


def test_interaction_code_mapping():
    # types: 0 LoS, 1 reflections, 2 diffraction, 3 scattering chain
    inter_pos = np.full((4, 3, 3), np.nan)
    inter_pos[1, :2, :] = 1.0        # 2 bounces
    inter_pos[2, :1, :] = 1.0        # 1 bounce
    inter_pos[3, :3, :] = 1.0        # 3 bounces
    codes = sionna_types_to_codes(np.array([0, 1, 2, 3]), inter_pos)
    np.testing.assert_array_equal(codes, [0, 11, 2, 113])


def test_single_scatter_code():
    inter_pos = np.full((1, 2, 3), np.nan)
    inter_pos[0, 0] = 1.0
    codes = sionna_types_to_codes(np.array([3]), inter_pos)
    assert codes[0] == 3


def _make_sionna_export(folder, n_rx=6, n_paths=4, seed=5):
    """Write a minimal but complete Sionna RT export pickle set."""
    rng = np.random.RandomState(seed)
    os.makedirs(folder, exist_ok=True)

    tx_pos = np.array([[0.0, 0.0, 20.0]])
    rx_pos = np.stack([np.arange(n_rx), np.zeros(n_rx),
                       np.full(n_rx, 1.5)], axis=1)

    # a: [batch, n_rx, rx_ant, n_tx, tx_ant, paths, time]
    a = (rng.normal(size=(1, n_rx, 1, 1, 1, n_paths, 1)) +
         1j * rng.normal(size=(1, n_rx, 1, 1, 1, n_paths, 1))) * 1e-5
    a[0, 0, 0, 0, 0, 2:, 0] = 0          # rx0 has 2 paths
    a[0, 1, :, :, :, :, :] = 0           # rx1 inactive

    shape = (1, n_rx, 1, n_paths)
    tau = rng.uniform(1e-7, 1e-5, shape)
    angles = {k: rng.uniform(-np.pi, np.pi, shape)
              for k in ("phi_r", "phi_t")}
    angles.update({k: rng.uniform(0, np.pi, shape)
                   for k in ("theta_r", "theta_t")})
    types = np.ones((1, n_paths))        # all reflection chains
    vertices = np.full((2, n_rx, 1, n_paths, 3), np.nan)
    vertices[0, :, 0, :, :] = rng.uniform(-50, 50, (n_rx, n_paths, 3))

    paths_dict = dict(a=a, tau=tau, types=types, vertices=vertices,
                      sources=tx_pos, targets=rx_pos, **angles)

    with open(os.path.join(folder, "sionna_paths.pkl"), "wb") as f:
        pickle.dump([paths_dict], f)

    rt_params = {
        "frequency": 3.5e9, "los": True, "synthetic_array": True,
        "max_depth": 3, "reflection": True, "diffraction": False,
        "scattering": False, "num_samples": 1_000_000,
        "method": "fibonacci", "scat_random_phases": False,
        "tx_array_size": 1, "tx_array_num_ant": 1,
        "rx_array_size": 1, "rx_array_num_ant": 1,
        "tx_array_ant_pos": [[0, 0, 0]], "rx_array_ant_pos": [[0, 0, 0]],
    }
    with open(os.path.join(folder, "sionna_rt_params.pkl"), "wb") as f:
        pickle.dump(rt_params, f)

    materials = [{
        "name": "itu_concrete", "relative_permittivity": 5.24,
        "conductivity": 0.123, "scattering_coefficient": 0.0,
        "xpd_coefficient": 0.0, "scattering_pattern": "LambertianPattern",
        "alpha_r": 4.0, "alpha_i": 4.0, "lambda_": 0.5,
    }]
    with open(os.path.join(folder, "sionna_materials.pkl"), "wb") as f:
        pickle.dump(materials, f)
    with open(os.path.join(folder, "sionna_material_indices.pkl"),
              "wb") as f:
        pickle.dump([0], f)

    # one cube object as a vertex soup of triangles
    tri = np.array([[0, 0, 0], [10, 0, 0], [10, 10, 0],
                    [0, 0, 0], [10, 10, 0], [0, 10, 0]], dtype=np.float64)
    with open(os.path.join(folder, "sionna_vertices.pkl"), "wb") as f:
        pickle.dump(tri, f)
    with open(os.path.join(folder, "sionna_objects.pkl"), "wb") as f:
        pickle.dump({"building_1": (0, 6)}, f)

    return paths_dict


def test_full_sionna_conversion_and_load(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    rt_folder = str(tmp_path / "sionna_run")
    ref = _make_sionna_export(rt_folder)

    scen = dm.convert(rt_folder, overwrite=True, scenario_name="sionna_scen")
    ds = dm.load(scen)

    assert ds.n_ue == 6
    power = np.asarray(ds.power)
    # rx0: two valid paths; power = 20 log10|a|
    a0 = ref["a"][0, 0, 0, 0, 0, :2, 0]
    np.testing.assert_allclose(power[0, :2], 20 * np.log10(np.abs(a0)),
                               rtol=1e-5)
    assert np.isnan(power[1]).all()      # inactive rx

    phase = np.asarray(ds.phase)
    np.testing.assert_allclose(phase[0, :2], np.angle(a0, deg=True),
                               rtol=1e-4)

    # angles converted rad -> deg
    aoa_az = np.asarray(ds.aoa_az)
    np.testing.assert_allclose(
        aoa_az[0, :2], np.rad2deg(ref["phi_r"][0, 0, 0, :2]), rtol=1e-4)

    # interactions: type-1 chains with 1 bounce -> code 1
    inter = np.asarray(ds.inter)
    assert inter[0, 0] == 1

    # rt params / txrx / materials round-trip
    assert ds.rt_params[c.RT_PARAM_FREQUENCY] == 3.5e9
    assert ds.rt_params[c.RT_PARAM_MAX_REFLECTIONS] == 3
    assert ds.rt_params["num_rays"] == 1_000_000
    txrx = ds.txrx_sets if "txrx_sets" in ds.keys() else None
    mats = ds.materials
    assert abs(mats[0].permittivity - 5.24) < 1e-9

    # active point bookkeeping: 1 inactive rx
    from deepmimo_tpu.utils import load_dict_from_json
    params = load_dict_from_json(
        str(tmp_path / "deepmimo_scenarios/sionna_scen/params.json"))
    assert params[c.TXRX_PARAM_NAME]["txrx_set_1"][
        c.TXRX_PARAM_NUM_ACTIVE_POINTS] == 5

    ch = ds.compute_channels(dm.ChannelGenParameters())
    assert ch.shape == (6, 1, 8, 1)
    assert np.isfinite(ch).all()
    assert np.abs(ch[1]).max() == 0


def test_sionna_bs_bs_paths(tmp_path, monkeypatch):
    """A leading sources==targets batch becomes the BS-BS pair (rx set 0)."""
    monkeypatch.chdir(tmp_path)
    rt_folder = str(tmp_path / "sionna_bsbs")
    _make_sionna_export(rt_folder, n_rx=4)

    # Prepend a BS-BS paths dict (1 TX to itself)
    import pickle as pk
    with open(os.path.join(rt_folder, "sionna_paths.pkl"), "rb") as f:
        dicts = pk.load(f)
    tx_pos = dicts[0]["sources"]
    bsbs = dict(dicts[0])
    bsbs["targets"] = tx_pos
    bsbs["a"] = np.ones((1, 1, 1, 1, 1, 1, 1), dtype=complex) * 1e-6
    bsbs["tau"] = np.full((1, 1, 1, 1), 1e-7)
    for k in ("phi_r", "phi_t", "theta_r", "theta_t"):
        bsbs[k] = np.full((1, 1, 1, 1), 0.5)
    bsbs["types"] = np.zeros((1, 1))
    bsbs["vertices"] = np.full((1, 1, 1, 1, 3), np.nan)
    with open(os.path.join(rt_folder, "sionna_paths.pkl"), "wb") as f:
        pk.dump([bsbs] + dicts, f)

    scen = dm.convert(rt_folder, overwrite=True, scenario_name="bsbs_scen")

    from deepmimo_tpu.utils import load_dict_from_json
    params = load_dict_from_json(
        str(tmp_path / "deepmimo_scenarios/bsbs_scen/params.json"))
    # BS set became an RX set too
    assert params[c.TXRX_PARAM_NAME]["txrx_set_0"][c.TXRX_PARAM_IS_RX]
    # BS-BS matrices exist (rx set 0)
    assert os.path.exists(str(
        tmp_path / "deepmimo_scenarios/bsbs_scen/power_t000_tx000_r000.mat"))

    ds = dm.load(scen, rx_sets=[0])
    assert np.asarray(ds.power).shape[0] == 1
