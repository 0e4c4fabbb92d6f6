"""Harness for driving the upstream legacy v3 generator as a golden oracle.

Builds the per-user raydata dicts `deepmimo_v3.generator.python.
construct_deepmimo.generate_MIMO_channel` consumes (reference
deepmimo_v3/generator/python/raytracing_v3.py:73-130 layout) from our
NaN-padded path matrices, so Doppler / dual-polar channels can be compared
number-for-number against the actual v3 implementation rather than a
re-derivation of its formulas.
"""

import sys

import numpy as np

REFERENCE_PATH = "/root/reference"


def import_v3():
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    from deepmimo_v3.generator.python import construct_deepmimo
    return construct_deepmimo


def raydata_from_matrices(data, doppler_vel=None, doppler_acc=None,
                          power_key="power", phase_key="phase"):
    """NaN-padded [U, P] matrices -> v3 per-user raydata dict list.

    v3 stores power LINEAR (watt) — the converter applies dbm2watt before
    generation (reference deepmimo_v3/generator/python/raytracing_v3.py:112).
    Our matrices are dBW.
    """
    power_dbw = np.asarray(data[power_key], dtype=np.float64)
    n_ue, _ = power_dbw.shape
    raydata = []
    for i in range(n_ue):
        m = ~np.isnan(power_dbw[i])
        n = int(m.sum())
        d = {
            "num_paths": n,
            "power": 10.0 ** (power_dbw[i][m] / 10.0),
            "phase": np.asarray(data[phase_key][i][m], dtype=np.float64),
            "ToA": np.asarray(data["delay"][i][m], dtype=np.float64),
            "DoA_phi": np.asarray(data["aoa_az"][i][m], dtype=np.float64),
            "DoA_theta": np.asarray(data["aoa_el"][i][m], dtype=np.float64),
            "DoD_phi": np.asarray(data["aod_az"][i][m], dtype=np.float64),
            "DoD_theta": np.asarray(data["aod_el"][i][m], dtype=np.float64),
            "LoS": np.zeros(n, dtype=np.int8),
        }
        if doppler_vel is not None:
            d["Doppler_vel"] = np.asarray(doppler_vel[i][m], dtype=np.float64)
            d["Doppler_acc"] = np.asarray(doppler_acc[i][m], dtype=np.float64)
        raydata.append(d)
    return raydata


def v3_params(n_subcarriers=64, selected=None, bandwidth_hz=10e6,
              rx_filter=0, num_paths=25, freq_domain=1,
              enable_doppler=0, carrier_freq=3.5e9):
    """Minimal v3 params dict for generate_MIMO_channel.

    v3 takes bandwidth in GHz (PARAMSET_OFDM_BW_MULT=1e9,
    deepmimo_v3/consts.py:99).
    """
    if selected is None:
        selected = np.arange(n_subcarriers)
    return {
        "freq_domain": freq_domain,
        "num_paths": num_paths,
        "enable_doppler": enable_doppler,
        "ofdm": {
            "subcarriers": n_subcarriers,
            "selected_subcarriers": np.asarray(selected),
            "bandwidth": bandwidth_hz / 1e9,
            "rx_filter": rx_filter,
        },
        "scenario_params": {
            "doppler_available": 1,
            "carrier_freq": carrier_freq,
        },
    }


def v3_ant(shape, n_ue=None, rotation=(0, 0, 0), spacing=0.5,
           pattern="isotropic"):
    """v3 antenna params; RX rotation is indexed per user in v3
    (construct_deepmimo.py:41) so it ships as an [n_ue, 3] array."""
    rot = np.asarray(rotation, dtype=np.float64)
    if n_ue is not None:
        rot = np.broadcast_to(rot, (n_ue, 3)).copy()
    return {
        "shape": np.asarray(shape),
        "spacing": spacing,
        "rotation": rot,
        "radiation_pattern": pattern,
        "fov": np.array([360, 180]),
    }
