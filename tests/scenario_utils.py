"""Helpers to write synthetic on-disk scenarios for end-to-end tests."""

from __future__ import annotations

import os

import numpy as np

from deepmimo_tpu import consts as c
from deepmimo_tpu.converter.converter_utils import save_mat, save_params
from oracle import make_synthetic_paths


def write_synthetic_scenario(folder: str, n_ue: int = 32, max_paths: int = 8,
                             seed: int = 0, with_doppler: bool = False,
                             grid=(8, 4)) -> dict:
    """Create a fully-formed scenario folder; returns the raw matrices."""
    os.makedirs(folder, exist_ok=True)
    data = make_synthetic_paths(n_ue=n_ue, max_paths=max_paths, seed=seed,
                                with_doppler=with_doppler)
    assert grid[0] * grid[1] == n_ue

    rng = np.random.RandomState(seed + 1)
    xs, ys = np.meshgrid(np.arange(grid[0]) * 2.0, np.arange(grid[1]) * 2.0)
    rx_pos = np.stack([xs.ravel(), ys.ravel(),
                       np.full(n_ue, 1.5)], axis=1)
    tx_pos = np.array([[0.0, -10.0, 25.0]])

    # Interactions: LoS for first path of even users, else random bounces
    inter = np.full((n_ue, max_paths), np.nan)
    inter_pos = np.full((n_ue, max_paths, 3, 3), np.nan)
    for u in range(n_ue):
        nv = data["n_valid"][u]
        for p in range(nv):
            if p == 0 and u % 2 == 0:
                inter[u, p] = 0  # LoS
            else:
                n_bounce = rng.randint(1, 4)
                code = int("".join(str(rng.randint(1, 5))
                                   for _ in range(n_bounce)))
                inter[u, p] = code
                inter_pos[u, p, :n_bounce] = rng.uniform(-50, 50,
                                                         (n_bounce, 3))
    data["inter"] = inter
    data["inter_pos"] = inter_pos
    data["rx_pos"] = rx_pos
    data["tx_pos"] = tx_pos

    for key in (c.POWER_PARAM_NAME, c.PHASE_PARAM_NAME, c.DELAY_PARAM_NAME,
                c.AOA_AZ_PARAM_NAME, c.AOA_EL_PARAM_NAME,
                c.AOD_AZ_PARAM_NAME, c.AOD_EL_PARAM_NAME,
                c.RX_POS_PARAM_NAME, c.TX_POS_PARAM_NAME,
                c.INTERACTIONS_PARAM_NAME, c.INTERACTIONS_POS_PARAM_NAME):
        save_mat(data[key], key, folder, tx_set_idx=0, tx_idx=0, rx_set_idx=1)
    if with_doppler:
        for key in (c.DOPPLER_VEL_PARAM_NAME, c.DOPPLER_ACC_PARAM_NAME):
            save_mat(data[key], key, folder, tx_set_idx=0, tx_idx=0,
                     rx_set_idx=1)

    params = {
        c.VERSION_PARAM_NAME: "0.1.0",
        c.RT_PARAMS_PARAM_NAME: {
            c.RT_PARAM_RAYTRACER: c.RAYTRACER_NAME_SIONNA,
            c.RT_PARAM_RAYTRACER_VERSION: "0.19.2",
            c.RT_PARAM_FREQUENCY: 3.5e9,
            c.RT_PARAM_PATH_DEPTH: 3,
            c.RT_PARAM_MAX_REFLECTIONS: 3,
            c.RT_PARAM_MAX_DIFFRACTIONS: 1,
            c.RT_PARAM_MAX_SCATTERING: 1,
            c.RT_PARAM_MAX_TRANSMISSIONS: 0,
        },
        c.TXRX_PARAM_NAME: {
            "txrx_set_0": {
                "name": "bs", "id": 0, "id_orig": 0,
                c.TXRX_PARAM_IS_TX: True, c.TXRX_PARAM_IS_RX: False,
                c.TXRX_PARAM_NUM_POINTS: 1,
                c.TXRX_PARAM_NUM_ACTIVE_POINTS: 1,
                c.TXRX_PARAM_NUM_ANT: 1, c.TXRX_PARAM_DUAL_POL: False,
            },
            "txrx_set_1": {
                "name": "users", "id": 1, "id_orig": 1,
                c.TXRX_PARAM_IS_TX: False, c.TXRX_PARAM_IS_RX: True,
                c.TXRX_PARAM_NUM_POINTS: n_ue,
                c.TXRX_PARAM_NUM_ACTIVE_POINTS: int(
                    (data["n_valid"] > 0).sum()),
                c.TXRX_PARAM_NUM_ANT: 1, c.TXRX_PARAM_DUAL_POL: False,
            },
        },
        c.SCENE_PARAM_NAME: {
            c.SCENE_PARAM_NUMBER_SCENES: 1,
            c.SCENE_PARAM_N_OBJECTS: 0,
            c.SCENE_PARAM_N_VERTICES: 0,
            c.SCENE_PARAM_N_FACES: 0,
            c.SCENE_PARAM_N_TRIANGULAR_FACES: 0,
        },
        c.MATERIALS_PARAM_NAME: {
            "material_0": {
                "id": 0, "name": "concrete",
                c.MATERIALS_PARAM_PERMITTIVITY: 5.24,
                c.MATERIALS_PARAM_CONDUCTIVITY: 0.123,
                c.MATERIALS_PARAM_SCATTERING_MODEL: "none",
                c.MATERIALS_PARAM_SCATTERING_COEF: 0.0,
                c.MATERIALS_PARAM_CROSS_POL_COEF: 0.0,
            },
        },
    }
    save_params(params, folder)
    return data
