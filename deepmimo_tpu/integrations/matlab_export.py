"""Export scenarios to the legacy v3 MATLAB format.

Writes ``params.mat`` + chunked ``BS{i}_UE_{start}-{end}.mat`` files holding
per-user path matrices of rows [phase(deg); ToA(s); power(dBm); DoA az;
DoA el; DoD az; DoD el; LoS(; dop_vel; dop_acc)] — the layout consumed by
the DeepMIMO MATLAB generator family and the 5G-NR CDL bridge (format
contract: reference deepmimo_v3/generator/python/raytracing_v3.py:73-130,
utils.py:47-48).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np
import scipy.io

from .. import consts as c

CHUNK = 10_000  # users per BS{i}_UE file


def export_matlab(dataset, out_folder: str, tx_power_dbm: float = 0.0,
                  carrier_freq: Optional[float] = None,
                  chunk: int = CHUNK) -> str:
    """Export a Dataset (or MacroDataset) to the v3 MATLAB scenario layout.

    Args:
        dataset: loaded Dataset/MacroDataset.
        out_folder: destination folder (created).
        tx_power_dbm: transmit power reference for the dBm re-referencing.
        carrier_freq: carrier frequency (defaults to rt_params frequency).

    Returns:
        The output folder path.
    """
    from ..generator.dataset import Dataset, MacroDataset

    datasets = dataset.datasets if isinstance(dataset, MacroDataset) \
        else [dataset]
    os.makedirs(out_folder, exist_ok=True)

    rt_params = datasets[0].get(c.RT_PARAMS_PARAM_NAME) or {}
    if carrier_freq is None:
        carrier_freq = float(rt_params.get(c.RT_PARAM_FREQUENCY, 3.5e9))

    has_doppler = c.DOPPLER_VEL_PARAM_NAME in datasets[0].keys()
    n_ue = datasets[0].n_ue

    scipy.io.savemat(os.path.join(out_folder, "params.mat"), {
        "carrier_freq": carrier_freq,
        "transmit_power": tx_power_dbm,
        "num_BS": len(datasets),
        "user_grids": np.array([[1, n_ue, 1]], dtype=np.int64),
        "doppler_available": int(has_doppler),
        "dual_polar_available": 0,
    })

    for bs_i, ds in enumerate(datasets, start=1):
        power = np.asarray(ds[c.POWER_PARAM_NAME], dtype=np.float64)
        phase = np.asarray(ds[c.PHASE_PARAM_NAME], dtype=np.float64)
        delay = np.asarray(ds[c.DELAY_PARAM_NAME], dtype=np.float64)
        aoa_az = np.asarray(ds[c.AOA_AZ_PARAM_NAME], dtype=np.float64)
        aoa_el = np.asarray(ds[c.AOA_EL_PARAM_NAME], dtype=np.float64)
        aod_az = np.asarray(ds[c.AOD_AZ_PARAM_NAME], dtype=np.float64)
        aod_el = np.asarray(ds[c.AOD_EL_PARAM_NAME], dtype=np.float64)
        inter = np.asarray(ds[c.INTERACTIONS_PARAM_NAME], dtype=np.float64)
        if has_doppler:
            dop_v = np.asarray(ds[c.DOPPLER_VEL_PARAM_NAME],
                               dtype=np.float64)
            dop_a = np.asarray(ds[c.DOPPLER_ACC_PARAM_NAME],
                               dtype=np.float64)

        n = power.shape[0]
        for start in range(0, n, chunk):
            end = min(start + chunk, n)
            cells = np.empty((end - start, 1), dtype=object)
            for u in range(start, end):
                valid = ~np.isnan(power[u])
                nv = int(valid.sum())
                rows = 10 if has_doppler else 8
                mat = np.zeros((rows, nv), dtype=np.float64)
                v = np.where(valid)[0][:nv]
                mat[0] = phase[u, v]
                mat[1] = delay[u, v]
                # dBW -> v3 dBm convention (inverse of the legacy_v3
                # loader: dBW = p_dbm - tx_power)
                mat[2] = power[u, v] + tx_power_dbm
                mat[3] = aoa_az[u, v]
                mat[4] = aoa_el[u, v]
                mat[5] = aod_az[u, v]
                mat[6] = aod_el[u, v]
                mat[7] = (inter[u, v] == c.INTERACTION_LOS).astype(float)
                if has_doppler:
                    mat[8] = dop_v[u, v]
                    mat[9] = dop_a[u, v]
                cells[u - start, 0] = mat
            fname = f"BS{bs_i}_UE_{start}-{end}.mat"
            scipy.io.savemat(os.path.join(out_folder, fname),
                             {"channels": cells})

        # BS location file
        tx_pos = np.asarray(ds[c.TX_POS_PARAM_NAME], dtype=np.float64)
        scipy.io.savemat(os.path.join(out_folder, f"BS{bs_i}_BS.mat"),
                         {"BS_loc": tx_pos})

    # RX locations
    rx_pos = np.asarray(datasets[0][c.RX_POS_PARAM_NAME], dtype=np.float64)
    scipy.io.savemat(os.path.join(out_folder, "UE_locations.mat"),
                     {"UE_loc": rx_pos})
    return out_folder
