"""Legacy v3 scenario loader: params.mat + BS{i}_UE chunks -> Dataset.

Many published DeepMIMO scenarios ship in the previous-generation format
(``<name>.params.mat`` or ``params.mat`` plus chunked
``BS{i}_UE_{start}-{end}.mat`` files of per-user path matrices with rows
[phase(deg); ToA(s); power(dBm); DoA az; DoA el; DoD az; DoD el; LoS
(; dop_vel; dop_acc)] — format contract: reference deepmimo_v3/generator/
python/raytracing_v3.py:73-130). This loader converts them directly into
this framework's Datasets; it is also the inverse of
``integrations.matlab_export``.
"""

from __future__ import annotations

import glob
import os
import re
from typing import Dict, List, Optional

import numpy as np
import scipy.io

from .. import consts as c


def is_v3_scenario(folder: str) -> bool:
    """Does this folder hold a v3-format scenario?"""
    has_params = bool(glob.glob(os.path.join(folder, "*params.mat")))
    has_chunks = bool(glob.glob(os.path.join(folder, "BS*_UE_*.mat")))
    return has_params and has_chunks


def _load_params(folder: str) -> Dict:
    candidates = glob.glob(os.path.join(folder, "*params.mat"))
    if not candidates:
        raise FileNotFoundError(f"No params.mat in {folder}")
    data = scipy.io.loadmat(candidates[0])

    def item(key, default=None, cast=float):
        if key not in data:
            return default
        return cast(np.asarray(data[key]).ravel()[0])

    return {
        "carrier_freq": item("carrier_freq", 3.5e9),
        "transmit_power": item("transmit_power", 0.0),
        "num_bs": item("num_BS", 1, int),
        "doppler_available": item("doppler_available", 0, int),
        "dual_polar_available": item("dual_polar_available", 0, int),
        "user_grids": np.asarray(data.get("user_grids", [[1, 1, 1]]),
                                 dtype=np.int64),
    }


def _chunk_files(folder: str, bs_id: int) -> List[tuple]:
    files = []
    pattern = re.compile(rf"BS{bs_id}_UE_(\d+)-(\d+)\.mat$")
    for path in glob.glob(os.path.join(folder, f"BS{bs_id}_UE_*.mat")):
        m = pattern.search(os.path.basename(path))
        if m:
            files.append((int(m.group(1)), int(m.group(2)), path))
    return sorted(files)


def _extract_cells(file_data: Dict, key: str = "channels") -> List:
    """Per-user path matrices from a chunk file (handles cell layouts)."""
    cells = file_data[key]
    out = []
    arr = np.asarray(cells, dtype=object)
    flat = arr.ravel()
    for entry in flat:
        mat = np.asarray(entry)
        # Some writers nest cells one level deeper
        while mat.dtype == object:
            mat = np.asarray(mat.ravel()[0])
        out.append(np.asarray(mat, dtype=np.float64))
    return out


def load_v3_scenario(folder: str, max_paths: int = c.MAX_PATHS,
                     bs_ids: Optional[List[int]] = None,
                     tx_power_dbm: Optional[float] = None):
    """Load a v3-format scenario folder into Dataset/MacroDataset.

    Power re-referencing: v3 stores received power in dBm relative to the
    recorded transmit power; the standardized convention is dBW at 0 dBW
    transmit: power_dbw = power_dbm - tx_power (matching v3's
    dbm2watt(p + 30 - tx_pow) linear value, reference raytracing_v3.py:80).
    """
    from ..generator.dataset import Dataset, MacroDataset

    params = _load_params(folder)
    tx_pow = params["transmit_power"] if tx_power_dbm is None \
        else tx_power_dbm
    if bs_ids is None:
        bs_ids = list(range(1, params["num_bs"] + 1))

    # RX positions if exported
    rx_pos = None
    ue_loc_file = os.path.join(folder, "UE_locations.mat")
    if os.path.exists(ue_loc_file):
        rx_pos = np.asarray(scipy.io.loadmat(ue_loc_file)["UE_loc"],
                            dtype=np.float32)

    datasets = []
    for bs_id in bs_ids:
        chunks = _chunk_files(folder, bs_id)
        if not chunks:
            raise FileNotFoundError(f"No BS{bs_id}_UE_*.mat chunks in "
                                    f"{folder}")
        users: List[np.ndarray] = []
        for _, _, path in chunks:
            users.extend(_extract_cells(scipy.io.loadmat(path)))
        n_ue = len(users)

        nan = lambda: np.full((n_ue, max_paths), np.nan, dtype=np.float32)
        mats = {key: nan() for key in (
            c.PHASE_PARAM_NAME, c.DELAY_PARAM_NAME, c.POWER_PARAM_NAME,
            c.AOA_AZ_PARAM_NAME, c.AOA_EL_PARAM_NAME,
            c.AOD_AZ_PARAM_NAME, c.AOD_EL_PARAM_NAME,
            c.INTERACTIONS_PARAM_NAME)}
        has_dop = params["doppler_available"]
        if has_dop:
            mats[c.DOPPLER_VEL_PARAM_NAME] = nan()
            mats[c.DOPPLER_ACC_PARAM_NAME] = nan()

        for u, mat in enumerate(users):
            if mat.size == 0 or mat.ndim != 2:
                continue
            n_p = min(mat.shape[1], max_paths)
            if n_p == 0:
                continue
            mats[c.PHASE_PARAM_NAME][u, :n_p] = mat[0, :n_p]
            mats[c.DELAY_PARAM_NAME][u, :n_p] = mat[1, :n_p]
            # v3 parity: linear power = dbm2watt(p + 30 - tx_pow)
            # = 10^((p - tx_pow)/10) W, i.e. dBW = p_dbm - tx_power
            mats[c.POWER_PARAM_NAME][u, :n_p] = mat[2, :n_p] - tx_pow
            mats[c.AOA_AZ_PARAM_NAME][u, :n_p] = mat[3, :n_p]
            mats[c.AOA_EL_PARAM_NAME][u, :n_p] = mat[4, :n_p]
            mats[c.AOD_AZ_PARAM_NAME][u, :n_p] = mat[5, :n_p]
            mats[c.AOD_EL_PARAM_NAME][u, :n_p] = mat[6, :n_p]
            if mat.shape[0] > 7:
                # LoS flag -> interaction code (0 = LoS, else unknown = 1)
                mats[c.INTERACTIONS_PARAM_NAME][u, :n_p] = \
                    np.where(mat[7, :n_p] > 0, 0.0, 1.0)
            if has_dop and mat.shape[0] > 9:
                mats[c.DOPPLER_VEL_PARAM_NAME][u, :n_p] = mat[8, :n_p]
                mats[c.DOPPLER_ACC_PARAM_NAME][u, :n_p] = mat[9, :n_p]

        tx_pos = np.zeros((1, 3), dtype=np.float32)
        bs_file = os.path.join(folder, f"BS{bs_id}_BS.mat")
        if os.path.exists(bs_file):
            bs_data = scipy.io.loadmat(bs_file)
            for key in ("BS_loc", "BS_location", "loc"):
                if key in bs_data:
                    tx_pos = np.asarray(bs_data[key],
                                        dtype=np.float32).reshape(1, 3)
                    break

        d = Dataset(dict(mats))
        d[c.RX_POS_PARAM_NAME] = rx_pos if rx_pos is not None else \
            np.zeros((n_ue, 3), dtype=np.float32)
        d[c.TX_POS_PARAM_NAME] = tx_pos
        d[c.RT_PARAMS_PARAM_NAME] = {
            c.RT_PARAM_FREQUENCY: params["carrier_freq"],
            c.RT_PARAM_RAYTRACER: "legacy-v3",
            c.RT_PARAM_RAYTRACER_VERSION: "3.x",
        }
        d["txrx"] = {"tx_set_id": 0, "rx_set_id": 1, "tx_idx": bs_id - 1}
        datasets.append(d)

    if len(datasets) == 1:
        return datasets[0]
    return MacroDataset(datasets)
