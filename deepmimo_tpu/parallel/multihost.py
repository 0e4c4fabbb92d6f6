"""Multi-host data loading: shard scenario path data across processes.

On a pod slice each host loads only its users (no full-scenario
replication) and the global device array is assembled with
``jax.make_array_from_process_local_data``. Single-process meshes take a
fast path so the same code runs everywhere.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.types import PathData
from .mesh import USERS_AXIS


def host_user_range(n_ue: int, process_index: Optional[int] = None,
                    process_count: Optional[int] = None) -> Tuple[int, int]:
    """[start, end) of the users this host is responsible for."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    per = -(-n_ue // pc)  # ceil
    start = min(pi * per, n_ue)
    return start, min(start + per, n_ue)


def load_paths_sharded(dataset, mesh: Mesh,
                       num_paths: Optional[int] = None) -> PathData:
    """Build a user-sharded global PathData from a Dataset.

    Each process converts only its user slice; the global array spans the
    mesh's ``users`` axis. On one process this is a plain device_put.
    """
    from .. import consts as c

    n_ue = dataset.n_ue
    sharding = NamedSharding(mesh, P(USERS_AXIS))

    def mat(key):
        return np.asarray(dataset[key])

    if jax.process_count() == 1:
        pd = PathData.from_numpy(
            power=mat(c.POWER_PARAM_NAME), phase=mat(c.PHASE_PARAM_NAME),
            delay=mat(c.DELAY_PARAM_NAME),
            aoa_az=mat(c.AOA_AZ_PARAM_NAME),
            aoa_el=mat(c.AOA_EL_PARAM_NAME),
            aod_az=mat(c.AOD_AZ_PARAM_NAME),
            aod_el=mat(c.AOD_EL_PARAM_NAME),
            doppler_vel=dataset.get(c.DOPPLER_VEL_PARAM_NAME),
            doppler_acc=dataset.get(c.DOPPLER_ACC_PARAM_NAME))
        if num_paths:
            pd = pd.trim_paths(num_paths)
        return jax.tree_util.tree_map(
            lambda x: None if x is None else jax.device_put(x, sharding),
            pd)

    # Multi-process: build the local shard, then assemble the global array.
    start, end = host_user_range(n_ue)
    local = PathData.from_numpy(
        power=mat(c.POWER_PARAM_NAME)[start:end],
        phase=mat(c.PHASE_PARAM_NAME)[start:end],
        delay=mat(c.DELAY_PARAM_NAME)[start:end],
        aoa_az=mat(c.AOA_AZ_PARAM_NAME)[start:end],
        aoa_el=mat(c.AOA_EL_PARAM_NAME)[start:end],
        aod_az=mat(c.AOD_AZ_PARAM_NAME)[start:end],
        aod_el=mat(c.AOD_EL_PARAM_NAME)[start:end])
    if num_paths:
        local = local.trim_paths(num_paths)

    def globalize(x):
        if x is None:
            return None
        global_shape = (n_ue,) + tuple(np.asarray(x).shape[1:])
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x), global_shape)

    return jax.tree_util.tree_map(globalize, local)
