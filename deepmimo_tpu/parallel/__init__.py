"""Multi-chip sharding: meshes, sharded renderers, distributed training."""

from .mesh import make_mesh, default_mesh_shape
from .sharded import (shard_paths, render_channels_sharded,
                      render_polar_sharded, render_beam_gains_sharded,
                      render_beam_gains_polar_sharded,
                      training_step, training_step_planes)
from .multihost import load_paths_sharded, host_user_range

__all__ = ["make_mesh", "default_mesh_shape", "shard_paths",
           "render_channels_sharded", "render_polar_sharded",
           "render_beam_gains_sharded", "render_beam_gains_polar_sharded",
           "training_step", "training_step_planes", "load_paths_sharded",
           "host_user_range"]
