"""Generator layer: scenario loading, lazy datasets, channel computation."""

from .params import ChannelGenParameters
from .dataset import Dataset, MacroDataset
from .core import load, generate
from .sampling import (
    dbw2watt,
    get_uniform_idxs,
    get_idxs_with_limits,
    LinearPath,
)

__all__ = [
    "ChannelGenParameters", "Dataset", "MacroDataset", "load", "generate",
    "dbw2watt", "get_uniform_idxs", "get_idxs_with_limits", "LinearPath",
]
