"""Downstream integrations: Sionna link-level sims, MATLAB toolchain."""

from .sionna_adapter import DeepMIMOSionnaAdapter
from .matlab_export import export_matlab

__all__ = ["DeepMIMOSionnaAdapter", "export_matlab"]
