"""Downstream integrations: Sionna link-level sims, MATLAB toolchain."""

from .sionna_adapter import DeepMIMOSionnaAdapter
from .matlab_export import export_matlab
from .nr_cdl import CDLConfig, export_cdl, save_cdl_mat, synthesize_cdl_cir

__all__ = ["DeepMIMOSionnaAdapter", "export_matlab",
           "CDLConfig", "export_cdl", "save_cdl_mat", "synthesize_cdl_cir"]
